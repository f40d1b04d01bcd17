"""Training-data pipeline operators: dedup, similarity search, text
analysis, temporal joins, skew mitigation, multimodal plumbing
(north-star capabilities beyond the reference's SQL surface)."""

from . import (  # noqa: F401
    checks,
    classify,
    dedup,
    joins,
    multimodal,
    rollup,
    similarity,
    skew,
    text,
    versioning,
    web,
)
