"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing (north-star capabilities beyond the
reference's SQL surface)."""

from . import dedup, multimodal, similarity, text  # noqa: F401
