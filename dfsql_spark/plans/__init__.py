"""Plan inspection and auditing utilities."""

from .audit import (  # noqa: F401
    PlanSummary,
    assert_broadcast_join,
    assert_filter_pushed,
    assert_max_read_columns,
    assert_no_exchange,
    plan_summary,
)
