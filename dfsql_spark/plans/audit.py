"""Physical-plan auditing: assert the plan you wanted is the plan you got.

The difference between "works on 60k rows" and "works on 100 TB" is
usually visible in the executed plan: a filter that didn't reach the
scan, a projection that reads every column, a join that shuffles a
side that should have broadcast, an Exchange a bucketed table should
have elided.  These helpers turn those checks into assertions so tests
pin plan *shape*, not just results.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    wholestage_codegen: bool = False
    text: str = ""


def plan_summary(df: DataFrame, execute: bool = False) -> PlanSummary:
    """Parse the physical plan into the handful of facts scale work
    cares about.

    Uses ``explain("formatted")`` text: the raw ``executedPlan``
    toString truncates long attribute lists mid-bracket (silently
    hiding pushed filters) and under AQE lacks codegen annotations.
    ``execute=True`` first runs ``df.collect()`` — an action on the
    SAME QueryExecution (a ``df.write`` would plan a fresh one) — so
    AQE's *final* plan (runtime broadcast decisions, coalesced
    partitions, codegen stages) is what gets audited.  Only use it on
    queries with small results, i.e. audit at test scale.
    """
    if execute:
        df.collect()
    sc = df.sparkSession.sparkContext
    text = sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    s = PlanSummary(text=text)
    # formatted mode prints each operator once in the tree and once as
    # a numbered detail header "(n) Name" — count from the headers
    nodes = re.findall(r"^\(\d+\) ([A-Za-z]+)", text, re.M)
    s.n_exchanges = sum(1 for n in nodes if n == "Exchange")
    s.n_broadcast_joins = sum(1 for n in nodes if n == "BroadcastHashJoin")
    s.n_sortmerge_joins = sum(1 for n in nodes if n == "SortMergeJoin")
    s.n_scans = sum(1 for n in nodes if n in ("Scan", "FileScan", "BatchScan"))
    s.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    s.read_schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", text)
    # codegen'd operators carry a "* " marker in the formatted tree
    s.wholestage_codegen = re.search(r"\* [A-Za-z]+ \(\d+\)", text) is not None
    return s


def assert_no_exchange(df: DataFrame, msg: str = "") -> None:
    """The plan must be shuffle-free (narrow ops / bucketed joins)."""
    s = plan_summary(df)
    assert s.n_exchanges == 0, (
        f"expected shuffle-free plan{': ' + msg if msg else ''}, found "
        f"{s.n_exchanges} Exchange(s)\n{s.text}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    s = plan_summary(df)
    assert s.n_broadcast_joins > 0, f"no BroadcastHashJoin in plan\n{s.text}"


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    """A predicate on ``column`` must reach the data source scan."""
    s = plan_summary(df)
    pushed = ";".join(s.pushed_filters)
    assert column in pushed, (
        f"no pushed filter mentions {column!r}; pushed: {pushed!r}"
    )


def assert_max_read_columns(df: DataFrame, n: int) -> None:
    """Column pruning: no scan may read more than ``n`` columns."""
    s = plan_summary(df)
    for schema in s.read_schemas:
        cols = [c for c in schema[len("struct<"):-1].split(",") if c]
        assert len(cols) <= n, (
            f"scan reads {len(cols)} columns (> {n}): {schema}"
        )
