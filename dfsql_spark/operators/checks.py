"""Declarative data-quality checks, computed in ONE aggregation pass.

The validation stage of a production pipeline (deequ/dbt-test style):
every check compiles to aggregate expressions over the same scan, so a
suite of N checks costs one job — a single map-side-combined
aggregation at any scale — not N queries.  ``unique`` checks add exact
``count(DISTINCT)`` state; everything else is fixed-size.

Usage::

    from dfsql_spark.operators.checks import (
        in_range, matches_regex, not_null, row_count_at_least,
        run_checks, unique, values_in,
    )
    report = run_checks(df, [
        row_count_at_least(1_000),
        not_null("l_orderkey"),
        unique("l_comment"),
        in_range("l_discount", 0.0, 0.1),
        values_in("l_returnflag", ["A", "N", "R"]),
        matches_regex("l_shipinstruct", r"^[A-Z ]+$", min_frac=0.99),
    ])
    report.show()   # (check, passed, observed) — one row per check

Every ``observed`` is a double (count or fraction) so the report has a
stable schema; ``passed`` is NULL-safe (an empty table fails
``not_null``'s fraction check only if ``max_null_frac < 1``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One named check: ``passed`` and ``observed`` are AGGREGATE
    expressions (evaluated in the suite's single groupless agg)."""

    name: str
    passed: Column
    observed: Column


def _frac(cond: Column) -> Column:
    """Fraction of rows satisfying ``cond`` (0.0 on an empty table)."""
    n = F.count(F.lit(1))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.sum(cond.cast("int")) / n
    )


def row_count_at_least(n: int) -> Check:
    c = F.count(F.lit(1))
    return Check(f"row_count_at_least({n})", c >= n, c.cast("double"))


def row_count_between(lo: int, hi: int) -> Check:
    c = F.count(F.lit(1))
    return Check(
        f"row_count_between({lo},{hi})", (c >= lo) & (c <= hi), c.cast("double")
    )


def not_null(col: str, max_null_frac: float = 0.0) -> Check:
    frac = _frac(F.col(col).isNull())
    return Check(
        f"not_null({col})", frac <= max_null_frac, frac.cast("double")
    )


def unique(col: str) -> Check:
    """Exact uniqueness: adds count(DISTINCT) state (a shuffle of the
    column's distinct values) — the one check that isn't fixed-size;
    use it on key columns, not free text."""
    dupes_free = F.count_distinct(F.col(col)) == F.count(F.col(col))
    return Check(
        f"unique({col})",
        dupes_free,
        F.count_distinct(F.col(col)).cast("double"),
    )


def in_range(col: str, lo, hi) -> Check:
    bad = _frac(~F.col(col).between(lo, hi) | F.col(col).isNull())
    return Check(f"in_range({col},{lo},{hi})", bad == 0.0, bad.cast("double"))


def values_in(col: str, allowed: "list") -> Check:
    bad = _frac(~F.col(col).isin(list(allowed)) | F.col(col).isNull())
    return Check(f"values_in({col})", bad == 0.0, bad.cast("double"))


def matches_regex(col: str, pattern: str, min_frac: float = 1.0) -> Check:
    frac = _frac(F.col(col).rlike(pattern))
    return Check(
        f"matches_regex({col})", frac >= min_frac, frac.cast("double")
    )


def run_checks(df: DataFrame, checks: "list[Check]") -> DataFrame:
    """Evaluate all checks in one groupless aggregation over ``df``.

    Returns (check string, passed boolean, observed double), one row
    per check, computed by a single job: the agg produces one wide row
    (2 columns per check), then a codegen'd ``stack`` unpivots it —
    no second scan, no driver-side loop over checks.
    """
    if not checks:
        raise ValueError("checks must contain at least one Check")
    aggs = []
    for i, c in enumerate(checks):
        aggs.append(c.passed.alias(f"p{i}"))
        aggs.append(c.observed.alias(f"o{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c.name.replace(chr(39), '')}', p{i}, o{i}"
        for i, c in enumerate(checks)
    )
    return wide.select(
        F.expr(
            f"stack({len(checks)}, {stack_args}) AS (check, passed, observed)"
        )
    )
