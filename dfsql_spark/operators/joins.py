"""Temporal join operators Spark lacks natively: as-of and range joins.

The reference engine supports only single-condition binary equi-joins
(SURVEY.md §2.3, base_data_source.py:463-507); these are capability
uplift for event/time-series workloads, built as compositions of
existing DataFrame ops so Catalyst/AQE plan them.

Scale posture
-------------
* ``asof_join`` is the union + last-non-null-window formulation: ONE
  shuffle on the join key, zero row blowup, no per-pair comparison —
  the classic distributed as-of shape (vs. a naive range join whose
  intermediate is |L|·|R| per key).  Skewed keys degrade to a window
  sort per key, which AQE cannot split — salt upstream if one key
  holds a large fraction of rows.
* ``range_join`` equi-joins on coarse time bins (interval bucketing)
  before the exact predicate: the only pairs materialized share a bin,
  so cost tracks genuine overlap density, not |L|·|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    allow_equal: bool = True,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ``right_ts`` ≤ ``left_ts`` (strictly < when
    ``allow_equal=False``) within the same ``on`` key.  Left outer
    semantics: unmatched left rows keep nulls.

    Plan: tag both sides, union, and run ONE window pass per key
    ordered by (ts, side): ``last(value, ignoreNulls)`` over the
    preceding frame carries the most recent right-side values forward
    onto each left row.  Matches DuckDB/kdb ``ASOF JOIN`` semantics
    (ties on ts resolved to the right row when ``allow_equal``).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    # side ordering makes right rows sort BEFORE left rows at equal ts
    # (allow_equal) or strictly after (not allow_equal)
    r_side, l_side = (0, 1) if allow_equal else (1, 0)

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(
            f"{right_ts}{suffix}"
        ),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"_m_{c}")
            for c in [right_ts, *right_cols]
        ],
    )
    out = carried.filter(F.col("_side") == l_side).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[
            F.col(f"_m_{c}").alias(f"{c}{suffix}")
            for c in [right_ts, *right_cols]
        ],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 86400,
    extra_cond=None,
) -> DataFrame:
    """Join left rows whose ``left_point`` timestamp falls in
    ``[right_start, right_end]``.

    A plain theta join makes Spark pick broadcast-nested-loop (O(|L|·|R|)).
    Here each right interval explodes to the coarse time bins it
    overlaps and each left point maps to its bin, so the work is an
    equi-join on bin plus an exact filter — intermediate size tracks
    interval/point density per bin.  Pick ``bin_seconds`` near the
    median interval length; longer intervals cost proportionally more
    bin rows (linear, bounded).
    """
    lp = F.col(left_point).cast("long")
    rs = F.col(right_start).cast("long")
    re_ = F.col(right_end).cast("long")
    l_binned = left.withColumn("_bin", F.floor(lp / bin_seconds))
    r_binned = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(F.floor(rs / bin_seconds), F.floor(re_ / bin_seconds))
        ),
    )
    cond = (
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) <= F.col(right_end))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return l_binned.join(r_binned, "_bin").filter(cond).drop("_bin")


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    how: str = "left_semi",
) -> DataFrame:
    """Semi/anti join of a huge fact table against a filtered key set,
    shaped so Spark's runtime bloom filter can prune the fact scan.

    The join itself is declarative — what this function encodes is the
    *regime analysis* for the 100 TB path:

    * **small key side** (fits ``autoBroadcastJoinThreshold``): Catalyst
      broadcasts and the semi join never shuffles the fact table.  No
      bloom filter is needed or injected — broadcast already prunes at
      the probe.
    * **big-big** (neither side broadcastable — the 100 TB regime):
      Catalyst plans a shuffle join, and the ``InjectRuntimeFilter``
      rule adds ``might_contain(bloom, xxhash64(fact_key))`` to the
      fact SCAN (visible in ``explain``), built from the filtered key
      side.  Fact rows that cannot match are dropped before the
      exchange — the shuffle carries only probable matches.  Injection
      is governed by ``spark.sql.optimizer.runtime.bloomFilter.enabled``
      (default true) and fires when the creation side is under
      ``...creationSideThreshold`` and the application-side scan is over
      ``...applicationSideScanSizeThreshold`` (10 GB default — i.e.
      exactly the at-scale case; local tests lower it to observe the
      plan, see tests/test_plan_audit.py).

    Either way the result is identical; the bloom filter is a physical
    optimization with false positives only (re-checked by the join).
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(f"how must be 'left_semi' or 'left_anti', got {how!r}")
    # Alias the key column so the join condition is unambiguous even when
    # fact_key == keys_key (the common case: semi-joining on a shared name).
    k = keys.select(F.col(keys_key).alias("__bsj_key"))
    return fact.join(k, fact[fact_key] == k["__bsj_key"], how)
