"""Multi-granularity time rollups in one scan (hypertable-style).

The continuous-aggregate pattern: an events table rolled up to
hour/day/week/month buckets per dimension.  Instead of one query per
granularity (N corpus scans), GROUPING SETS compiles every grain into
ONE scan through Catalyst's ``Expand`` — each input row fans out to
one tuple per grain *inside* the stage, and the single map-side-
combined aggregation produces every bucket of every grain at once.
At 100 TB the scan is the dominant cost, so N grains for the price
of one pass is the whole design.

No counterpart in the reference engine (a pandas SQL interpreter);
the mergeable-sketch variant of this pattern is ``x03``'s HLL rollup
(`__spark_entry__.py`), which handles the non-additive (distinct)
aggregate the same one-pass way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: grains accepted by ``time_rollup`` — names shared by Spark's and
#: DuckDB's ``date_trunc`` (both ISO-Monday for "week")
SUPPORTED_GRAINS = ("hour", "day", "week", "month", "quarter", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    grains: "tuple[str, ...]" = ("hour", "day"),
    group_cols: "tuple[str, ...]" = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Additive rollup of ``value_col`` to every requested time grain
    (× ``group_cols``) in one scan: ``(grain, bucket_ts, *group_cols,
    n_events, total_value, avg_value)``.

    The grain of each output row is identified with ``grouping()``
    (not NULL-ness of the trunc column — a NULL input timestamp
    legitimately yields a NULL bucket and must not be mislabeled).
    Results are bit-comparable to running one GROUP BY per grain;
    the plan is one scan + one Expand + one aggregation exchange.
    """
    bad = [g for g in grains if g not in SUPPORTED_GRAINS]
    if bad or not grains:
        raise ValueError(f"unsupported grains {bad or grains}; pick from {SUPPORTED_GRAINS}")
    tcols = [f"_t_{g}" for g in grains]
    base = df.select(
        *[F.date_trunc(g, F.col(ts_col)).alias(t) for g, t in zip(grains, tcols)],
        *group_cols,
        F.col(value_col).alias("_v"),
    )
    sets = [[t, *group_cols] for t in tcols]
    grain_label = F.lit(None).cast("string")
    for g, t in zip(grains, tcols):
        grain_label = F.when(F.grouping(t) == 0, F.lit(g)).otherwise(grain_label)
    # grouping() is only legal inside the grouping-sets aggregation
    # itself, so the grain label rides the agg list
    return (
        base.groupingSets(sets, *[F.col(c) for c in (*tcols, *group_cols)])
        .agg(
            grain_label.alias("grain"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").alias("total_value"),
            F.avg("_v").alias("avg_value"),
        )
        .select(
            "grain",
            F.coalesce(*[F.col(t) for t in tcols]).alias("bucket_ts"),
            *group_cols,
            "n_events",
            "total_value",
            "avg_value",
        )
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    bucket (the cohort), counted distinctly in each subsequent period
    — ``(cohort, period, n_users)`` with ``period`` 0 at the cohort
    bucket itself.  The standard activity-retention report over an
    events table.

    ``grain`` is ``day``/``week``/``month``; period arithmetic runs
    on the truncated buckets, so day/week use exact day differences
    (week buckets are Mondays, 7 apart) and month uses exact calendar
    month differences.  NULL-timestamp events carry no activity date
    and are dropped.

    Scale shape: the first-seen table is one map-side-combined
    aggregate (|users| rows); the join back is user-keyed — both
    sides arrive hash-partitioned on the user from their own
    aggregates — then one (cohort, period) count-distinct.  Nothing
    wider than (user, two truncated dates) ever shuffles.
    """
    if grain not in ("day", "week", "month"):
        raise ValueError(f"grain must be day/week/month, got {grain!r}")
    bucket = F.date_trunc(grain, F.col(ts_col))
    acts = df.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("_u"), bucket.alias("_b")
    )
    first = acts.groupBy("_u").agg(F.min("_b").alias("_cohort"))
    joined = acts.join(first, "_u")
    if grain == "month":
        period = F.months_between(F.col("_b"), F.col("_cohort")).cast("int")
    else:
        step = 7 if grain == "week" else 1
        period = (F.datediff(F.col("_b"), F.col("_cohort")) / step).cast("int")
    return (
        joined.groupBy(F.col("_cohort").alias("cohort"), period.alias("period"))
        .agg(F.count_distinct("_u").alias("n_users"))
    )


def event_funnel(
    df: DataFrame,
    steps: "list",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    within: "str | None" = None,
) -> DataFrame:
    """Ordered conversion funnel: how many users performed each step
    AFTER their earliest completion of the previous step — optionally
    all within ``within`` (an INTERVAL string like ``'7 days'``) of
    step 1.  Returns ``(step_idx, step, n_users, conversion)`` with
    ``conversion`` relative to step 1.

    Built as a chain of per-step min-timestamp aggregates joined on
    the user key (the classic funnel-by-join): step k's input is the
    step-k events of users who completed step k-1, filtered to
    ``ts > t_{k-1}``, so each stage shuffles only (user, ts) pairs
    and the user-keyed aggregates arrive pre-partitioned from one
    another.  K steps = K small keyed joins — never a per-user event
    collect.  The row-count report itself is a driver-side union of K
    one-row counts (K is funnel length, not data).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    acts = df.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        F.col(ts_col).alias("_ts"),
    )
    reached = None  # DataFrame(_u, _t) of users at the current step
    counts = []
    for i, step in enumerate(steps):
        mine = acts.where(F.col("_e") == step)
        if reached is None:
            cur = mine.groupBy("_u").agg(F.min("_ts").alias("_t"))
            cur = cur.withColumn("_t0", F.col("_t"))
        else:
            cur = (
                mine.join(reached, "_u")
                .where(F.col("_ts") > F.col("_t"))
                .groupBy("_u", "_t0")
                .agg(F.min("_ts").alias("_t"))
            )
        if within is not None:
            cur = cur.where(
                F.col("_t") <= F.col("_t0") + F.expr(f"INTERVAL {within}")
            )
        reached = cur.select("_u", "_t", "_t0")
        counts.append(reached.count())
    spark = df.sparkSession
    base = counts[0] or 0
    rows = [
        (i, str(s), int(c), (float(c) / base) if base else None)
        for i, (s, c) in enumerate(zip(steps, counts))
    ]
    return spark.createDataFrame(
        rows, "step_idx int, step string, n_users long, conversion double"
    )
