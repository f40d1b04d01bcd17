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

    ONE job, one pass over the events table (round-10 rewrite; the
    previous funnel-by-join chain ran ``reached.count()`` per step on
    an unpersisted lineage, re-executing joins 1..k−1 — O(K²) event
    scans at 100 TB): events are filtered to the funnel's step types
    (pushed to the scan), one user-keyed aggregation collects each
    step's sorted timestamp array per user, and the sequential funnel
    times derive in one projection — ``t_k = array_min(filter(arr_k,
    ts > t_{k-1}))``, NULL propagating naturally when a step is never
    reached (filter against a NULL bound keeps nothing; array_min of
    an empty array is NULL).  All K step counts come from ONE global
    aggregate, and the report rows (K rows — funnel length, not data)
    explode from it with no driver-side action at all.

    Scale shape: the only data shuffle ships (user, K timestamp
    arrays) holding just that user's funnel-step events — the same
    rows the join chain shuffled, now once instead of O(K²) times.
    Per-user state is bounded by the user's own funnel-type event
    count (the same per-group posture as sessionize/pack_sequences).
    Values are identical to the join form: both compute the same
    greedy-earliest step times.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    step_names = [str(s) for s in steps]
    acts = (
        df.where(F.col(ts_col).isNotNull())
        .where(F.col(type_col).isin(step_names))
        .select(
            F.col(user_col).alias("_u"),
            F.col(type_col).alias("_e"),
            F.col(ts_col).alias("_ts"),
        )
    )
    per_user = acts.groupBy("_u").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("_e") == s, F.col("_ts")))
            ).alias(f"_a{i}")
            for i, s in enumerate(step_names)
        ]
    )
    # sequential funnel times, all in one projection; the `within`
    # bound re-checks each step against t0 + window AFTER taking the
    # min, exactly like the join form did (t0 satisfies it trivially)
    within_iv = F.expr(f"INTERVAL {within}") if within is not None else None
    per_user = per_user.withColumn("_t0", F.array_min(F.col("_a0")))
    for k in range(1, len(step_names)):
        prev = F.col(f"_t{k - 1}")
        t_k = F.array_min(F.filter(F.col(f"_a{k}"), lambda x: x > prev))
        if within_iv is not None:
            t_k = F.when(t_k <= F.col("_t0") + within_iv, t_k)
        per_user = per_user.withColumn(f"_t{k}", t_k)
    one = per_user.agg(
        *[F.count(F.col(f"_t{k}")).alias(f"_c{k}") for k in range(len(step_names))]
    )
    report = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"_c{k}").cast("long").alias("n_users"),
            )
            for k, s in enumerate(step_names)
        ]
    )
    return (
        one.select(F.col("_c0").alias("_base"), F.explode(report).alias("_r"))
        .select(
            F.col("_r.step_idx").alias("step_idx"),
            F.col("_r.step").alias("step"),
            F.col("_r.n_users").alias("n_users"),
            F.when(
                F.col("_base") > 0,
                F.col("_r.n_users").cast("double") / F.col("_base"),
            ).alias("conversion"),
        )
    )
