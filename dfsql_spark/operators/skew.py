"""Skew-mitigation helpers: salted two-phase aggregation.

AQE splits skewed *join* partitions automatically, but a skewed
``groupBy`` still funnels every row of a hot key through one reduce
task.  The standard fix is salting: aggregate on (key, salt) first —
spreading a hot key over ``num_salts`` tasks — then re-aggregate the
partials on the key alone.  The second shuffle moves only
``keys × num_salts`` partial rows, so the hot key's row volume never
lands on a single task.

Decomposable aggregates only: sum/count/min/max re-aggregate as
themselves; avg is carried as (sum, count) and finalized at the end.
(Non-decomposable aggregates — exact median, collect_list — need
different machinery and are out of scope.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
    "min": F.min,
    "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_groupby_agg(
    df: DataFrame,
    keys: "list[str] | str",
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """``df.groupBy(keys).agg(...)`` with salting for skewed keys.

    ``aggs`` maps output column name → (source column, fn) where fn is
    one of sum/count/min/max/avg (count of "*" counts rows).  Result
    is identical to the plain groupBy — only the physical shuffle
    shape differs.
    """
    if isinstance(keys, str):
        keys = [keys]
    # pmod keeps salts in [0, num_salts): plain % follows the dividend's
    # sign in Spark, which would silently spread hot keys over up to
    # 2*num_salts-1 buckets and diverge from the documented fan-out.
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(num_salts),
    ).alias("_salt")

    partial_exprs = []
    merge_exprs = []
    final_cols = []
    for out, (col, fn) in aggs.items():
        if fn == "avg":
            partial_exprs += [
                F.sum(col).alias(f"_{out}_s"),
                F.count(col).alias(f"_{out}_c"),
            ]
            merge_exprs += [
                F.sum(f"_{out}_s").alias(f"_{out}_s"),
                F.sum(f"_{out}_c").alias(f"_{out}_c"),
            ]
            final_cols.append(
                (F.col(f"_{out}_s") / F.col(f"_{out}_c")).alias(out)
            )
        elif fn in _PARTIAL:
            partial_exprs.append(_PARTIAL[fn](col).alias(f"_{out}_p"))
            merge_exprs.append(_MERGE[fn](f"_{out}_p").alias(f"_{out}_p"))
            final_cols.append(F.col(f"_{out}_p").alias(out))
        else:
            raise ValueError(
                f"{fn!r} is not a decomposable aggregate "
                f"(supported: sum, count, min, max, avg)"
            )

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    merged = partial.groupBy(*keys).agg(*merge_exprs)
    return merged.select(*keys, *final_cols)


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: "list[str] | str",
    how: str = "inner",
    num_salts: int = 16,
    pin_sort_merge: bool = False,
) -> DataFrame:
    """Skew-safe equi-join: ``big ⋈ small`` on ``on`` with key salting.

    Each big-side row gets a salt in ``[0, num_salts)``; the small side
    is replicated once per salt value; the join runs on
    ``(key, _salt)``.  A hot key's rows land on ``num_salts`` shuffle
    partitions instead of one, at the cost of shipping ``num_salts``
    copies of the small side — the classic manual skew-join, correct
    for ``inner`` and ``left`` (every big row sees exactly the one
    small-side replica carrying its own salt, so no duplicates and no
    lost left rows).

    When to use over AQE: AQE's skew-join split handles sort-merge
    skew at runtime, but only per shuffle-partition granularity and
    only for the join itself — salting is the deterministic,
    plan-stable form (and composes with downstream operators that pin
    the partitioning).  ``pin_sort_merge=True`` hints both sides
    ``merge``, the 100 TB shape where the "small" side is itself too
    big to broadcast (a broadcast join has no shuffle to skew, making
    salting pointless overhead — leave the pin off and the planner
    will broadcast when it fits).

    Result multiset is identical to ``big.join(small, on, how)``; only
    the physical shuffle shape differs.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_skew_join supports how='inner'|'left', got {how!r} "
            "(right/full would need the salt on the other side)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    salted_big = big.withColumn("_salt", salt)
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    if pin_sort_merge:
        salted_big = salted_big.hint("merge")
        salted_small = salted_small.hint("merge")
    return salted_big.join(salted_small, keys + ["_salt"], how).drop("_salt")


def key_skew_report(
    df: DataFrame,
    keys: "list[str] | str",
    top_n: int = 20,
) -> DataFrame:
    """Hot-key diagnostic for join/aggregation planning: the ``top_n``
    heaviest key values with their row counts, corpus fraction, skew
    ratio (count ÷ mean rows-per-key), and a suggested salt factor —
    the number the :func:`salted_groupby_agg` / :func:`salted_skew_join`
    ``num_salts`` argument wants (``ceil(skew_ratio)`` spreads the hot
    key over as many reduce tasks as it exceeds the average by).

    At 100 TB this is the pre-flight check before any keyed shuffle: a
    key holding 5% of a 100 TB fact table is a 5 TB reduce task that
    no executor survives; this report is ONE map-side-combined count
    aggregate (shuffle carries key + 8-byte count), one #keys-row
    stats reduction broadcast back, and a TakeOrdered top-n — never a
    global sort, never a second corpus scan.

    Ties break by key value ascending so the report is deterministic
    across runs and engines.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if not key_list:
        raise ValueError("keys must name at least one column")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    counts = df.groupBy(*key_list).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    ratio = F.col("n_rows") * F.col("_n_keys") / F.col("_total")
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *key_list,
            "n_rows",
            (F.col("n_rows") / F.col("_total")).alias("row_frac"),
            ratio.alias("skew_ratio"),
            F.ceil(ratio).cast("int").alias("suggested_salts"),
        )
        .orderBy(
            F.col("n_rows").desc(), *[F.col(k).asc() for k in key_list]
        )
        .limit(top_n)
    )


def join_cardinality_report(
    left: DataFrame,
    right: DataFrame,
    on: "list[str] | str",
    top_n: int = 20,
) -> DataFrame:
    """EXACT equi-join output size, computed without running the join:
    per-key counts on each side (two map-side-combined aggregates
    whose shuffles carry key + 8-byte count), inner-joined on the key
    — a #distinct-keys-sized join, not a row-level one — yield
    ``n_left × n_right`` output rows per key.  Returns the ``top_n``
    keys by contribution plus one ``__total__`` row (key columns
    NULL) with the full join's output row count.

    The 100 TB pre-flight this answers: a many-to-many key that looks
    innocent on either side (10⁴ × 10⁴) contributes 10⁸ joined rows by
    itself.  Running this report first costs two count aggregates;
    running the join to find out costs the explosion.  Keys present on
    one side only contribute nothing and are excluded (inner-join
    semantics); ties break by key ascending, deterministic across
    engines.

    Composes with :func:`key_skew_report` (per-side row skew) and
    :func:`salted_skew_join` (the fix when the report shows a hot
    key): report -> decide broadcast / salt / pre-aggregate -> join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("on must name at least one join column")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_right"))
    per_key = lc.join(rc, keys).select(
        *keys,
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).alias("n_out"),
    )
    top = per_key.orderBy(
        F.col("n_out").desc(), *[F.col(k).asc() for k in keys]
    ).limit(top_n)
    total = per_key.agg(
        *[F.lit(None).cast(per_key.schema[k].dataType).alias(k) for k in keys],
        F.sum("n_left").alias("n_left"),
        F.sum("n_right").alias("n_right"),
        F.sum("n_out").alias("n_out"),
    )
    return top.unionByName(total)
