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

    Scale caveat: ``unique()`` compiles to an exact ``count(DISTINCT
    col)``.  One such check folds into the single aggregate cleanly,
    but TWO OR MORE unique() checks on DIFFERENT columns make Spark
    Expand-replicate every input row once per distinct column before
    the shuffle (the multi-distinct plan :func:`column_profile`'s
    exact mode deliberately avoids).  For wide uniqueness audits run
    one ``run_checks`` per unique() column, or use
    :func:`column_profile` (``n_distinct`` vs ``n_rows``), and keep
    the combined suite for the fixed-size-state checks.
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


# ---------------------------------------------------------------------------
# Single-scan pipeline observability: threshold calibration + filter funnel
# ---------------------------------------------------------------------------


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: "list[float]",
    keep_higher: bool = True,
) -> DataFrame:
    """Precision/recall/F1 of ``score >= t`` (or ``<= t`` when
    ``keep_higher=False``) against a boolean label, for every ``t``,
    in ONE aggregation pass.

    The calibration step for a model-based quality filter
    (``classify.py:classifier_score`` scores, human labels): N
    thresholds cost one job with 2N+1 fixed-size aggregate states —
    map-side combined, never a per-threshold scan.  Rows with a NULL
    score or label are excluded (they have no verdict either way).

    Returns ``(threshold, n_kept, precision, recall, f1)`` — one row
    per threshold, in input order.  ``precision`` is NULL when nothing
    is kept; ``recall`` is NULL when there are no positives; ``f1`` is
    NULL when either is.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    score = F.col(score_col)
    label = F.col(label_col).cast("boolean")
    valid = score.isNotNull() & label.isNotNull()
    aggs = [F.sum((valid & label).cast("long")).alias("n_pos")]
    for i, t in enumerate(thresholds):
        kept = valid & (score >= t if keep_higher else score <= t)
        aggs.append(F.sum(kept.cast("long")).alias(f"k{i}"))
        aggs.append(F.sum((kept & label).cast("long")).alias(f"tp{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({float(t)} AS DOUBLE), k{i}, tp{i}"
        for i, t in enumerate(thresholds)
    )
    long = wide.select(
        "n_pos",
        F.expr(
            f"stack({len(thresholds)}, {stack_args}) AS (threshold, n_kept, tp)"
        ),
    )
    precision = F.when(F.col("n_kept") > 0, F.col("tp") / F.col("n_kept"))
    recall = F.when(F.col("n_pos") > 0, F.col("tp") / F.col("n_pos"))
    return long.select(
        "threshold",
        "n_kept",
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            precision.isNotNull() & recall.isNotNull() & (precision + recall > 0),
            2 * precision * recall / (precision + recall),
        ).alias("f1"),
    )


def filter_funnel(
    df: DataFrame, stages: "list[tuple[str, Column]]"
) -> DataFrame:
    """Survival counts through an ORDERED filter pipeline, in ONE
    aggregation pass.

    The yield report a curation run starts with: how many documents
    survive each successive filter (C4 keep, repetition cap, quality
    floor, ...), where stage ``i`` counts rows passing ALL conditions
    up to and including ``i``.  One job, one fixed-size aggregate per
    stage — not one count() action per filter.  A NULL condition
    counts as failing that stage.

    Returns ``(stage_idx, stage, n_in, n_out, frac_of_input,
    frac_of_prev)``; ``frac_*`` are NULL when the denominator is 0.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_total")]
    cum = F.lit(True)
    for i, (_, cond) in enumerate(stages):
        cum = cum & F.coalesce(cond.cast("boolean"), F.lit(False))
        aggs.append(F.sum(cum.cast("long")).alias(f"s{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"{i}, '{name.replace(chr(39), '')}', "
        f"{'n_total' if i == 0 else f's{i - 1}'}, s{i}"
        for i, (name, _) in enumerate(stages)
    )
    long = wide.select(
        "n_total",
        F.expr(
            f"stack({len(stages)}, {stack_args})"
            " AS (stage_idx, stage, n_in, n_out)"
        ),
    )
    return long.select(
        "stage_idx",
        "stage",
        "n_in",
        "n_out",
        F.when(F.col("n_total") > 0, F.col("n_out") / F.col("n_total")).alias(
            "frac_of_input"
        ),
        F.when(F.col("n_in") > 0, F.col("n_out") / F.col("n_in")).alias(
            "frac_of_prev"
        ),
    )


def vector_norms_in(
    col: str,
    lo: float = 1e-6,
    hi: float = 1e6,
    max_bad_frac: float = 0.0,
    dim: "int | None" = None,
) -> Check:
    """Embedding-column sanity: the fraction of vectors that are NULL,
    wrong-dimensioned (when ``dim`` is given), contain a non-finite
    component, or whose L2 norm falls outside ``[lo, hi]`` must be at
    most ``max_bad_frac``.  Zero vectors and NaN components are the
    classic silent embedding-pipeline failures; both land here.

    Pure aggregate expression over codegen'd array folds — composes
    into ``run_checks``'s single pass like every other check.
    """
    v = F.col(col)
    sq = F.aggregate(
        v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    norm = F.sqrt(sq)
    bad_shape = v.isNull() if dim is None else (v.isNull() | (F.size(v) != dim))
    bad = bad_shape | F.isnan(sq) | sq.isNull() | ~norm.between(lo, hi)
    frac = _frac(bad)
    return Check(
        f"vector_norms_in({col},{lo},{hi})",
        frac <= max_bad_frac,
        frac.cast("double"),
    )


def split_leakage_report(
    df: DataFrame,
    pairs: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Train/eval leakage audit: count near-duplicate pairs by the
    splits their two sides landed in — ``(split_lo, split_hi,
    cross_split, n_pairs)``.

    ``pairs`` is the output shape of any pair-producing dedup operator
    (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
    ``embedding_neardup_pairs``, ``semantic_dedup_pairs``): rows whose
    ``cross_split`` is true are eval contamination — a validation doc
    whose near-twin sits in train makes the benchmark lie.  Exact
    duplicates never cross a content-addressed split
    (``deterministic_split`` hashes the text), but NEAR-duplicates
    hash independently, which is precisely what this reports.

    The split pair is emitted order-normalized (lo/hi) so (train,val)
    and (val,train) aggregate into one row.  Scale shape: two keyed
    joins of the (already-reduced) pair set against the slim
    (id, split) projection — the corpus text never moves — then one
    tiny grouped count (≤ |splits|² rows).  Pairs whose ids are
    missing from ``df`` are dropped (inner joins): no split, no
    verdict.
    """
    s = df.select(F.col(id_col), F.col(split_col))
    a = s.withColumnRenamed(id_col, id_a).withColumnRenamed(split_col, "_sa")
    b = s.withColumnRenamed(id_col, id_b).withColumnRenamed(split_col, "_sb")
    tagged = pairs.select(id_a, id_b).join(a, id_a).join(b, id_b)
    return (
        tagged.groupBy(
            F.least(F.col("_sa"), F.col("_sb")).alias("split_lo"),
            F.greatest(F.col("_sa"), F.col("_sb")).alias("split_hi"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("cross_split", F.col("split_lo") != F.col("split_hi"))
        .select("split_lo", "split_hi", "cross_split", "n_pairs")
    )


def corpus_report(
    df: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum corpus data card in ONE grouped aggregation pass:
    ``(stratum, n_docs, n_empty, n_chars_total, n_tokens_total,
    n_tokens_min, n_tokens_max, n_tokens_avg)`` — the summary table a
    dataset release documents per source/domain/language.

    Every column is integer-derived except the average (one double
    division of two exact integers), so the report is bit-identical
    across engines; token counts use the shared whitespace tokenizer.
    ``n_empty`` counts NULL or whitespace-only documents (zero
    tokens).  Deliberately NO quantile column: exact per-group
    percentiles hold group values in memory (unbounded at 100 TB) and
    approximate sketches are not cross-engine mirrorable — min/max
    bound the distribution exactly for free.

    Scale shape: one map-side-combined aggregate keyed on the
    stratum; the shuffle carries #strata fixed-size states.
    """
    from .text import token_count

    tok = token_count(text_col)
    n_chars = F.length(F.coalesce(F.col(text_col), F.lit("")))
    return (
        df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(tok == 0, 1).otherwise(0)).alias("n_empty"),
            F.sum(n_chars.cast("long")).alias("n_chars_total"),
            F.sum(tok.cast("long")).alias("n_tokens_total"),
            F.min(tok).alias("n_tokens_min"),
            F.max(tok).alias("n_tokens_max"),
        )
        .withColumn(
            "n_tokens_avg",
            F.col("n_tokens_total").cast("double") / F.col("n_docs"),
        )
    )


# exact names + parameterized prefixes, NOT bare startswith: the
# 'int' prefix would otherwise swallow 'interval day' (reproduced:
# interval columns crashed the whole profile on cast-to-double)
_NUMERIC_EXACT = {
    "tinyint", "smallint", "int", "bigint", "float", "double"
}
_ATOMIC_EXACT = _NUMERIC_EXACT | {"string", "boolean", "date"}
_ATOMIC_PREFIX = ("decimal", "timestamp", "char", "varchar")


def group_keep_report(
    df: DataFrame,
    flag_col: str,
    group_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Per-group keep-rate table with Wilson score intervals — the
    domain-level filtering decision: a curation run scores documents
    (C4/Gopher/classifier ``keep`` booleans), then cuts WHOLE domains
    whose keep-rate upper bound is still below threshold, instead of
    paying per-document filtering on a source that is overwhelmingly
    junk (and, symmetrically, trusts domains whose LOWER bound is
    high).  The Wilson interval (Wilson 1927, the standard binomial
    proportion interval) keeps small-n groups honest: 2 kept of 2
    docs is not a 100%-quality domain.

    NULL flags are counted (``n_flag_null``) and EXCLUDED from the
    rate — treating unknown as False would silently condemn a domain
    whose scorer erred; a NULL group is its own row (the missing-
    metadata bucket is exactly what you want surfaced).  Groups with
    no evaluable flags get NULL rate/bounds.

    Output: ``(group_col, n_docs, n_kept, n_flag_null, keep_rate,
    ci_low, ci_high)`` — rates are plain double arithmetic on exact
    counts (closed form, no sampling).

    Scale shape: ONE map-side-combined groupBy carrying three counts;
    the Wilson algebra runs on the already-#groups-sized table.
    """
    flag = F.col(flag_col)
    agg = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(flag, F.lit(1))).alias("n_kept"),
        F.count(F.when(flag.isNull(), F.lit(1))).alias("n_flag_null"),
    )
    n = (F.col("n_docs") - F.col("n_flag_null")).cast("double")
    k = F.col("n_kept").cast("double")
    p = k / n
    z2 = F.lit(z * z)
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = (
        F.lit(z)
        * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        / denom
    )
    has_eval = n > 0
    return agg.select(
        group_col,
        "n_docs",
        "n_kept",
        "n_flag_null",
        F.when(has_eval, p).alias("keep_rate"),
        F.when(has_eval, F.greatest(center - half, F.lit(0.0))).alias(
            "ci_low"
        ),
        F.when(has_eval, F.least(center + half, F.lit(1.0))).alias(
            "ci_high"
        ),
    )


def _is_numeric_dtype(dt: str) -> bool:
    return dt in _NUMERIC_EXACT or dt.startswith("decimal") or dt == "boolean"


def _is_atomic_dtype(dt: str) -> bool:
    return dt in _ATOMIC_EXACT or dt.startswith(_ATOMIC_PREFIX)


def column_profile(
    df: DataFrame,
    columns: "list[str] | None" = None,
    ndv: str = "approx",
    rsd: float = 0.05,
    sum_scale: "int | None" = None,
) -> DataFrame:
    """Schema-wide column profile in ONE aggregation pass — the
    ingestion-time data card (pandas ``describe`` / deequ
    ``ColumnProfiler`` analog) you run on every new 100 TB drop before
    any pipeline stage trusts it.

    One output row per profiled column, fixed schema::

        (column, dtype, n_rows, n_null, null_frac, n_distinct,
         min_num, max_num, mean, min_str, max_str)

    Numeric and boolean columns fill the ``_num`` stats (booleans as
    0/1); string/char/date/timestamp columns fill ``min_str``/
    ``max_str`` (dates and timestamps via their canonical string
    cast, so the report schema never depends on the input schema).
    Complex types (array/map/struct/binary) get counts only — their
    NDV and ordering stats are NULL rather than a guess.

    ``ndv="approx"`` (default) uses HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``): fixed-size
    state per column, so the WHOLE profile is one map-side-combined
    groupless aggregate — a single scan with a few KB of state per
    column, no shuffle wider than one combine, at any corpus size.
    ``ndv="exact"`` swaps in ``count(DISTINCT col)``: bit-exact (and
    what the DuckDB mirror grades).  The exact plan is a UNION of
    per-column single-column aggregates in one job — each branch scans
    one pruned parquet column and runs its distinct without Spark's
    N-fold Expand replication of the full-width row (measured 7× over
    the multi-distinct single aggregate at sf0.1) — but the distinct
    state is still value-sized, so it remains the audit mode, not the
    100 TB default.

    NULL handling: ``n_distinct`` counts non-NULL values (both
    engines' COUNT(DISTINCT) contract); an all-NULL column profiles
    as ``n_distinct = 0`` with NULL min/max/mean.

    ``sum_scale`` (default off) appends a ``sum_num`` column: for
    numeric columns, ``sum(CAST(col AS DECIMAL(27, sum_scale)))``
    cast to double (NULL otherwise).  The decimal sum is EXACT and
    order-independent, so — unlike ``mean``, an order-dependent
    double accumulation whose 6-dp rounding can flip between runs or
    engines when the true mean lands on a half-way boundary (the
    round-14 l_discount/l_tax lesson) — ``sum_num`` is bit-for-bit
    reproducible on any engine; pair it with ``n_rows - n_null`` to
    derive the mean exactly downstream.  Use it for columns KNOWN to
    be fixed-point at ≤ ``sum_scale`` decimals (money, rates, ids);
    wider fractions round at the cast.
    """
    if ndv not in ("approx", "exact"):
        raise ValueError(f"ndv must be 'approx' or 'exact', got {ndv!r}")
    if sum_scale is not None and not 0 <= int(sum_scale) <= 18:
        raise ValueError(f"sum_scale must be in [0, 18], got {sum_scale!r}")
    sum_t = None if sum_scale is None else f"decimal(27,{int(sum_scale)})"
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if columns is None:
        cols = list(fields)
    else:
        missing = [c for c in columns if c not in fields]
        if missing:
            raise ValueError(f"columns not in DataFrame: {missing}")
        cols = list(columns)

    if ndv == "exact":
        # EXACT AUDIT MODE, union-of-branches plan (round 13): one
        # thin single-column aggregate per column, unioned into the
        # #columns-row report in ONE job.  A single multi-distinct
        # aggregate makes Spark Expand-replicate every full-width row
        # N-fold before the distinct shuffle; per-column branches each
        # scan ONE pruned parquet column instead (columnar format ⇒
        # same total bytes as one full-width scan) and run their
        # count(DISTINCT) without replication.  Measured at sf0.1
        # lineitem (11 columns): 24.7 s Expand → ~3.5 s branches;
        # values are identical either way (same count(DISTINCT)).
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        null_l = F.lit(None).cast("bigint")
        branches = []
        for c in cols:
            dt = fields[c]
            col = F.col(c)
            atomic = _is_atomic_dtype(dt)
            numeric = _is_numeric_dtype(dt)
            aggs_c = [
                F.count(F.lit(1)).alias("_n"),
                F.sum(col.isNull().cast("long")).alias("_null"),
            ]
            if atomic:
                aggs_c.append(F.countDistinct(col).alias("_ndv"))
                if numeric:
                    num = col.cast("double")
                    aggs_c += [
                        F.min(num).alias("_mn"),
                        F.max(num).alias("_mx"),
                        F.avg(num).alias("_av"),
                    ]
                    if sum_t is not None:
                        aggs_c.append(
                            F.sum(col.cast(sum_t)).cast("double").alias("_sm")
                        )
                else:
                    aggs_c += [
                        F.min(col).cast("string").alias("_smn"),
                        F.max(col).cast("string").alias("_smx"),
                    ]
            one_c = df.select(c).agg(*aggs_c)
            branches.append(
                one_c.select(
                    F.lit(c).alias("column"),
                    F.lit(dt).alias("dtype"),
                    F.col("_n").alias("n_rows"),
                    F.col("_null").alias("n_null"),
                    F.when(
                        F.col("_n") > 0, F.col("_null") / F.col("_n")
                    ).alias("null_frac"),
                    (F.col("_ndv") if atomic else null_l).alias(
                        "n_distinct"
                    ),
                    (F.col("_mn") if numeric else null_d).alias("min_num"),
                    (F.col("_mx") if numeric else null_d).alias("max_num"),
                    (F.col("_av") if numeric else null_d).alias("mean"),
                    *(
                        []
                        if sum_t is None
                        else [
                            (F.col("_sm") if numeric else null_d).alias(
                                "sum_num"
                            )
                        ]
                    ),
                    (
                        F.col("_smn") if atomic and not numeric else null_s
                    ).alias("min_str"),
                    (
                        F.col("_smx") if atomic and not numeric else null_s
                    ).alias("max_str"),
                )
            )
        from functools import reduce

        return reduce(lambda a, b: a.unionAll(b), branches)

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        dt = fields[c]
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"_null_{i}"))
        if _is_atomic_dtype(dt):
            # exact mode returned early above; this single-aggregate
            # path is approx-only (fixed-size HLL state per column)
            aggs.append(
                F.approx_count_distinct(col, rsd).alias(f"_ndv_{i}")
            )
            if _is_numeric_dtype(dt):
                num = col.cast("double")
                aggs += [
                    F.min(num).alias(f"_min_{i}"),
                    F.max(num).alias(f"_max_{i}"),
                    F.avg(num).alias(f"_avg_{i}"),
                ]
                if sum_t is not None:
                    aggs.append(
                        F.sum(col.cast(sum_t))
                        .cast("double")
                        .alias(f"_sum_{i}")
                    )
            else:
                # min/max on the NATIVE type (string collation, date
                # order), cast to string only for the report column
                aggs += [
                    F.min(col).cast("string").alias(f"_smin_{i}"),
                    F.max(col).cast("string").alias(f"_smax_{i}"),
                ]
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    rows = []
    for i, c in enumerate(cols):
        dt = fields[c]
        atomic = _is_atomic_dtype(dt)
        numeric = _is_numeric_dtype(dt)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dt).alias("dtype"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{i}").alias("n_null"),
                F.when(
                    F.col("_n") > 0, F.col(f"_null_{i}") / F.col("_n")
                ).alias("null_frac"),
                (F.col(f"_ndv_{i}") if atomic else null_l).alias(
                    "n_distinct"
                ),
                (F.col(f"_min_{i}") if numeric else null_d).alias("min_num"),
                (F.col(f"_max_{i}") if numeric else null_d).alias("max_num"),
                (F.col(f"_avg_{i}") if numeric else null_d).alias("mean"),
                *(
                    []
                    if sum_t is None
                    else [
                        (
                            F.col(f"_sum_{i}") if numeric else null_d
                        ).alias("sum_num")
                    ]
                ),
                (
                    F.col(f"_smin_{i}") if atomic and not numeric else null_s
                ).alias("min_str"),
                (
                    F.col(f"_smax_{i}") if atomic and not numeric else null_s
                ).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
