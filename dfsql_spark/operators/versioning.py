"""Corpus snapshot versioning: diff two dataset versions (CDC-style
added / removed / changed / unchanged classification) without any
driver-side state.

A 100 TB training corpus is rebuilt or appended continuously; the
operational questions — what changed between snapshot N and N+1, how
much of each source churned, did a "small refresh" silently rewrite
half the corpus — reduce to a single full-outer join on the document
key, which Spark shuffles once per side (or not at all when both
snapshots are bucketed tables on the key; see
``sources/writers.py:write_bucketed_table``).

Content comparison uses ``md5`` over the concatenated compare columns
(delimited with an ASCII unit separator so ("ab","c") never collides
with ("a","bc")): portable (DuckDB reproduces it bit-for-bit), cheap
(one map-side hash per row, ~16 bytes carried into the join instead
of the full payload), and collision-safe far beyond corpus scale.
NULL columns hash as the empty string, so NULL == '' for diff
purposes — callers needing the distinction should add an explicit
null-marker column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def _content_hash(cols: "list[str]") -> Column:
    parts: "list[Column]" = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(_SEP))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
    return F.md5(F.concat(*parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: "list[str] | None" = None,
) -> DataFrame:
    """Per-document diff of two snapshots: (id_col, status) where
    status is 'added' (key only in ``new``), 'removed' (only in
    ``old``), 'changed' (key in both, content hash differs) or
    'unchanged'.

    ``compare_cols`` defaults to every shared non-key column (in
    ``new``'s column order, so schema-widening a snapshot doesn't
    flag every row as changed).

    Scale shape: each side reduces map-side to (key, 16-byte hash)
    before the join — the full-outer join shuffles ~24 bytes/row, not
    documents, and co-located bucketed snapshots skip the shuffle
    entirely.  Duplicate keys within one snapshot are a data error
    this operator surfaces rather than hides: they pass through the
    join and produce one output row per pairing.
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = [
            c for c in new.columns if c in shared and c != id_col
        ]
    if not compare_cols:
        raise ValueError("no columns to compare besides the key")
    o = old.select(
        F.col(id_col).alias("_k"), _content_hash(compare_cols).alias("_oh")
    )
    n = new.select(
        F.col(id_col).alias("_k"), _content_hash(compare_cols).alias("_nh")
    )
    return o.join(n, "_k", "full_outer").select(
        F.col("_k").alias(id_col),
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") == F.col("_nh"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: "list[str] | None" = None,
    by: "str | None" = None,
) -> DataFrame:
    """Churn summary of :func:`snapshot_diff`: counts per status,
    optionally per ``by`` group (e.g. source).  The grouping column
    is taken from ``new``, falling back to ``old`` for removed rows —
    one extra ~byte-sized column through the same join, then a
    status-cardinality aggregate (map-side combined; the shuffle is
    #groups × 4 rows)."""
    if by is None:
        return (
            snapshot_diff(old, new, id_col, compare_cols)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = [
            c for c in new.columns
            if c in shared and c not in (id_col, by)
        ]
    o = old.select(
        F.col(id_col).alias("_k"),
        F.col(by).alias("_og"),
        _content_hash(compare_cols).alias("_oh"),
    )
    n = new.select(
        F.col(id_col).alias("_k"),
        F.col(by).alias("_ng"),
        _content_hash(compare_cols).alias("_nh"),
    )
    return (
        o.join(n, "_k", "full_outer")
        .select(
            F.coalesce(F.col("_ng"), F.col("_og")).alias(by),
            F.when(F.col("_oh").isNull(), F.lit("added"))
            .when(F.col("_nh").isNull(), F.lit("removed"))
            .when(F.col("_oh") == F.col("_nh"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
        .groupBy(by, "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def schema_drift_report(
    old: DataFrame,
    new: DataFrame,
    ndv: str = "approx",
) -> DataFrame:
    """Column-level drift between two snapshot SCHEMAS and value
    distributions — the companion to :func:`snapshot_diff` (which
    diffs rows): an upstream producer silently widening a column,
    nulling a field out, or re-encoding an enum shows up here before
    any row-level diff or training run pays for it.

    Internally profiles both sides with
    :func:`~dfsql_spark.operators.checks.column_profile` (one
    aggregation pass per side, ``ndv`` forwarded) and full-outer-joins
    the two #columns-row profiles.  Per column::

        status           added | removed | common
        dtype_changed    simpleString inequality (common columns)
        null_frac_delta  new - old
        ndv_ratio        new / old (NULL when either side lacks NDV)
        mean_delta       new - old (numeric columns)

    Everything after the two profile scans is #columns-sized.  Output:
    ``(column, status, dtype_old, dtype_new, dtype_changed,
    null_frac_old, null_frac_new, null_frac_delta, ndv_old, ndv_new,
    ndv_ratio, mean_old, mean_new, mean_delta)``.
    """
    from .checks import column_profile

    po = column_profile(old, ndv=ndv).select(
        F.col("column"),
        F.col("dtype").alias("dtype_old"),
        F.col("null_frac").alias("null_frac_old"),
        F.col("n_distinct").alias("ndv_old"),
        F.col("mean").alias("mean_old"),
    )
    pn = column_profile(new, ndv=ndv).select(
        F.col("column"),
        F.col("dtype").alias("dtype_new"),
        F.col("null_frac").alias("null_frac_new"),
        F.col("n_distinct").alias("ndv_new"),
        F.col("mean").alias("mean_new"),
    )
    j = po.join(pn, "column", "full_outer")
    status = (
        F.when(F.col("dtype_old").isNull(), F.lit("added"))
        .when(F.col("dtype_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    return j.select(
        "column",
        status.alias("status"),
        "dtype_old",
        "dtype_new",
        F.when(
            status == "common", F.col("dtype_old") != F.col("dtype_new")
        ).alias("dtype_changed"),
        "null_frac_old",
        "null_frac_new",
        (F.col("null_frac_new") - F.col("null_frac_old")).alias(
            "null_frac_delta"
        ),
        "ndv_old",
        "ndv_new",
        F.when(
            F.col("ndv_old") > 0, F.col("ndv_new") / F.col("ndv_old")
        ).alias("ndv_ratio"),
        "mean_old",
        "mean_new",
        (F.col("mean_new") - F.col("mean_old")).alias("mean_delta"),
    )
