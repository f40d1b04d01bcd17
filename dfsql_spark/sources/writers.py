"""Sinks: write query results / tables to files.

The reference has **no** writers — results only ever come back as
in-memory pandas objects (SURVEY.md §2.1, "Sinks: None").  At 100 TB a
result that must land on storage cannot cross the driver, so this
module is a capability uplift: distributed writes straight from
executors, with the knobs that matter at scale —

* ``partition_by``    → hive-style directory partitioning (enables
                        partition pruning for downstream readers)
* ``bucket_by``       → pre-shuffled layout for co-located joins
                        (requires ``saveAsTable``; persistent catalog)
* ``max_records_per_file`` / ``repartition`` → output-file sizing so a
                        1000-executor write neither produces millions
                        of tiny files nor a few giant ones
* ``sort_by``         → within-file ordering for row-group skipping
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_VALID_FORMATS = {"parquet", "csv", "json", "orc"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
    repartition: int | list[str] | None = None,
    sort_by: list[str] | str | None = None,
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path`` as ``fmt``, fully distributed.

    ``repartition`` accepts an int (file-count control) or a column
    list (align output files with ``partition_by`` so each partition
    directory is written by the executors that own its rows — avoids
    the many-small-files explosion when every task holds every key).
    """
    if fmt not in _VALID_FORMATS:
        raise ValueError(f"Unsupported format {fmt!r}; one of {sorted(_VALID_FORMATS)}")
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    if isinstance(sort_by, str):
        sort_by = [sort_by]

    if isinstance(repartition, int):
        df = df.repartition(repartition)
    elif isinstance(repartition, (list, tuple)):
        df = df.repartition(*repartition)
    elif repartition is None and partition_by:
        # default: co-locate rows of each output partition
        df = df.repartition(*partition_by)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)

    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: "list[str] | str",
    n_buckets: int = 32,
    sort_by: "list[str] | str | None" = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table (``saveAsTable``).

    Bucketing pre-shuffles the data ONCE at write time: every
    subsequent equi-join or aggregation on ``bucket_by`` reads
    co-located buckets and skips its Exchange entirely — the
    difference between an O(data) shuffle per query and none, which
    at 100 TB is the dominant cost of repeated fact-fact joins.
    Requires a catalog table (bucket metadata lives in the metastore),
    hence ``saveAsTable`` rather than a path write; pair tables must
    use the same ``n_buckets`` and keys.
    """
    if isinstance(bucket_by, str):
        bucket_by = [bucket_by]
    writer = (
        df.write.mode(mode)
        .format(fmt)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        if isinstance(sort_by, str):
            sort_by = [sort_by]
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(name)


def write_zordered_table(
    df: DataFrame,
    path: str,
    zorder_by: "list[str]",
    n_files: int = 32,
    bits: int = 16,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Write ``df`` clustered on a Z-order (Morton) curve over
    ``zorder_by`` — multi-dimensional data skipping for downstream
    scans.

    Linear sort layouts skip well on the leading column only; Z-order
    interleaves the bits of all ``zorder_by`` columns so each output
    file covers a small hyper-rectangle of the key space, and a
    predicate on ANY subset of the columns prunes most files via
    parquet min/max footer stats.  This is the layout trick that turns
    a 100 TB full scan into a few-file read for point/range lookups on
    secondary dimensions (same idea as Delta's OPTIMIZE ZORDER BY).

    Mechanics (all one pass + one tiny stats pass, no driver data):
    numeric columns are min/max-normalized to ``bits``-bit integers
    (a single global agg, broadcast back as literals); their bits are
    interleaved with codegen'd shift/or expressions into one morton
    value; ``repartitionByRange(n_files, morton)`` range-partitions the
    curve so each file owns a contiguous curve segment; a final
    within-partition sort tightens row-group stats.  Skew in the value
    distribution maps to uneven curve segments — range partitioning
    absorbs it (quantile-based boundaries from a sample).

    Limitations (documented, not silent): columns must be numeric
    (cast dates/timestamps to epoch first); min==max columns contribute
    zero bits (constant).
    """
    from pyspark.sql import functions as F

    if fmt not in _VALID_FORMATS:
        raise ValueError(f"Unsupported format {fmt!r}; one of {sorted(_VALID_FORMATS)}")
    if not zorder_by or len(zorder_by) < 2:
        raise ValueError("zorder_by needs at least 2 columns (use sort_by for 1)")
    if bits * len(zorder_by) > 63:
        raise ValueError(
            f"bits={bits} x {len(zorder_by)} columns exceeds a signed 64-bit morton"
        )
    for c in zorder_by:
        if not df.schema[c].dataType.typeName() in (
            "integer", "long", "short", "byte", "float", "double", "decimal",
        ):
            raise ValueError(f"zorder column {c!r} must be numeric")

    # one tiny stats pass; results land in the plan as literals
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in zorder_by],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in zorder_by],
    ).first()
    scale = (1 << bits) - 1
    quant = []
    for c in zorder_by:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            quant.append(F.lit(0).cast("long"))
        else:
            q = F.floor(
                (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn) * scale
            ).cast("long")
            # clamp fp edge (x == max -> exactly scale)
            quant.append(F.least(F.greatest(q, F.lit(0)), F.lit(scale)))
    n = len(zorder_by)
    # interleave: output bit (b*n + i) = bit b of column i — unrolled
    # shift/and/or terms, all inside whole-stage codegen
    morton = F.lit(0).cast("long")
    for i, q in enumerate(quant):
        for b in range(bits):
            morton = morton.bitwiseOR(
                F.shiftleft(q.bitwiseAND(F.lit(1 << b)).cast("long"), b * (n - 1) + i)
            )
    zdf = (
        df.withColumn("__z", morton)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    # NOTE: drop AFTER the sort keeps the curve order; Spark plans the
    # sort on the pre-drop projection.
    zdf.write.format(fmt).mode(mode).options(**options).save(path)


def merge_table(
    spark,
    target_path: str,
    source: DataFrame,
    key: "list[str] | str",
    when_matched: str = "update",
    insert_not_matched: bool = True,
    fmt: str = "parquet",
    validate_unique_key: bool = True,
) -> None:
    """Batch MERGE (upsert) into a parquet/orc table — the batch twin
    of the streaming idempotent upsert sink (streaming/sinks.py).

    Semantics per key: ``when_matched="update"`` replaces the target
    row with the source row; ``"delete"`` removes it; ``"ignore"``
    keeps the target row.  ``insert_not_matched`` appends source keys
    absent from the target.  Equivalent to::

        MERGE INTO target USING source ON <key>
        WHEN MATCHED THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT

    Plan shape: ONE full-outer shuffle join on the key (AQE broadcasts
    the source side when it is small — the common CDC case), per-column
    coalesce picks the winner, then a copy-on-write swap: the merged
    table is written beside the target and moved into place.  The swap
    is write-temp -> delete-old -> rename, NOT transactional — a table
    format with a commit log (Delta/Iceberg) is the right tool when
    concurrent readers need snapshot isolation; this is the
    plain-parquet fallback with the same dataflow.

    At 100 TB the rewrite cost is the whole table (copy-on-write);
    partition the target and merge only affected partitions to bound
    it (pass a pre-filtered target path/dataset).

    Like standard MERGE, a source with duplicate join keys is an error
    (each would multiply the matched target row); the check is one
    tiny aggregate on the source — disable with
    ``validate_unique_key=False`` only if the source is known-unique.
    """
    if when_matched not in ("update", "delete", "ignore"):
        raise ValueError(
            f"when_matched must be update|delete|ignore, got {when_matched!r}"
        )
    keys = [key] if isinstance(key, str) else list(key)
    from pyspark.sql import functions as F

    target = spark.read.format(fmt).load(target_path)
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(target.columns)} "
            f"vs source {sorted(source.columns)}"
        )
    pinned = False
    if validate_unique_key:
        # persist: the check is an extra ACTION over the source plan —
        # without the pin an expensive source subquery would compute
        # twice (once here, once in the merge join).  Aggregate column
        # aliased so it can never collide with a key named "count".
        source = source.persist()
        pinned = True
    try:
        if validate_unique_key:
            dup = (
                source.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                dk = {k: dup[0][k] for k in keys}
                raise ValueError(
                    f"merge_table: source has duplicate join keys (e.g. {dk}); "
                    "each would multiply the matched target row.  Deduplicate "
                    "the source (keep the latest change per key) or pass "
                    "validate_unique_key=False if duplication is intended."
                )
        # side-presence via literal marker columns, not value nullability —
        # a matched row may legitimately hold NULLs in every data column
        t = target.alias("t").withColumn("__t", F.lit(1))
        s = source.alias("s").withColumn("__s", F.lit(1))
        joined = t.join(s, keys, "full_outer")
        matched = F.col("__t").isNotNull() & F.col("__s").isNotNull()
        only_t = F.col("__t").isNotNull() & F.col("__s").isNull()
        only_s = F.col("__t").isNull() & F.col("__s").isNotNull()
        take = {"update": "s", "ignore": "t"}.get(when_matched)
        keep = only_t | (matched & F.lit(when_matched != "delete"))
        if insert_not_matched:
            keep = keep | only_s
        merged = joined.filter(keep).select(
            *keys,
            *[
                F.when(matched, F.col(f"{take}.{c}") if take else F.lit(None))
                .when(only_s, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in target.columns
                if c not in keys
            ],
        ).select(*target.columns)  # original column order

        tmp = target_path.rstrip("/") + "__merge_tmp"
        merged.write.format(fmt).mode("overwrite").save(tmp)
        # copy-on-write swap via Hadoop FS (works on HDFS/S3A/local
        # alike).  Hadoop signals failure by RETURNING false, not
        # raising — an unchecked swap would report a successful merge
        # while the table still serves pre-merge rows (or worse,
        # rename-into-existing-dir nests tmp under the target).
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        Path = jvm.org.apache.hadoop.fs.Path
        fs = Path(target_path).getFileSystem(conf)
        if not fs.delete(Path(target_path), True):
            raise IOError(
                f"merge_table: could not delete old target {target_path!r}; "
                f"merged output preserved at {tmp!r}"
            )
        if not fs.rename(Path(tmp), Path(target_path)):
            raise IOError(
                f"merge_table: rename {tmp!r} -> {target_path!r} failed; "
                f"TARGET IS MISSING — recover the merged output from {tmp!r}"
            )
    finally:
        if pinned:
            source.unpersist()


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: "int | None" = None,
    shard_tokens: "int | None" = None,
    key_col: str = "doc_id",
    token_col: "str | None" = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    write_manifest: bool = True,
) -> DataFrame:
    """Export a curated corpus as content-addressed training shards
    with a per-shard manifest — the hand-off step from this engine to
    a training loader (WebDataset-style shard layout over hive dirs:
    ``path/shard=N/``).

    Shard assignment is the repo-wide determinism contract
    (``operators/text.py:_salted_bucket``: first 8 hex chars of
    ``md5('shard:' || key)`` mod ``n_shards``): stable across runs,
    partitionings, engines, and dataset versions, so an incremental
    re-export moves only documents whose KEY changed, and a DuckDB /
    pandas loader can recompute any document's shard without Spark.
    Size with EITHER ``n_shards`` (explicit) OR ``shard_tokens``
    (target tokens per shard: one tiny aggregate over ``token_col``
    derives ``n_shards = ceil(total/target)``).

    Scale shape: ONE shuffle, hash-partitioned on the shard id, so
    each shard directory is written by exactly the task that owns its
    rows (no small-file explosion); content-addressed buckets balance
    by law of large numbers.  The manifest (``shard, n_docs
    [, n_tokens]``) is a #shards-row aggregate of the SAME shuffled
    pass, returned as a DataFrame and (``write_manifest=True``)
    written to ``path/_manifest`` as a single file.

    Returns the manifest DataFrame.
    """
    if (n_shards is None) == (shard_tokens is None):
        raise ValueError("pass exactly one of n_shards / shard_tokens")
    if shard_tokens is not None and token_col is None:
        raise ValueError("shard_tokens sizing requires token_col")
    if fmt not in _VALID_FORMATS:
        raise ValueError(
            f"Unsupported format {fmt!r}; one of {sorted(_VALID_FORMATS)}"
        )
    import math

    from pyspark.sql import functions as F

    if shard_tokens is not None:
        if shard_tokens < 1:
            raise ValueError(f"shard_tokens must be >= 1, got {shard_tokens}")
        total = df.agg(F.sum(F.col(token_col).cast("long"))).first()[0] or 0
        n_shards = max(1, math.ceil(total / shard_tokens))
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # flag, don't guess: a NULL key would hash to a NULL shard and
    # vanish into the hive default partition where no loader
    # recomputing the documented formula could find it.  One
    # key-column-pruned existence probe (limit(1), same pattern as
    # merge_table's unique-key check).
    if df.filter(F.col(key_col).isNull()).limit(1).count():
        raise ValueError(
            f"write_training_shards: NULL values in key_col {key_col!r} "
            "cannot be shard-addressed; assign ids first"
        )

    from ..operators.text import _salted_bucket

    # THE repo-wide determinism contract (one definition, never inlined)
    bucket = _salted_bucket(
        F.col(key_col).cast("string"), n_shards, salt="shard"
    ).cast("int")
    sharded = df.withColumn("shard", bucket).repartition(n_shards, "shard")
    writer = sharded.write.mode(mode).format(fmt)
    if fmt == "csv":
        # header: read-back needs names.  escape='"' (RFC 4180 quote
        # doubling, instead of Spark's '\' default) pins the quoting
        # contract the manifest read-back below — and any external
        # loader — depends on for newline/quote-bearing text fields.
        # The whitespace-trim write defaults are disabled: a corpus
        # export must round-trip text VERBATIM (leading/trailing
        # whitespace is data, e.g. code indentation).
        writer = (
            writer.option("header", "true")
            .option("escape", '"')
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
        )
    writer.partitionBy("shard").save(path)

    # manifest from the files ON DISK (column-pruned to the partition
    # dir + token column): audits what the export actually wrote.  For
    # parquet/orc that is a footer-level scan; for json Spark re-reads
    # data but the format round-trips losslessly.  csv does NOT: a
    # text corpus routinely carries embedded newlines, and a default
    # (non-multiLine) read-back splits each such doc into several
    # records — the manifest would silently overcount n_docs and
    # miscount n_tokens (round-11 advisor).  So the csv read-back pins
    # the writer's actual quoting contract (multiLine + '"' escape,
    # matching Spark's csv writer defaults) and reuses the pre-write
    # schema instead of inferSchema (which would force a second full
    # parse just to guess types we already know).
    reader = sharded.sparkSession.read.format(fmt)
    if fmt == "csv":
        reader = (
            reader.option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .schema(sharded.drop("shard").schema)
        )
    written = reader.load(path)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
    manifest = written.groupBy("shard").agg(*aggs)
    if write_manifest:
        # ALWAYS overwrite: the manifest audits current directory
        # state — appending would stack stale generations of counts
        manifest.coalesce(1).write.mode("overwrite").format("parquet").save(
            path.rstrip("/") + "/_manifest"
        )
    return manifest
