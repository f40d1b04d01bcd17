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
