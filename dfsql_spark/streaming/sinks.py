"""Streaming sinks: ``foreachBatch`` writer + idempotent keyed upsert.

``run_to_memory`` (events.py) covers tests/CI, but a real pipeline
writes somewhere durable.  Structured Streaming's contract for custom
sinks is ``foreachBatch``: each micro-batch arrives as a *batch*
DataFrame with a monotonically increasing ``batch_id``, and the sink
must be **idempotent on batch_id** — after a failure the engine replays
the last uncommitted batch, so writing the same (batch_id, data) twice
must leave the same state.

:class:`KeyedParquetSink` implements the MERGE-style upsert every
CDC/accumulator pipeline needs on plain parquet, with the standard
snapshot+marker recipe:

* state lives under ``<path>/snapshot=<batch_id>/`` — one immutable
  snapshot per committed batch, plus a ``_committed_<batch_id>`` marker
  written AFTER the snapshot data; readers resolve the newest marker,
  so a crash mid-write leaves a dangling (markerless) directory that is
  simply ignored — the effective commit is atomic without filesystem
  rename guarantees.
* a replayed batch_id short-circuits on its existing marker
  (idempotence), so at-least-once delivery upstream becomes
  effectively-once in the table.
* upsert = previous snapshot ∪ batch, keep the last writer per key
  (batch rows beat snapshot rows; within a batch an optional
  ``order_col`` breaks ties) — exactly MERGE ... WHEN MATCHED UPDATE /
  WHEN NOT MATCHED INSERT for last-writer-wins semantics.

Scale notes: each commit rewrites the full key state, which is right
when the keyed state is compact (per-user accumulators: rows =
cardinality(key), not event volume) — the state table is the SMALL side
of the pipeline.  For 100 TB *fact* upserts use a transactional table
format (Delta/Iceberg MERGE with file-level pruning); this sink
deliberately sticks to dependency-free parquet while keeping the same
foreachBatch contract, so swapping ``process_batch`` for a Delta MERGE
is a one-line change.  Old snapshots are retained for time travel /
debuggability; call :meth:`vacuum` to keep only the latest.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["KeyedParquetSink", "run_foreach_batch"]

_MARKER_PREFIX = "_committed_"
_SNAPSHOT_PREFIX = "snapshot="


class KeyedParquetSink:
    """Idempotent last-writer-wins upsert into a parquet state table.

    Parameters
    ----------
    path : table root directory (created on first commit)
    key_cols : upsert key (e.g. ``["user_id"]``)
    order_col : optional column ordering rows *within one batch*; the
        max wins.  Across batches, later batches always win.
    """

    def __init__(self, path: str, key_cols: list[str], order_col: str | None = None):
        # Marker/listing I/O goes through the same storage system as
        # the snapshot parquet: driver-local os for scheme-less paths,
        # the Hadoop FileSystem API for any URI (file://, hdfs://,
        # s3a://) — see _fs.py.  Writing markers with driver-local I/O
        # against a remote table root would silently break the commit
        # protocol (every batch would look uncommitted).
        self.path = path.rstrip("/")
        self.key_cols = list(key_cols)
        self.order_col = order_col

    def _fs(self, spark: SparkSession | None = None):
        from ._fs import fs_for

        return fs_for(self.path, spark)

    def _join(self, name: str) -> str:
        # URI-safe join: Hadoop paths always use '/'
        return f"{self.path}/{name}"

    # -- commit log --------------------------------------------------------
    def committed_batches(self, spark: SparkSession | None = None) -> list[int]:
        fs = self._fs(spark)
        if not fs.isdir(self.path):
            return []
        return sorted(
            int(name[len(_MARKER_PREFIX):])
            for name in fs.listdir(self.path)
            if name.startswith(_MARKER_PREFIX)
        )

    def _snapshot_dir(self, batch_id: int) -> str:
        return self._join(f"{_SNAPSHOT_PREFIX}{batch_id}")

    # -- reads -------------------------------------------------------------
    def read(self, spark: SparkSession) -> "DataFrame | None":
        """Current state (latest committed snapshot), or None if empty."""
        committed = self.committed_batches(spark)
        if not committed:
            return None
        return spark.read.parquet(self._snapshot_dir(committed[-1]))

    # -- the foreachBatch callable ----------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Upsert one micro-batch.  Safe to call twice with the same
        ``batch_id`` (replay after failure): the existing commit marker
        short-circuits."""
        spark = batch_df.sparkSession
        fs = self._fs(spark)
        marker = self._join(f"{_MARKER_PREFIX}{batch_id}")
        if fs.exists(marker):
            return  # replayed batch — already committed
        prev = self.read(spark)
        new = batch_df.withColumn("_src", F.lit(1))
        merged = (
            prev.withColumn("_src", F.lit(0)).unionByName(new)
            if prev is not None
            else new
        )
        order = [F.col("_src").desc()]
        if self.order_col:
            order.append(F.col(self.order_col).desc())
        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        snapshot = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_src")
        )
        snap_dir = self._snapshot_dir(batch_id)
        if fs.isdir(snap_dir):
            # dangling data from a crash before the marker write —
            # remove and rewrite (the marker is the commit point)
            fs.delete(snap_dir)
        snapshot.write.mode("overwrite").parquet(snap_dir)
        fs.touch(marker)  # marker AFTER data = the atomic commit point

    def vacuum(self, spark: SparkSession | None = None) -> None:
        """Drop all but the latest committed snapshot (and any dangling
        uncommitted snapshot directories)."""
        fs = self._fs(spark)
        committed = self.committed_batches(spark)
        keep = committed[-1] if committed else None
        if not fs.isdir(self.path):
            return
        for name in fs.listdir(self.path):
            full = self._join(name)
            if name.startswith(_SNAPSHOT_PREFIX):
                bid = int(name[len(_SNAPSHOT_PREFIX):])
                if bid != keep and (
                    bid not in committed or keep is None or bid < keep
                ):
                    fs.delete(full)
            elif name.startswith(_MARKER_PREFIX):
                bid = int(name[len(_MARKER_PREFIX):])
                if keep is not None and bid < keep:
                    fs.delete(full)


def run_foreach_batch(
    streaming_df: DataFrame,
    batch_fn,
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
    timeout_sec: float = 120,
) -> None:
    """Run a streaming DataFrame to exhaustion (availableNow trigger)
    through a ``foreachBatch`` sink.

    ``checkpoint_dir`` enables exactly-once batch-id tracking across
    restarts (pass a stable path in production; a throwaway default is
    used otherwise — fine for availableNow one-shots whose sink is
    idempotent anyway, like :class:`KeyedParquetSink`)."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="dfsql_spark_sink_ckpt_")
    q = (
        streaming_df.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        # A timed-out stream means the sink state is incomplete; failing
        # loudly here beats letting downstream reads see silently
        # truncated results.
        q.stop()
        raise TimeoutError(
            f"streaming query still active after {timeout_sec}s "
            f"(availableNow run did not drain the source)"
        )
