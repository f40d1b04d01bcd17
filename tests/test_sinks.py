"""Streaming sink tests: foreachBatch + idempotent keyed upsert.

The invariants a production sink must hold:

* multi-batch upsert converges to last-writer-wins per key;
* replaying a committed batch_id is a no-op (at-least-once upstream →
  effectively-once in the table);
* a crash between snapshot write and marker write leaves no visible
  state (the marker is the commit point);
* the end-to-end streaming pipeline (stream → stateful accumulator →
  foreachBatch upsert → read back) equals the batch aggregate.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR

from dfsql_spark.streaming.sinks import KeyedParquetSink, run_foreach_batch


@pytest.fixture()
def sink(tmp_path):
    return KeyedParquetSink(
        str(tmp_path / "state"), key_cols=["user_id"], order_col="version"
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "version", "total"])
    )


def test_multi_batch_upsert_last_writer_wins(spark, sink):
    sink.process_batch(_batch(spark, [(1, 1, 10.0), (2, 1, 20.0)]), 0)
    sink.process_batch(_batch(spark, [(1, 2, 11.0), (3, 1, 30.0)]), 1)
    state = sink.read(spark).orderBy("user_id").collect()
    assert [(r.user_id, r.version, r.total) for r in state] == [
        (1, 2, 11.0),  # updated by batch 1
        (2, 1, 20.0),  # untouched since batch 0
        (3, 1, 30.0),  # inserted by batch 1
    ]


def test_within_batch_order_col_breaks_ties(spark, sink):
    # two rows for one key in ONE batch: the max-version row wins
    sink.process_batch(_batch(spark, [(1, 1, 10.0), (1, 5, 50.0), (1, 3, 30.0)]), 0)
    state = sink.read(spark).collect()
    assert [(r.user_id, r.version, r.total) for r in state] == [(1, 5, 50.0)]


def test_replayed_batch_is_noop(spark, sink):
    sink.process_batch(_batch(spark, [(1, 1, 10.0)]), 0)
    sink.process_batch(_batch(spark, [(1, 2, 11.0)]), 1)
    # upstream failure replays batch 1 — with stale data, even; the
    # commit marker short-circuits before anything is read or written
    sink.process_batch(_batch(spark, [(1, 99, 999.0)]), 1)
    state = sink.read(spark).collect()
    assert [(r.user_id, r.version, r.total) for r in state] == [(1, 2, 11.0)]
    assert sink.committed_batches() == [0, 1]


def test_dangling_snapshot_invisible_and_recovered(spark, sink):
    sink.process_batch(_batch(spark, [(1, 1, 10.0)]), 0)
    # simulate a crash AFTER snapshot=1 data lands but BEFORE its
    # marker: write the directory manually
    _batch(spark, [(1, 2, 99.0)]).write.parquet(
        os.path.join(sink.path, "snapshot=1")
    )
    # reader ignores the markerless snapshot
    state = sink.read(spark).collect()
    assert [(r.user_id, r.version) for r in state] == [(1, 1)]
    # the replayed batch rewrites the dangling dir and commits
    sink.process_batch(_batch(spark, [(1, 2, 11.0)]), 1)
    state = sink.read(spark).collect()
    assert [(r.user_id, r.version, r.total) for r in state] == [(1, 2, 11.0)]


def test_vacuum_keeps_latest_only(spark, sink):
    for i in range(3):
        sink.process_batch(_batch(spark, [(1, i, float(i))]), i)
    sink.vacuum()
    dirs = sorted(os.listdir(sink.path))
    assert dirs == ["_committed_2", "snapshot=2"]
    state = sink.read(spark).collect()
    assert [(r.user_id, r.version) for r in state] == [(1, 2)]


def test_empty_sink_reads_none(spark, sink):
    assert sink.read(spark) is None
    assert sink.committed_batches() == []


def test_uri_path_uses_hadoop_fs(spark, tmp_path):
    """Scheme'd table roots route marker I/O through the Hadoop
    FileSystem API (the commit protocol must live on the same storage
    as the snapshots).  file:// exercises the HadoopFS adapter against
    real storage; hdfs://s3a:// use the same code path."""
    from dfsql_spark.streaming._fs import HadoopFS

    sink = KeyedParquetSink(f"file://{tmp_path}/state", key_cols=["k"])
    assert isinstance(sink._fs(spark), HadoopFS)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    sink.process_batch(b0, 0)
    assert sink.committed_batches(spark) == [0]
    # replay is a no-op; upsert batch overwrites by key
    sink.process_batch(b0, 0)
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    sink.process_batch(b1, 1)
    state = {(r.k, r.v) for r in sink.read(spark).collect()}
    assert state == {(1, "a"), (2, "B"), (3, "c")}
    sink.vacuum(spark)
    assert sink.committed_batches(spark) == [1]


def test_uri_path_without_session_raises(tmp_path):
    from pyspark.sql import SparkSession

    sink = KeyedParquetSink("s3a://bucket/state", key_cols=["k"])
    if SparkSession.getActiveSession() is None:
        with pytest.raises(RuntimeError, match="SparkSession is required"):
            sink.committed_batches()


def test_run_foreach_batch_timeout_raises(spark, tmp_path):
    """A stream that cannot drain within the timeout must raise, not
    silently stop with truncated sink state."""
    import time

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )
    with pytest.raises(TimeoutError, match="still active"):
        # the batch fn outsleeps the timeout, so the query is
        # deterministically still active when awaitTermination returns
        run_foreach_batch(
            stream,
            lambda df, bid: time.sleep(5),
            output_mode="append",
            checkpoint_dir=str(tmp_path / "ckpt_timeout"),
            timeout_sec=0.2,
        )


def test_stream_upsert_pipeline_equals_batch_agg(spark, tmp_path):
    """End-to-end: events stream → applyInPandasWithState running
    totals → foreachBatch upsert → final table == batch groupBy."""
    from dfsql_spark.streaming.events import (
        read_events_batch,
        read_events_stream,
        running_totals_stateful,
    )

    sink = KeyedParquetSink(
        str(tmp_path / "rt"), key_cols=["user_id"], order_col="n_events"
    )
    run_foreach_batch(
        running_totals_stateful(read_events_stream(spark, SF_DIR)),
        sink.process_batch,
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in sink.read(spark).collect()
    }
    expected = {
        r.user_id: (r.n_events, r.total_value)
        for r in read_events_batch(spark, SF_DIR)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == expected
