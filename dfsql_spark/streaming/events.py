"""Structured Streaming over the events table.

The reference is batch-only (SURVEY §2.7); this module adds the
streaming-shaped capability the north star asks for, expressed with
Spark Structured Streaming primitives:

* :func:`read_events_stream` — file-source ``readStream`` over the
  events parquet (schema inferred from the parquet footer, so the
  stream adapts to whichever ts encoding the data generation used;
  ns timestamps normalized).
* :func:`windowed_counts` — tumbling/sliding window aggregation with a
  watermark for late data.
* :func:`session_agg` — ``session_window`` (gap-based) aggregation.
* :func:`dedupe_stream` — ``dropDuplicatesWithinWatermark`` on the
  event id (at-least-once source → effectively-once downstream).
* :func:`running_totals_stateful` — ``applyInPandasWithState``: a
  custom stateful operator (per-user running count/sum) matching the
  shape you'd use for sessionization or CDC-style accumulators.
* :func:`run_to_memory` — executes any of the above with an
  ``availableNow`` trigger into a memory sink: batch-finite semantics
  for tests/CI while exercising the real streaming engine.

Each streaming aggregation has a batch twin (same expressions over
``spark.read``) used by the driver's DuckDB oracle; tests assert the
streaming and batch results agree on the finite input — the invariant
Structured Streaming's incremental model guarantees.

Scale notes: watermarks bound state; window/session aggs shuffle on
(key, window) — at 100 TB the state store sizes are governed by key
cardinality × watermark horizon, not input volume.  The ns→µs
timestamp normalization uses integer ``div`` (a double division loses
microseconds at 1e18 ns magnitudes).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Legacy layout: TIMESTAMP(NANOS) parquet read as INT64 nanos via
# spark.sql.legacy.parquet.nanosAsLong.  Newer testdata generations
# write native timestamp[us]; the readers below adapt to either.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos (read via nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _enable_nanos(spark: SparkSession) -> None:
    # harmless on µs/ms parquet; required to read TIMESTAMP(NANOS)
    # files at all (Spark has no nanosecond timestamp type).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def _with_event_time(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to a µs ``event_time`` timestamp column.

    * INT64 ``ts`` = epoch nanos (legacy TIMESTAMP(NANOS) data read via
      nanosAsLong): integer div by 1000 — double division of ~1.7e18 ns
      exceeds double's 2^53 mantissa and can round across a µs boundary.
    * timestamp / timestamp_ntz ``ts`` (native µs parquet): cast to the
      session-zone timestamp; the session zone is pinned UTC
      (session.py) so the wall-clock value is preserved exactly.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn(
            "event_time", F.expr("timestamp_micros(ts div 1000)")
        )
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        return df.withColumn("event_time", F.col("ts").cast("timestamp"))
    # An int32/double ts silently cast to timestamp would be read as
    # epoch SECONDS, shifting every event time by 10^9 — fail loudly.
    raise TypeError(
        f"events.ts has unsupported type {ts_type.simpleString()}; "
        "expected INT64 epoch-nanos or timestamp/timestamp_ntz"
    )


def read_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    _enable_nanos(spark)
    return _with_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet — in production this
    would be Kafka/Kinesis; the transformation pipeline is identical."""
    _enable_nanos(spark)
    # file-source streams need an explicit schema; take it from the
    # file footer (driver-only metadata read) so the stream matches
    # whichever ts encoding this data generation uses.
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    events_path = f"{sf_dir}/events.parquet"
    from ._fs import fs_for

    if fs_for(events_path, spark).isdir(events_path):
        # Spark-written replica (scripts/make_scale_data.py):
        # events.parquet is a DIRECTORY of part files — stream from it
        # directly.  (pathGlobFilter matches leaf file names only, so
        # the single-file approach below would silently exclude every
        # part-*.parquet and stream zero rows.)
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_path)
        )
    else:
        # single-file generation: file-source streams reject a bare
        # file path ("basePath must be a directory"), so stream the
        # parent with a glob narrowed to the events file.
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return _with_event_time(raw)


# ---------------------------------------------------------------------------
# windowed aggregation
# ---------------------------------------------------------------------------

def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` differs) window counts and
    value sums per event_type, tolerating ``watermark`` of lateness."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("event_time", watermark)
    win = F.window("event_time", window, slide) if slide else F.window("event_time", window)
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session aggregation per user via ``session_window`` —
    Spark merges events closer than ``gap`` into one session."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("event_time", watermark)
    return (
        src.groupBy(F.session_window("event_time", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch gaps-and-islands sessionization (lag + cumulative sum) —
    the SQL-expressible twin of :func:`session_agg`, used as the DuckDB
    oracle.  Session end here is the last *event* time (session_window
    reports last event + gap; tests reconcile the two)."""
    from pyspark.sql.window import Window

    w_user = Window.partitionBy("user_id").orderBy("event_time", "event_id")
    # µs-precision gap compare (cast-to-long truncates to seconds and
    # would disagree with an exact-interval oracle at sub-second gaps)
    micros = F.unix_micros(F.col("event_time"))
    gap_flag = (
        F.when(
            micros - F.lag(micros).over(w_user) > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    with_session = events.withColumn("new_session", gap_flag).withColumn(
        "session_id", F.sum("new_session").over(w_user)
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("event_time"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("event_time"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


# ---------------------------------------------------------------------------
# dedup + custom stateful operator
# ---------------------------------------------------------------------------

def dedupe_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate event_ids arriving within the watermark horizon —
    state is bounded by (ids seen in the last ``watermark``)."""
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_totals_stateful(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) via
    ``applyInPandasWithState`` — the escape hatch for semantics the
    built-in operators can't express (reference has nothing comparable;
    SURVEY §2.7)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# execution harness
# ---------------------------------------------------------------------------

def run_to_memory(
    streaming_df: DataFrame,
    spark: SparkSession,
    name: str,
    output_mode: str = "complete",
    timeout_sec: int = 120,
) -> DataFrame:
    """Run a streaming DataFrame to exhaustion (availableNow trigger)
    into a memory sink and return the result table — real streaming
    execution with batch-finite semantics."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
    return spark.table(name)


# ---------------------------------------------------------------------------
# stream-stream join
# ---------------------------------------------------------------------------

def stream_interval_join(
    events: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: each click joins the
    same user's view events from the preceding ``lookback`` window.

    The two sides carry their own watermarks and the join condition
    bounds event-time distance, so Spark can expire state: a view is
    held only until ``lookback + watermark`` past its event time —
    state size tracks rate x horizon, not stream length.  (An
    unbounded-condition stream-stream join would keep all history and
    is rejected in append mode.)  Batch twin for the oracle:
    :func:`interval_join_batch` — identical expressions over
    ``spark.read``.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("event_time").alias("click_time"),
        )
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.col("event_time").alias("view_time"),
            F.col("value").alias("view_value"),
        )
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_time", watermark)
        views = views.withWatermark("view_time", watermark)
    cond = (
        (F.col("click_user") == F.col("view_user"))
        & (F.col("view_time") >= F.col("click_time") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("view_time") <= F.col("click_time"))
    )
    return (
        clicks.join(views, cond)
        .select(
            "click_id",
            F.col("click_user").alias("user_id"),
            "view_id",
            F.unix_micros("click_time").alias("click_us"),
            F.unix_micros("view_time").alias("view_us"),
            "view_value",
        )
    )


def interval_join_batch(events: DataFrame, lookback: str = "10 minutes") -> DataFrame:
    """Batch twin of :func:`stream_interval_join` (same expressions)."""
    return stream_interval_join(events, lookback=lookback)


# ---------------------------------------------------------------------------
# batch event analytics: funnels & retention
# ---------------------------------------------------------------------------

def funnel_counts(
    events: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed ``steps`` in
    order (each step strictly after their first qualifying occurrence
    of the previous one).  Returns (step_idx, step, n_users).

    Plan shape: one groupBy-min per step on rows pre-filtered to that
    step's type; every join/agg is keyed on ``user_col``, so after the
    first shuffle the stages are co-partitioned (Catalyst reuses the
    hash partitioning — no re-exchange per step), and each step's
    input shrinks monotonically.  The per-step counts union into one
    plan: a single action computes the whole funnel.
    """
    if not steps:
        raise ValueError("steps must name at least one event type")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    tiers = [cur]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(tiers[-1].select(user_col, F.col("_t").alias("_prev")), user_col)
            .filter(F.col(ts_col) > F.col("_prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        tiers.append(nxt)
    counts = [
        t.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, t in enumerate(tiers)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week,
    counted in every later week they were active.  Returns
    (cohort_week date, week_offset int, n_users).

    Two aggregations keyed on ``user_col`` (first-seen) and on the
    (cohort, offset) pair — both map-side combinable; the distinct
    active-weeks set is per (user, week), bounded by users x weeks.
    Week truncation and integer day-diff arithmetic are exact and
    engine-portable (Monday-start weeks in both Spark and DuckDB).
    """
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    active = (
        events.select(
            user_col,
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        )
        .distinct()
    )
    return (
        active.join(first, user_col)
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
            user_col,
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
