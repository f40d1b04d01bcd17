"""Streaming semantics tests: on finite input, every streaming
aggregation must agree with its batch twin — the invariant Structured
Streaming's incremental execution guarantees."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def batch_events(spark):
    from dfsql_spark.streaming.events import read_events_batch

    # Unpersist on teardown so the cached plan can't be substituted into
    # later plan audits over the same file (test_plan_audit.py:56).
    df = read_events_batch(spark, SF_DIR).cache()
    yield df
    df.unpersist()


def _stream(spark):
    from dfsql_spark.streaming.events import read_events_stream

    return read_events_stream(spark, SF_DIR)


def test_stream_windowed_equals_batch(spark, batch_events):
    from dfsql_spark.streaming.events import run_to_memory, windowed_counts

    batch = {tuple(r) for r in windowed_counts(batch_events).collect()}
    stream_df = run_to_memory(
        windowed_counts(_stream(spark)), spark, f"t_{uuid.uuid4().hex[:8]}"
    )
    stream = {tuple(r) for r in stream_df.collect()}
    assert batch == stream


def test_sliding_window_counts(batch_events):
    from dfsql_spark.streaming.events import windowed_counts

    tumbling = windowed_counts(batch_events, window="1 hour")
    sliding = windowed_counts(batch_events, window="1 hour", slide="30 minutes")
    # each event lands in exactly 2 sliding windows
    t = tumbling.agg(F.sum("n_events")).collect()[0][0]
    s = sliding.agg(F.sum("n_events")).collect()[0][0]
    assert s == 2 * t


def test_session_window_equals_gaps_islands(spark, batch_events):
    """session_window and the SQL gaps-and-islands formulation must
    find identical sessions (start, count, value) per user."""
    from dfsql_spark.streaming.events import session_agg, sessionize_batch

    sw = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in session_agg(batch_events).collect()
    }
    gi = {
        (r.user_id, r.session_start, r.n_events, r.session_value)
        for r in sessionize_batch(batch_events).collect()
    }
    assert sw == gi


def test_session_gap_boundary_semantics(spark):
    """Exact-gap boundaries, where > vs >= semantics diverge and real
    timestamps never land: an event EXACTLY `gap` after its
    predecessor continues the session; one microsecond past the gap
    starts a new one — and session_window and the gaps-and-islands
    formulation agree on BOTH edges (probed round 13; this pins it)."""
    import datetime as dt

    from dfsql_spark.streaming.events import session_agg, sessionize_batch

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", "e1", base, 1.0),
        ("u1", "e2", base + dt.timedelta(minutes=30), 1.0),  # == gap
        ("u1", "e3", base + dt.timedelta(minutes=60, microseconds=1), 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id string, event_id string, event_time timestamp, value double",
    )
    gi = sorted(
        (r.session_start, r.n_events)
        for r in sessionize_batch(df, gap_minutes=30).collect()
    )
    sw = sorted(
        (r.session_start, r.n_events)
        for r in session_agg(df, gap="30 minutes").collect()
    )
    want = [("2024-01-01 00:00:00", 2), ("2024-01-01 01:00:00", 1)]
    assert gi == want, gi
    assert sw == want, sw


def test_tumbling_window_edge_assignment(spark):
    """Window buckets are [start, end): an event exactly on the hour
    belongs to the window it STARTS, never the one it ends — no event
    is double-counted or dropped at the edge (the e01 oracle's
    date_trunc spells the same convention)."""
    import datetime as dt

    from dfsql_spark.streaming.events import windowed_counts

    h = dt.datetime(2024, 1, 1, 13, 0, 0)
    rows = [
        ("e1", "u1", "click", h - dt.timedelta(microseconds=1), 1.0),
        ("e2", "u1", "click", h, 1.0),                       # exact edge
        ("e3", "u1", "click", h + dt.timedelta(microseconds=1), 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id string, user_id string, event_type string,"
        " event_time timestamp, value double",
    )
    got = {
        r.window_start: r.n_events
        for r in windowed_counts(df, window="1 hour").collect()
    }
    assert got == {"2024-01-01 12:00:00": 1, "2024-01-01 13:00:00": 2}, got


def test_interval_join_boundary_inclusivity(spark):
    """The lookback window is CLOSED on both ends: a view exactly
    `lookback` before the click joins, a view one microsecond earlier
    does not, and a view at the click instant joins (<=).  Real-data
    twins/oracles never land on these edges; this pins the contract
    the e07 oracle SQL spells with >= / <=."""
    import datetime as dt

    from dfsql_spark.streaming.events import interval_join_batch

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("c1", "u1", "click", t0, 0.0),
        ("v_edge", "u1", "view", t0 - dt.timedelta(minutes=10), 1.0),
        ("v_past", "u1", "view",
         t0 - dt.timedelta(minutes=10, microseconds=1), 1.0),
        ("v_now", "u1", "view", t0, 1.0),
        ("v_future", "u1", "view", t0 + dt.timedelta(microseconds=1), 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id string, user_id string, event_type string,"
        " event_time timestamp, value double",
    )
    got = sorted(
        r.view_id
        for r in interval_join_batch(df, lookback="10 minutes").collect()
    )
    assert got == ["v_edge", "v_now"], got


def test_stream_dedupe_noop_on_unique_ids(spark, batch_events):
    from dfsql_spark.streaming.events import dedupe_stream, run_to_memory

    out = run_to_memory(
        dedupe_stream(_stream(spark)),
        spark,
        f"t_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    assert out.count() == batch_events.count()


def test_stream_dedupe_drops_planted_duplicates(spark, batch_events):
    """Dedup must actually DROP rows: the stream unioned with a full
    replay of itself carries every event_id twice; the output must be
    exactly one copy per id (the batch DISTINCT), not the doubled
    input."""
    from dfsql_spark.streaming.events import dedupe_stream, run_to_memory

    doubled = _stream(spark).union(_stream(spark))
    out = run_to_memory(
        dedupe_stream(doubled),
        spark,
        f"t_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    n_unique = batch_events.count()
    n_out = out.count()
    assert n_out == n_unique  # one copy per id ...
    assert n_out < 2 * n_unique  # ... strictly fewer than the input rows
    assert out.select("event_id").distinct().count() == n_unique


def test_stream_dedupe_drops_explicit_dupe_file(spark, tmp_path):
    """Plant duplicates at the source level: the same rows written as
    two parquet files in one stream directory — dedup emits each id
    once."""
    from dfsql_spark.streaming.events import (
        EVENTS_RAW_SCHEMA,
        _with_event_time,
        dedupe_stream,
        run_to_memory,
    )

    rows = [
        (i, 1_700_000_000_000_000_000 + i * 60_000_000_000, 7, "click", 1.0, "{}")
        for i in range(5)
    ]
    src = str(tmp_path / "dupe_src")
    df = spark.createDataFrame(rows, EVENTS_RAW_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(src)
    df.coalesce(1).write.mode("append").parquet(src)  # second copy of every row
    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(src)
    out = run_to_memory(
        dedupe_stream(_with_event_time(raw)),
        spark,
        f"t_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    assert out.count() == 5  # 10 input rows, 5 distinct event_ids


def test_stateful_running_totals_equal_batch_agg(spark, batch_events):
    from dfsql_spark.streaming.events import run_to_memory, running_totals_stateful

    out = run_to_memory(
        running_totals_stateful(_stream(spark)),
        spark,
        f"t_{uuid.uuid4().hex[:8]}",
        output_mode="update",
    )
    # final state per user (max n_events row)
    final = {
        (r.user_id, r.n_events, r.total_value)
        for r in out.orderBy(F.col("n_events").desc())
        .dropDuplicates(["user_id"])
        .collect()
    }
    batch = {
        (r.user_id, r.n, r.tv)
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
        )
        .collect()
    }
    assert final == batch


def test_stream_interval_join_equals_batch(spark, batch_events):
    from dfsql_spark.streaming.events import (
        interval_join_batch,
        read_events_stream,
        run_to_memory,
        stream_interval_join,
    )

    batch = interval_join_batch(batch_events).toPandas()
    import uuid
    streamed = run_to_memory(
        stream_interval_join(read_events_stream(spark, SF_DIR)),
        spark, f"tij_{uuid.uuid4().hex[:8]}", output_mode="append",
    ).toPandas()
    key = ["click_id", "view_id"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = streamed.sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) and len(b) > 0
    assert (b[key].values == s[key].values).all()


def test_stream_reads_directory_shaped_events(spark, tmp_path):
    """Spark-written replicas store events.parquet as a DIRECTORY of
    part files (scripts/make_scale_data.py).  The stream must detect
    that and read the parts — a leaf-name pathGlobFilter would silently
    stream zero rows (ADVICE r4)."""
    from dfsql_spark.streaming.events import read_events_stream, run_to_memory

    src = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    replica_dir = str(tmp_path / "replica")
    src.write.parquet(f"{replica_dir}/events.parquet")
    out = run_to_memory(
        read_events_stream(spark, replica_dir),
        spark,
        f"dirshape_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    assert out.count() == 200


def test_with_event_time_rejects_unexpected_ts_type(spark):
    """An int32/double ts cast to timestamp would be read as epoch
    SECONDS (10^9 shift) — the reader must refuse instead (ADVICE r4)."""
    from dfsql_spark.streaming.events import _with_event_time

    df = spark.range(3).selectExpr("CAST(id AS INT) AS ts")
    with pytest.raises(TypeError, match="unsupported type"):
        _with_event_time(df)


def test_funnel_counts_vs_duckdb(spark, duck):
    """Ordered funnel (view -> click -> purchase, each strictly after
    the user's previous step) graded against a DuckDB recomputation."""
    from dfsql_spark.streaming.events import funnel_counts

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        (r.step_idx, r.step): r.n_users
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    want = duck.sql("""
        WITH v AS (SELECT user_id, min(ts) t FROM events
                   WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) t FROM events e
              JOIN v ON e.user_id = v.user_id AND e.ts > v.t
              WHERE event_type = 'click' GROUP BY 1),
        p AS (SELECT e.user_id, min(e.ts) t FROM events e
              JOIN c ON e.user_id = c.user_id AND e.ts > c.t
              WHERE event_type = 'purchase' GROUP BY 1)
        SELECT (SELECT count(*) FROM v), (SELECT count(*) FROM c),
               (SELECT count(*) FROM p)
    """).fetchone()
    assert got[(0, "view")] == want[0]
    assert got[(1, "click")] == want[1]
    assert got[(2, "purchase")] == want[2]
    assert want[0] >= want[1] >= want[2] > 0  # funnel monotone, non-trivial
    with pytest.raises(ValueError, match="steps"):
        funnel_counts(ev, [])


def test_retention_cohorts_vs_duckdb(spark, duck):
    """Weekly cohort retention graded against DuckDB (Monday-start
    week truncation agrees between engines)."""
    from dfsql_spark.streaming.events import retention_cohorts

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    want = {
        (str(r[0]), r[1]): r[2]
        for r in duck.sql("""
            WITH first AS (
                SELECT user_id,
                       CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
                FROM events GROUP BY user_id
            ),
            active AS (
                SELECT DISTINCT user_id,
                       CAST(date_trunc('week', ts) AS DATE) AS week
                FROM events
            )
            SELECT cohort_week,
                   CAST(date_diff('day', cohort_week, week) / 7 AS INT)
                       AS week_offset,
                   count(*) AS n_users
            FROM active JOIN first USING (user_id)
            GROUP BY 1, 2
        """).fetchall()
    }
    assert got == want
    # offset-0 row exists for every cohort (a user is active in their
    # own first week by construction)
    assert all((cw, 0) in got for (cw, off) in got)


def test_curation_maps_run_unchanged_on_streams(spark, tmp_path):
    """The unified-engine claim for the curation operators: the
    pure-map text operators (quality_score, pii_scrub, c4_filters,
    text_stats) accept a STREAMING DataFrame unchanged — same
    functions, same columns — and the streamed result equals the
    batch result row-for-row.  This is the 'online curation' path: a
    crawler appends parquet files, the same quality/PII/filter maps
    run incrementally."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from dfsql_spark.streaming.events import run_to_memory
    from dfsql_spark.operators.text import (
        c4_filters,
        char_entropy,
        compression_ratio,
        normalize_nfc,
        pii_scrub,
        quality_score,
    )

    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # streaming file sources watch a DIRECTORY (the crawler-append
    # shape); stage the table as one
    src = tmp_path / "docs_stream"
    src.mkdir()
    import shutil

    shutil.copy(f"{sf_dir}/documents.parquet", src / "part-0.parquet")
    stream_docs = spark.readStream.schema(schema).parquet(str(src))

    for name, op in [
        ("q", quality_score),
        ("p", pii_scrub),
        ("c", lambda d: c4_filters(d, min_words=10)),
        ("e", char_entropy),
        ("z", compression_ratio),
        ("n", normalize_nfc),
    ]:
        streamed = run_to_memory(
            op(stream_docs), spark, f"curation_{name}", output_mode="append"
        )
        want = sorted(map(tuple, op(batch_docs).collect()))
        got = sorted(map(tuple, streamed.collect()))
        assert got == want, name


def test_quality_gates_run_unchanged_on_a_stream(spark, tmp_path):
    """The crawl front-end gates (round-9 library ops) are pure
    codegen expressions, so the SAME functions run on a Structured
    Streaming source unchanged — batch/stream unification — and emit
    exactly the batch result."""
    import pandas as pd

    from dfsql_spark.operators.text import (
        blocklist_filter,
        gopher_filters,
        script_fractions,
    )
    from dfsql_spark.streaming.events import run_to_memory

    src = str(tmp_path / "docs")
    pdf = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                ("the quick brown fox jumps over the lazy dog " * 3)
                if i % 3
                else "# # # bad symbol soup #"
                for i in range(30)
            ],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    def gates(df):
        return script_fractions(
            gopher_filters(
                blocklist_filter(df, ["zzz_none"], append=True),
                min_words=10,
                min_stopword_hits=1,
                append=True,
            ),
            append=True,
        ).select("doc_id", "keep_gopher", "keep_blocklist", "script")

    stream = spark.readStream.schema(
        "doc_id bigint, text string"
    ).parquet(src)
    streamed = run_to_memory(
        gates(stream), spark, "gates_stream", output_mode="append"
    )
    got = sorted(tuple(r) for r in streamed.collect())
    want = sorted(
        tuple(r) for r in gates(spark.read.parquet(src)).collect()
    )
    assert got == want and len(got) == 30
    assert {r[1] for r in got} == {True, False}  # both gate outcomes


def test_stateless_signal_ops_apply_to_streams(spark, tmp_path):
    """The per-row signal operators are engine-agnostic maps: applied
    to a file-source STREAM of documents they produce exactly the
    batch results (append mode, no state, no watermark needed) — the
    ingestion-time filter shape for a streaming curation pipeline."""
    import pandas as pd

    from dfsql_spark.operators.text import encoding_signals
    from dfsql_spark.streaming.events import run_to_memory

    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "clean text", "also clean", None, "",
                "bad \x00 byte", "mojibake " + chr(0xFFFD),
            ],
        }
    )
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    assert stream.isStreaming

    streamed = run_to_memory(
        encoding_signals(stream), spark, "enc_stream", output_mode="append"
    )
    batch = encoding_signals(spark.read.parquet(src))
    got = {r.doc_id: (r.keep, r.has_null_byte) for r in streamed.collect()}
    want = {r.doc_id: (r.keep, r.has_null_byte) for r in batch.collect()}
    assert got == want and len(got) == 6


def test_foreach_batch_drift_monitor_equals_batch(spark, batch_events):
    """The monitoring leg as a STREAM: distribution_drift runs inside
    a foreachBatch sink against a fixed reference snapshot, and the
    accumulated per-batch results, re-aggregated over the union of
    batch inputs, must equal the one-shot batch drift over the whole
    stream — the stream-equals-batch invariant extended to the
    round-13 PSI operator.  (Each micro-batch ALSO yields a valid
    drift row per column — the per-batch monitor a production
    pipeline would alert on.)"""
    from dfsql_spark.operators.versioning import distribution_drift
    from dfsql_spark.streaming.sinks import run_foreach_batch

    reference = batch_events.select("event_type", "value").cache()
    reference.count()

    seen_parts = []
    per_batch_rows = []

    def monitor(batch_df, batch_id):
        pdf = batch_df.select("event_type", "value").toPandas()
        if not len(pdf):
            return
        seen_parts.append(pdf)
        got = distribution_drift(
            reference,
            batch_df.sparkSession.createDataFrame(pdf),
            numeric_cols=["value"],
            categorical_cols=["event_type"],
            bins=5,
            top_k=3,
        ).collect()
        per_batch_rows.append({r.column: r.psi for r in got})

    run_foreach_batch(_stream(spark), monitor, output_mode="append")

    assert per_batch_rows, "stream produced no batches"
    for rows in per_batch_rows:
        assert set(rows) == {"value", "event_type"}
        assert all(v is not None and v >= 0.0 for v in rows.values())

    # union of everything the stream delivered == the batch corpus
    import pandas as pd

    union = pd.concat(seen_parts, ignore_index=True)
    assert len(union) == batch_events.count()
    whole = {
        r.column: r.psi
        for r in distribution_drift(
            reference,
            spark.createDataFrame(union),
            numeric_cols=["value"],
            categorical_cols=["event_type"],
            bins=5,
            top_k=3,
        ).collect()
    }
    # self-drift of the full corpus against itself: PSI == 0 exactly
    assert whole == {"value": 0.0, "event_type": 0.0}
    reference.unpersist()
