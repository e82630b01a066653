"""Streaming parity tests: availableNow file stream vs batch results."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from apd_map_reduce_spark.queries.relational import events_hourly
from apd_map_reduce_spark.streaming.sessions import sessionize_stream
from apd_map_reduce_spark.streaming.windows import (
    events_stream_schema,
    hourly_event_counts,
    read_events_stream,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), d / "events.parquet")
    return str(d)


def test_hourly_counts_stream_matches_batch(spark, events_stream_dir):
    schema = events_stream_schema(spark, os.path.join(events_stream_dir, "events.parquet"))
    stream = read_events_stream(spark, events_stream_dir, schema)
    assert stream.isStreaming
    agg = hourly_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("hourly_stream").collect()
    }
    expected = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in events_hourly(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_streaming_observed_metrics(spark, events_stream_dir):
    """plans/observe.observed works on a STREAM too: per-trigger
    metrics surface in StreamingQueryProgress.observedMetrics — the
    zero-extra-pass accounting story for live ingestion (no second
    aggregation query, no foreachBatch counting)."""
    from apd_map_reduce_spark.plans.observe import observed_stream

    schema = events_stream_schema(
        spark, os.path.join(events_stream_dir, "events.parquet")
    )
    stream = read_events_stream(spark, events_stream_dir, schema)
    stream = observed_stream(
        stream,
        "ingest",
        n_events=F.count(F.lit(1)),
        n_errors=F.count(F.when(F.col("event_type") == "error", 1)),
    )
    q = (
        stream.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(events_stream_dir, "obs_ckpt"))
        .start()
    )
    q.awaitTermination()
    got = None
    for p in q.recentProgress:
        m = p["observedMetrics"].get("ingest") if p["observedMetrics"] else None
        if m:
            got = (m["n_events"], m["n_errors"])
    batch = spark.read.parquet(os.path.join(events_stream_dir, "events.parquet"))
    exp = (
        batch.count(),
        batch.filter(F.col("event_type") == "error").count(),
    )
    assert got == exp


def test_stateful_sessionize_stream(spark, events_stream_dir):
    """applyInPandasWithState emits sessions; with a single availableNow
    batch only sessions closed WITHIN the batch appear (the last session
    per user stays in state) — assert against the batch twin."""
    schema = events_stream_schema(spark, os.path.join(events_stream_dir, "events.parquet"))
    stream = read_events_stream(spark, events_stream_dir, schema)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sessions_stream")
    n_stream = got.count()
    assert n_stream > 0

    from apd_map_reduce_spark.queries.relational import events_sessionize

    batch = events_sessionize(spark, SF_SMOKE)
    per_user_batch = batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    per_user_stream = got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    b = {r.user_id: r.n for r in per_user_batch.collect()}
    s = {r.user_id: r.n for r in per_user_stream.collect()}
    # stream emits all but the still-open final session per user
    for uid, n in s.items():
        assert n == b[uid] - 1, f"user {uid}: stream {n} vs batch {b[uid]}"

    # session boundaries that were emitted must match the batch twin
    batch_rows = {
        (r.user_id, r.session_start, r.n_events)
        for r in batch.collect()
    }
    stream_rows = {
        (
            r.user_id,
            r.session_start.strftime("%Y-%m-%d %H:%M:%S"),
            r.n_events,
        )
        for r in got.collect()
    }
    assert stream_rows <= batch_rows
