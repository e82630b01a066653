"""transformWithState parity: running per-user totals across multiple
micro-batches must equal the batch aggregation exactly (integer cents).

The transformWithState Python worker needs google.protobuf at RUNTIME
(pyspark.sql.streaming.proto); containers without it can compile the
plan but not execute it — the test skips there and runs for real where
protobuf is present.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf at runtime (not in container)",
)

from apd_map_reduce_spark.sources.tables import load_table
from apd_map_reduce_spark.streaming.stateful import (
    running_user_totals_batch,
    running_user_totals_stream,
)
from apd_map_reduce_spark.streaming.windows import events_stream_schema

from .conftest import SF_SMOKE


def test_running_totals_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    # Two files -> two micro-batches under maxFilesPerTrigger=1, so the
    # ValueState genuinely carries across batches.
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "h0")
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "h1")
    )
    schema = events_stream_schema(
        spark, os.path.join(src, "h0")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    out = running_user_totals_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("running_totals").toPandas()
    assert len(emitted) > 0
    # multiple emissions per user across batches; running totals only
    # grow, so the final state is the max per user
    final = emitted.groupby("user_id")[["n_events", "cents"]].max()
    got = {
        int(uid): (int(r["n_events"]), int(r["cents"]))
        for uid, r in final.iterrows()
    }
    expected = {
        r.user_id: (r.n_events, r.cents)
        for r in running_user_totals_batch(events).collect()
    }
    assert got == expected
