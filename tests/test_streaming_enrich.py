"""Stream-static enrichment == batch left join."""

from __future__ import annotations

import os
import shutil

from apd_map_reduce_spark.sources.tables import load_table
from apd_map_reduce_spark.streaming.enrich import enrich_events_with_users
from apd_map_reduce_spark.streaming.windows import (
    events_stream_schema,
    read_events_stream,
)

from .conftest import SF_SMOKE


def test_stream_enrichment_matches_batch(spark, tmp_path):
    d = str(tmp_path / "ev")
    os.makedirs(d)
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), os.path.join(d, "events.parquet"))
    stream = read_events_stream(
        spark, d, events_stream_schema(spark, os.path.join(d, "events.parquet"))
    )
    dim = load_table(spark, SF_SMOKE, "customer")
    out = enrich_events_with_users(stream, dim)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.event_id, r.segment, r.balance_tier)
        for r in spark.table("enriched").collect()
    }
    batch_events = load_table(spark, SF_SMOKE, "events")
    want = {
        (r.event_id, r.segment, r.balance_tier)
        for r in enrich_events_with_users(batch_events, dim).collect()
    }
    assert got == want
    assert len(got) == batch_events.count(), "left join must not drop facts"
