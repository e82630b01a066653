"""Stream-stream interval join == batch range join."""

from __future__ import annotations

import os
import shutil

from apd_map_reduce_spark.queries.relational import events_click_attribution
from apd_map_reduce_spark.streaming.joins import click_purchase_attribution
from apd_map_reduce_spark.streaming.windows import (
    events_stream_schema,
    read_events_stream,
)

from .conftest import SF_SMOKE


def test_stream_join_matches_batch(spark, tmp_path):
    d = str(tmp_path / "ev")
    os.makedirs(d)
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), os.path.join(d, "events.parquet"))
    stream = read_events_stream(
        spark, d, events_stream_schema(spark, os.path.join(d, "events.parquet"))
    )
    joined = click_purchase_attribution(stream)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("attribution")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_us)
        for r in spark.table("attribution").collect()
    }
    want = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_us)
        for r in events_click_attribution(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert len(got) > 0
