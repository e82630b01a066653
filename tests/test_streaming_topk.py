"""foreachBatch top-k upserts == batch ranking."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apd_map_reduce_spark.queries.relational import events_hourly
from apd_map_reduce_spark.streaming.topk import (
    TOP_K,
    clear_store,
    snapshot_store,
    streaming_topk_event_types,
)
from apd_map_reduce_spark.streaming.windows import (
    events_stream_schema,
    read_events_stream,
)

from .conftest import SF_SMOKE


def test_streaming_topk_matches_batch(spark, tmp_path):
    d = str(tmp_path / "ev")
    os.makedirs(d)
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), os.path.join(d, "events.parquet"))
    stream = read_events_stream(
        spark, d, events_stream_schema(spark, os.path.join(d, "events.parquet"))
    )
    clear_store()
    q = streaming_topk_event_types(stream)
    q.awaitTermination()
    got = snapshot_store()
    assert got

    w = Window.partitionBy("hour").orderBy(F.desc("n_events"), F.asc("event_type"))
    batch = (
        events_hourly(spark, SF_SMOKE)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .collect()
    )
    want: dict[str, list[tuple[str, int]]] = {}
    for r in batch:
        want.setdefault(r.hour, []).append((r.event_type, r.n_events))
    assert got == want
