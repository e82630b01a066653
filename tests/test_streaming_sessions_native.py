"""Native session_window in STREAMING mode: the same operator the
batch twin (`events_session_window_builtin`) uses, driven through
Structured Streaming with a watermark. Emitted (closed) sessions must
be a subset of the batch sessions — identical operator, identical
semantics, streaming just withholds sessions the watermark hasn't
closed yet."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _batch_sessions(spark, src):
    e = spark.read.parquet(src)
    return {
        (r.user_id, r.start, r.end, r.n)
        for r in (
            e.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("start"),
                F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("end"),
                "n",
            )
            .collect()
        )
    }


def test_streaming_session_window_subset_of_batch(spark, tmp_path):
    src_dir = str(tmp_path / "events_src")
    # events.ts is TIMESTAMP(NANOS); rewrite through load_table's µs
    # normalization so the stream reads plain µs timestamps.
    from apd_map_reduce_spark.sources.tables import load_table

    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(src_dir)

    batch = _batch_sessions(spark, src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = spark.readStream.schema(schema).parquet(src_dir)
    sessions = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("start"),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("end"),
            "n",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = {
        (r.user_id, r.start, r.end, r.n)
        for r in spark.sql("SELECT * FROM native_sessions").collect()
    }
    assert emitted, "watermark should close most month-old sessions"
    assert emitted <= batch, "streaming emitted a session batch doesn't have"
    # the tail withheld by the watermark is at most one open session/user
    missing = batch - emitted
    users_missing = {m[0] for m in missing}
    assert len(missing) == len(users_missing), "at most one open session per user"
