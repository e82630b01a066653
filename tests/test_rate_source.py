"""Rate-source smoke: the built-in load-generator stream drives the
same windowed aggregation code path as file streams."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_rate_source_windowed_agg(spark):
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 50)
        .load()
        .withColumn("bucket", F.col("value") % 5)
    )
    agg = stream.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_agg")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = spark.table("rate_agg").collect()
            if len(rows) == 5 and sum(r.n for r in rows) >= 50:
                break
            time.sleep(1)
        assert len(rows) == 5, f"expected 5 buckets, got {rows}"
        assert sum(r.n for r in rows) >= 50
    finally:
        q.stop()
