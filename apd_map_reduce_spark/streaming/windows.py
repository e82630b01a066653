"""Structured Streaming analogue of the batch event queries
(SURVEY.md §7.3 v4 — the reference has no streaming; this is the
Spark-native extension over the `events` table).

Batch/stream parity: `hourly_event_counts` over a file stream with
trigger=availableNow must equal `queries/relational.py::events_hourly`
(modulo the watermark dropping nothing on replayed history). The test
suite asserts exactly that.

Scale posture: watermark bounds state; window+event_type keys the state
store; shuffle partitions size the state store parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from apd_map_reduce_spark.queries.base import money


def events_stream_schema(spark: SparkSession, sample_parquet: str) -> StructType:
    """Streaming readers need an explicit schema — infer once from a
    batch footer read (cheap, driver-side). NTZ-micros parquet maps to
    TIMESTAMP_LTZ (same conf posture as sources/tables.py, so batch and
    stream agree on the event-time column type)."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark.read.parquet(sample_parquet).schema


def read_events_stream(
    spark: SparkSession, path: str, schema: StructType, max_files_per_trigger: int = 16
) -> DataFrame:
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if dict(df.dtypes).get("ts") == "bigint":
        # Same nanos→µs normalization as sources/tables.py.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type; late data beyond the
    watermark is dropped (state is bounded by watermark horizon)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(F.col("value").cast("decimal(18,6)"))).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding windows (1h, slide 30m) of distinct-ish user activity:
    approx_count_distinct keeps state O(sketch) instead of O(users)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "approx_users",
            "n_events",
        )
    )


def run_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "append"
) -> None:
    """Drain an availableNow stream into an in-memory sink (test/dev).

    `output_mode` must match the plan: "append" (the default) is the
    only mode valid for non-aggregating streams and for chained
    stateful operators, and it lets the watermark actually evict state;
    pass "complete" explicitly only for a single aggregation you want
    re-emitted in full each batch.

    Append-mode caveat for aggregations: a window is emitted only once
    the final watermark passes it, so under availableNow the TAIL
    windows (those the last watermark hasn't closed) are absent from
    the sink — e.g. draining `hourly_event_counts` in append mode
    yields every hour except the last `watermark` horizon. That is
    correct streaming semantics, not data loss; use "complete" when a
    test needs every window materialized. An unwatermarked aggregation
    cannot run in append mode at all (raises below with a clearer
    message than Spark's AnalysisException).
    """
    if output_mode == "append" and stream_df.isStreaming:
        has_agg = "Aggregate" in stream_df._jdf.queryExecution().logical().toString()
        has_watermark = "EventTimeWatermark" in stream_df._jdf.queryExecution().logical().toString()
        if has_agg and not has_watermark:
            raise ValueError(
                "append-mode drain of a streaming aggregation requires a "
                "watermark (withWatermark before groupBy); without one no "
                "window is ever final and Spark rejects the plan. Pass "
                "output_mode='complete' or add a watermark."
            )
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
