"""Streaming top-k via foreachBatch upsert (update-mode ranking).

Window aggregations stream natively, but a RANKING over them does not
(no windowed row_number in update mode) — the standard pattern is:
aggregate in the stream, then upsert the per-(window, event_type)
counts into a serving store inside ``foreachBatch`` and re-rank the
affected windows there.

Output mode is ``update``: each micro-batch emits only the (window,
event_type) rows whose count changed, and the declared watermark
actually evicts expired windows from Spark state (in ``complete`` mode
it would not — state and per-batch output would grow with total window
count forever). The serving store keeps raw counts per window so it
can re-rank from changed rows alone; ``prune_store`` drops windows the
caller knows are final, mirroring the watermark eviction on the
serving side.

Two sinks, same stream:

* `streaming_topk_event_types` — in-memory dict store. TEST/DEV ONLY:
  `_upsert` collects each micro-batch to the driver and keeps the whole
  serving state in driver memory. Bounded per batch by update-mode, but
  not a production shape.
* `streaming_topk_to_parquet` — the production shape: foreachBatch
  MERGEs changed rows into a parquet store partitioned by hour
  (read-affected-partitions → anti-join → union → dynamic partition
  overwrite rewrites only those partitions, executor-side, no driver
  materialization). On a Delta/Iceberg table the same callback is a
  one-statement MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

TOP_K = 3

# window_start -> {event_type: n_events} — raw counts, the upsert target.
_COUNT_STORE: dict[str, dict[str, int]] = {}


def clear_store() -> None:
    _COUNT_STORE.clear()


def snapshot_store() -> dict[str, list[tuple[str, int]]]:
    """Top-k view over the maintained counts (what a serving query reads)."""
    return {
        hour: sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        for hour, counts in _COUNT_STORE.items()
    }


def prune_store(before_hour: str) -> None:
    """Drop windows that start before `before_hour` ("yyyy-MM-dd HH:mm:ss").

    Serving-side twin of the watermark: once a window can no longer
    receive updates, its counts are dead weight. Lexicographic compare
    is chronological for this timestamp format.
    """
    for hour in [h for h in _COUNT_STORE if h < before_hour]:
        del _COUNT_STORE[hour]


def _upsert(batch_df: DataFrame, batch_id: int) -> None:
    # Update mode: only changed (hour, event_type) rows arrive — bounded
    # by the batch's own update footprint, not total history. The
    # collect() makes this sink TEST/DEV ONLY (driver-side store);
    # `parquet_merge_sink` below is the distributed equivalent.
    for r in batch_df.collect():
        _COUNT_STORE.setdefault(r.hour, {})[r.event_type] = r.n_events


def parquet_merge_sink(store_path: str):
    """foreachBatch callback that MERGEs changed (hour, event_type,
    n_events) rows into a parquet store partitioned by hour.

    MERGE via dynamic partition overwrite: keep the affected hours'
    rows that the batch did NOT change (anti-join), union the batch
    rows, rewrite ONLY those hour partitions (untouched hours' files
    are left in place). Everything runs executor-side; the
    localCheckpoint materializes the merged rows BEFORE the overwrite
    deletes the files they were read from. Sets
    partitionOverwriteMode=dynamic on the session (session-wide, like
    any sink that needs it)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # Partition-column type inference reads `hour` back as a
            # timestamp; normalize to the canonical string so joins and
            # the union against the batch rows stay type-stable.
            existing = spark.read.parquet(store_path).withColumn(
                "hour", F.date_format("hour", "yyyy-MM-dd HH:mm:ss")
            )
            keep = existing.join(
                batch_df.select("hour").distinct(), "hour", "left_semi"
            ).join(batch_df.select("hour", "event_type"), ["hour", "event_type"], "left_anti")
            merged = keep.unionByName(batch_df).localCheckpoint()
        except AnalysisException:  # first batch: store doesn't exist yet
            merged = batch_df
        merged.write.mode("overwrite").partitionBy("hour").parquet(store_path)

    return _merge


def topk_from_store(spark: SparkSession, store_path: str, k: int = TOP_K) -> DataFrame:
    """Serving query over the parquet store: per-hour top-k event types
    (partition-local window, prunes to requested hours if filtered)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("hour").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        spark.read.parquet(store_path)
        .withColumn("hour", F.date_format("hour", "yyyy-MM-dd HH:mm:ss"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def _hourly_counts(events: DataFrame, watermark: str) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
        )
    )


def streaming_topk_event_types(events: DataFrame, watermark: str = "2 hours"):
    """Returns a started StreamingQuery maintaining the per-hour top-k
    event types in the in-memory serving store (TEST/DEV sink — see
    module docstring). Caller awaits termination."""
    return (
        _hourly_counts(events, watermark)
        .writeStream.foreachBatch(_upsert)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def streaming_topk_to_parquet(
    events: DataFrame, store_path: str, watermark: str = "2 hours"
):
    """Same stream, production-shaped sink: MERGE changed rows into a
    parquet store partitioned by hour; serve with `topk_from_store`.
    Returns a started StreamingQuery; caller awaits termination."""
    return (
        _hourly_counts(events, watermark)
        .writeStream.foreachBatch(parquet_merge_sink(store_path))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
