"""Streaming top-k via foreachBatch upsert (update-mode ranking).

Window aggregations stream natively, but a RANKING over them does not
(no windowed row_number in update mode) — the standard pattern is:
aggregate in the stream, then re-rank the maintained aggregate inside
``foreachBatch`` and upsert the k winners into the serving sink.

Here the sink is an in-memory dict keyed by window (tests + local dev);
swap `_upsert` for a JDBC/Delta MERGE at scale — foreachBatch hands you
the same micro-batch DataFrame either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOP_K = 3

# window_start -> list[(event_type, n_events)] — the "serving store"
_SERVING_STORE: dict[str, list[tuple[str, int]]] = {}


def clear_store() -> None:
    _SERVING_STORE.clear()


def snapshot_store() -> dict[str, list[tuple[str, int]]]:
    return dict(_SERVING_STORE)


def _upsert(batch_df: DataFrame, batch_id: int) -> None:
    w = Window.partitionBy("hour").orderBy(F.desc("n_events"), F.asc("event_type"))
    ranked = (
        batch_df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .collect()
    )
    by_window: dict[str, list[tuple[str, int]]] = {}
    for r in ranked:
        by_window.setdefault(r.hour, []).append((r.event_type, r.n_events))
    _SERVING_STORE.update(by_window)


def streaming_topk_event_types(events: DataFrame, watermark: str = "2 hours"):
    """Returns a started StreamingQuery maintaining the per-hour top-k
    event types in the serving store. Caller awaits termination."""
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
        )
    )
    return (
        agg.writeStream.foreachBatch(_upsert)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
