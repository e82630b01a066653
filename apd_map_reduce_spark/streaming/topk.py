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

Here the sink is an in-memory dict keyed by window (tests + local dev);
swap `_upsert` for a JDBC/Delta MERGE at scale — foreachBatch hands you
the same micro-batch DataFrame either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    # by the batch's own update footprint, not total history.
    for r in batch_df.collect():
        _COUNT_STORE.setdefault(r.hour, {})[r.event_type] = r.n_events


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
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
