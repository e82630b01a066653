"""Stream-stream event-time join: click→purchase attribution within a
time window (the interval-join shape; batch twin =
queries/relational.py::events_click_attribution, which the driver
oracle-checks).

Watermarks on BOTH sides bound the join state: a click older than the
watermark horizon can no longer match any future purchase and is
evicted. The range condition gives Spark the state-cleanup bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW_MIN = 30


def click_purchase_attribution(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Pairs each purchase with every click by the same user in the
    preceding ATTRIBUTION_WINDOW_MIN minutes."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
