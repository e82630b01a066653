"""Stream-static enrichment: a streaming fact joined to a static
dimension at ingest — the standard "attach the dimension attributes
before landing" shape. The static side is broadcast per micro-batch
(re-resolved each trigger, so slowly-changing dims pick up updates on
the next batch without restarting the query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events_with_users(events_stream: DataFrame, customer_dim: DataFrame) -> DataFrame:
    """events(user_id→c_custkey) ⋈ customer: attach segment + balance
    tier. Unmatched users keep the event with nulls (left join — ingest
    must not drop facts because the dim lags)."""
    dim = customer_dim.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") >= 5000, "high")
        .when(F.col("c_acctbal") >= 0, "mid")
        .otherwise("negative")
        .alias("balance_tier"),
    )
    return events_stream.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", "event_type", "ts", "value", "segment", "balance_tier"
    )
