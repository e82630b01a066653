"""AS-OF join: each event matched to the customer's most recent order
at event time (the task's canonical "operator Spark lacks" example).

Scalable implementation — the union-fill pattern, NOT a per-event
subquery: tag both relations, union, sort within user by (time, tag)
and carry the last non-null order key forward with last_value(...,
ignorenulls). One shuffle (by user), one window pass; no range
cross-product, no per-row probe. DuckDB's native ASOF JOIN is the
oracle.

Determinism: orders are pre-deduped to one per (customer, timestamp)
— max orderkey wins — because as-of tie-breaks at equal timestamps are
otherwise engine-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_last_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """DataFrame[event_id, user_id, o_orderkey?, days_since_order?]."""
    o = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("t"),
            "o_orderkey",
            F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    # A NULL-ts event has no as-of position (and DuckDB's ASOF JOIN
    # treats the NULL probe differently from the union-fill ordering) —
    # excluded in both engines.
    e = events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(1).alias("is_event"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("t"), F.asc("is_event"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = o.unionByName(e).withColumn(
        "last_okey", F.last("o_orderkey", ignorenulls=True).over(w)
    ).withColumn(
        "last_t", F.last(F.when(F.col("is_event") == 0, F.col("t")), ignorenulls=True).over(w)
    )
    return (
        unioned.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("last_okey").alias("o_orderkey"),
            F.round(
                (F.unix_micros("t") - F.unix_micros("last_t")) / F.lit(86400_000_000.0), 6
            ).alias("days_since_order"),
        )
    )


ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate AS t, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey,
       ROUND((epoch_us(e.ts) - epoch_us(o.t)) / 86400000000.0, 6) AS days_since_order
FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.t
"""
