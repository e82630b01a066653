"""Interval (range) join and time-dimension rollup over the event
stream — the time-series operators a hypertable-style engine exposes.

Scale design:
  * The range join is BUCKETIZED: a time-window predicate
    (0 < t_click - t_err <= W) never runs as a raw inequality join
    (Spark would fall back to broadcast-nested-loop). Instead each
    probe-side row is expanded to the <= 2 W-sized buckets its window
    can touch, both sides shuffle on the (user_id, bucket) equi-key,
    and the range predicate applies as a residual filter. Per-key
    fan-out is bounded by per-user-per-window event density, not
    corpus size; each matching pair appears exactly once because a
    click lives in exactly one bucket.
  * The rollup computes all grains in ONE pass (partial aggregation
    per grouping set, map-side combined) — the continuous-aggregate
    shape: never one scan per grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apd_map_reduce_spark.queries.base import QueryDef, as_double, dec2
from apd_map_reduce_spark.sources.tables import load_table

WINDOW_US = 300_000_000  # 5 minutes, microseconds


def error_click_window(events: DataFrame, window_us: int = WINDOW_US) -> DataFrame:
    """Per error event: clicks by the same user within the next
    `window_us` microseconds — (event_id, user_id, n_clicks_5m,
    min_gap_us). Errors with no follow-up click keep n_clicks_5m = 0
    and a NULL min_gap_us (the LEFT join preserves them)."""
    base = events.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    errors = base.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "us"
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("us").alias("c_us"),
        F.col("event_id").alias("click_id"),
        F.expr(f"us div {window_us}").alias("c_bucket"),
    )
    # An error's (us, us + W] window spans at most 2 W-buckets.
    probe = errors.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.expr(f"us div {window_us}"),
                F.expr(f"us div {window_us} + 1"),
            )
        ),
    )
    joined = probe.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("bucket") == F.col("c_bucket"))
        & (F.col("c_us") > F.col("us"))
        & (F.col("c_us") <= F.col("us") + F.lit(window_us)),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("click_id").alias("n_clicks_5m"),
        F.min(F.col("c_us") - F.col("us")).alias("min_gap_us"),
    )


_ERROR_CLICK_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
),
errors AS (SELECT event_id, user_id, us FROM ev WHERE event_type = 'error'),
clicks AS (SELECT event_id AS click_id, user_id, us FROM ev WHERE event_type = 'click')
SELECT e.event_id, e.user_id,
       COUNT(c.click_id) AS n_clicks_5m,
       MIN(c.us - e.us) AS min_gap_us
FROM errors e
LEFT JOIN clicks c
  ON c.user_id = e.user_id
 AND c.us > e.us AND c.us <= e.us + {WINDOW_US}
GROUP BY e.event_id, e.user_id
"""


def events_time_rollup(events: DataFrame) -> DataFrame:
    """Hour/day/grand-total event rollup in one pass:
    ROLLUP(day, hour) -> {(day, hour), (day), ()} with counts and
    exact-decimal value sums (the continuous-aggregate grains)."""
    keyed = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("int").alias("hour"),
        "value",
    )
    return keyed.rollup("day", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        as_double(F.sum(dec2("value"))).alias("total_value"),
    )


_TIME_ROLLUP_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(hour(ts) AS INT) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP(day, hour)
"""


DECAY_CAP_DAYS = 30  # ages beyond the cap share the smallest weight


def decayed_user_totals(events: DataFrame, cap_days: int = DECAY_CAP_DAYS) -> DataFrame:
    """Exponentially time-decayed engagement per user: each event's
    value is weighted by 2^(-age_days) with a 1-day half-life, ages
    measured back from the newest event in the table and capped at
    `cap_days`.

    Determinism: weights are powers of two, so the whole sum is EXACT
    integer arithmetic — contribution = cents * 2^(cap - age), summed
    as DECIMAL(38,0), divided once by 2^cap * 100 at the end (a single
    scalar double op). No float rounding boundary exists anywhere.

    Scale: one pass; the reference timestamp is a 1-row broadcast
    (scalar subquery), the aggregation is a keyed groupBy(user_id) with
    map-side partial sums. The decay weighting adds zero shuffles."""
    anchor = events.agg(F.max(F.unix_micros("ts")).alias("max_us"))
    cents = F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
    aged = (
        events.select("user_id", F.unix_micros("ts").alias("us"), cents.alias("cents"))
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "cents",
            F.least(
                F.expr("(max_us - us) div 86400000000"), F.lit(cap_days)
            ).alias("age_days"),
        )
    )
    # cents * 2^k fits comfortably in int64 (<= ~1e14); the SUM is the
    # part that can grow, so it runs in DECIMAL(38,0) (HUGEINT-backed
    # SUM(BIGINT) on the DuckDB side) — exact on both engines.
    contrib = F.expr(
        f"CAST(cents * CAST(pow(2, {cap_days} - age_days) AS BIGINT)"
        " AS DECIMAL(38,0))"
    )
    denom = float((2**cap_days) * 100)
    return (
        aged.groupBy("user_id")
        .agg(F.sum(contrib).alias("num"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            (F.col("num").cast("double") / F.lit(denom)).alias("decayed_value"),
        )
    )


_DECAYED_ORACLE = f"""
WITH anchor AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
aged AS (
  SELECT user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         LEAST((a.max_us - epoch_us(ts)) // 86400000000, {DECAY_CAP_DAYS}) AS age_days
  FROM events, anchor a
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(cents * CAST(2 ** ({DECAY_CAP_DAYS} - age_days) AS BIGINT)) AS DOUBLE)
         / {float((2 ** DECAY_CAP_DAYS) * 100)} AS decayed_value
FROM aged
GROUP BY user_id
"""


WAU_WINDOW_DAYS = 7


def rolling_distinct_users(events: DataFrame, window_days: int = WAU_WINDOW_DAYS) -> DataFrame:
    """Trailing-N-day distinct users per calendar day ("rolling WAU"):
    for each day with any activity, how many distinct users appeared in
    the last `window_days` days (inclusive).

    Sliding COUNT(DISTINCT) can't be an ordinary window aggregate, and
    the naive day-vs-history join is quadratic. Instead each distinct
    (user, active_day) observation is expanded to the exactly
    `window_days` report days it can contribute to — a CONSTANT fan-out
    — then distinct + keyed count. Two shuffles total, both on uniform
    (user, day) keys, at any corpus size."""
    ud = events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("day_d"),
    ).distinct()
    days = events.select(F.to_date("ts").alias("day_d")).distinct()
    return (
        expanded.join(days, "day_d")
        .groupBy("day_d")
        .agg(F.count(F.lit(1)).alias("rolling_users"))
        .select(
            F.date_format("day_d", "yyyy-MM-dd").alias("day"), "rolling_users"
        )
    )


_ROLLING_WAU_ORACLE = f"""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
expanded AS (
  SELECT DISTINCT user_id,
         CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                       CAST(d AS TIMESTAMP) + INTERVAL {WAU_WINDOW_DAYS - 1} DAY,
                       INTERVAL 1 DAY)) AS DATE) AS day_d
  FROM ud
),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day_d FROM events)
SELECT strftime(e.day_d, '%Y-%m-%d') AS day, COUNT(*) AS rolling_users
FROM expanded e JOIN days USING (day_d)
GROUP BY 1
"""


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: (from_type, to_type, n_transitions, p_e6) where p_e6 is
    the row-normalized transition probability as a fixed-point integer
    ``(n * 1e6) div row_total`` — engine-exact, no float boundary.

    Ordering within a user is (ts, event_id): the event_id tie-break
    makes the sequence — and therefore every count — deterministic even
    when two events share a timestamp.

    Scale: one window pass partitioned by user (bounded per-user state)
    and one |types|²-bounded aggregation. No self-join on the stream."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NULL-ts events have no sequence position and a NULL event_type is
    # not a state: both excluded, here and in the oracle.
    pairs = (
        events.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr(
            "(n_transitions * 1000000) div sum(n_transitions)"
            " over (partition by from_type)"
        ).alias("p_e6"),
    )


_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
counts AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n_transitions
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       (n_transitions * 1000000)
         // CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT) AS p_e6
FROM counts
"""


def lateness_audit(events: DataFrame) -> DataFrame:
    """Watermark-sizing audit: how out-of-order is each event type's
    stream? Lateness of an event = how far its event-time trails the
    maximum event-time already seen on the same key's arrival order
    (event_id = ingestion sequence). This is THE statistic you read
    before choosing `withWatermark` delays — p95/max lateness bound the
    state-retention window the streaming operators need.

    Determinism: lateness is computed in exact integer microseconds
    (unix_micros / epoch_us), reported in whole seconds by integer
    division; percentiles are DISCRETE (actual data values), so both
    engines agree bit-for-bit.

    Scale: the running max is a per-user_id window (keyed, bounded
    partitions) — never a global single-partition ordering; the rollup
    is one low-cardinality groupBy. On a real ingest you'd key by the
    source shard instead of user_id; the shape is identical.

    The synthetic corpus is ingested perfectly in event-time order
    (event_id monotone in ts), under which every lateness statistic is
    a degenerate 0 — so the audit is exercised against a DETERMINISTIC
    delayed-arrival permutation: every event_id ≡ 7 (mod 10) arrives
    997 sequence positions late (a fixed 10% straggler model, the
    disorder shape a lagging ingest shard produces). On real data,
    replace arrival_key with the actual ingest sequence."""
    arrival_key = F.col("event_id") + F.when(
        F.col("event_id") % 10 == 7, F.lit(997)
    ).otherwise(F.lit(0))
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_key", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = events.withColumn("arrival_key", arrival_key).select(
        "event_type",
        (
            (F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
            .cast("long")
            .alias("late_us")
        ),
    ).withColumn(
        # integer `div`, never double-divide-then-cast: the oracle
        # floor-divides in exact integers (DETERMINISM.md rule 9).
        "late_s",
        F.expr("late_us div 1000000"),
    )
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).cast("long").alias("n_late"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY late_s)")
        .cast("long")
        .alias("p50_late_s"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY late_s)")
        .cast("long")
        .alias("p95_late_s"),
        F.max("late_s").alias("max_late_s"),
    )


_LATENESS_ORACLE = """
WITH a AS (
  SELECT *, event_id + (CASE WHEN event_id % 10 = 7 THEN 997 ELSE 0 END) AS arrival_key
  FROM events
),
l AS (
  SELECT event_type,
         (MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY arrival_key, event_id
                                  ROWS UNBOUNDED PRECEDING)
          - epoch_us(ts))::BIGINT AS late_us
  FROM a
),
s AS (SELECT event_type, late_us, (late_us // 1000000)::BIGINT AS late_s FROM l)
SELECT event_type, COUNT(*) AS n_events,
       SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
       quantile_disc(late_s, 0.5)::BIGINT AS p50_late_s,
       quantile_disc(late_s, 0.95)::BIGINT AS p95_late_s,
       MAX(late_s)::BIGINT AS max_late_s
FROM s
GROUP BY event_type
"""


INTERVAL_QUERIES = [
    QueryDef(
        "events_lateness_audit",
        lambda s, d: lateness_audit(load_table(s, d, "events")),
        _LATENESS_ORACLE,
    ),
    QueryDef(
        "events_error_click_window",
        lambda s, d: error_click_window(load_table(s, d, "events")),
        _ERROR_CLICK_ORACLE,
    ),
    QueryDef(
        "events_time_rollup",
        lambda s, d: events_time_rollup(load_table(s, d, "events")),
        _TIME_ROLLUP_ORACLE,
    ),
    QueryDef(
        "events_decayed_totals",
        lambda s, d: decayed_user_totals(load_table(s, d, "events")),
        _DECAYED_ORACLE,
    ),
    QueryDef(
        "events_markov_transitions",
        lambda s, d: markov_transitions(load_table(s, d, "events")),
        _MARKOV_ORACLE,
    ),
    QueryDef(
        "events_rolling_wau",
        lambda s, d: rolling_distinct_users(load_table(s, d, "events")),
        _ROLLING_WAU_ORACLE,
    ),
]
