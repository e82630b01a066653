"""Grouped-map pandas operator (`applyInPandas`): per-user behavioral
features over the event history — the per-group imperative shape that
DataFrame algebra can't express cleanly when the per-group logic grows
(here it is deliberately simple enough to ALSO be SQL-expressible, so
the operator keeps a DuckDB oracle; a real feature pipeline swaps the
body for arbitrary Python).

Scale: groups hash-shuffle by user_id; each Arrow batch holds whole
groups — state is bounded by the largest single user's history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, n_types LONG, "
    "mean_gap_us DOUBLE, max_gap_us LONG, total_value DOUBLE"
)


def _features(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
    gaps = ts_us.diff().dropna()
    # value summed via exact cents (int64) — float summation order in
    # pandas is not cross-engine stable, integers are.
    total_cents = int((pdf["value"] * 100).round().astype("int64").sum())
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "n_types": [pdf["event_type"].nunique()],
            "mean_gap_us": [float(gaps.sum()) / len(gaps) if len(gaps) else None],
            "max_gap_us": [int(gaps.max()) if len(gaps) else None],
            "total_value": [total_cents / 100.0],
        }
    )


def user_behavior_features(events: DataFrame) -> DataFrame:
    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandas(_features, OUTPUT_SCHEMA)
    )


BEHAVIOR_ORACLE = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT e.user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.event_type) AS n_types,
       (SELECT CAST(SUM(gap) AS DOUBLE) / COUNT(gap) FROM g
         WHERE g.user_id = e.user_id AND gap IS NOT NULL) AS mean_gap_us,
       (SELECT MAX(gap) FROM g WHERE g.user_id = e.user_id) AS max_gap_us,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events e
GROUP BY e.user_id
"""
