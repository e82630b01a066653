"""Custom stateful streaming operator on the transformWithState API —
Spark 4's typed-state successor to ``applyInPandasWithState`` (which
``streaming/sessions.py`` demonstrates): state is a named, schema-typed
handle (ValueState/ListState/MapState) owned by the state store rather
than an opaque per-group blob, and processors can register timers.

Operator: per-user running event totals. Every micro-batch updates one
ValueState per user and emits the user's NEW running totals (update
semantics — downstream sinks MERGE on user_id). Money is accumulated in
integer cents (floor(value*100 + 0.5)), so the running total is exact
and order-free — bit-identical to the batch twin however Spark splits
the stream into micro-batches.

Scale posture: state is keyed by user_id and partitioned by the shuffle,
one small fixed-size row per user; the per-batch work is proportional to
the batch's distinct users, not the accumulated history.

RUNTIME DEPENDENCY: the transformWithState Python worker imports
google.protobuf (pyspark.sql.streaming.proto.StateMessage_pb2). In
environments without protobuf the operator compiles but fails at
execution — tests/test_streaming_stateful.py skips there. The
container-executable custom-stateful path is applyInPandasWithState
(streaming/sessions.py); this module is the forward-looking twin on
the typed-state API.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("cents", LongType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("cents", LongType()),
    ]
)


class RunningUserTotals(StatefulProcessor):
    """ValueState[(n_events, cents)] per user; emits the updated totals
    for every user seen in the micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = (0, 0)
        if self._totals.exists():
            prev = self._totals.get()
            n, cents = int(prev[0]), int(prev[1])
        for pdf in rows:
            n += len(pdf)
            # floor(v*100 + 0.5): same cents rule as operators/behavior.py,
            # summed in int64 — exact regardless of row order. np.floor
            # (not int-cast truncation) so the rule holds for any sign.
            import numpy as np

            cents += int(np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64").sum())
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """events stream -> update-mode stream of (user_id, n_events, cents)
    running totals."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin: what the stream's state must equal after draining."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents"),
    )
