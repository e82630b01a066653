"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the mandate's "custom stateful operator"
shape; batch twin = queries/relational.py::events_sessionize).

Per user_id, events are folded into sessions that close after
GAP_SECONDS of inactivity; closed sessions are emitted when the state
times out or a new session starts. State per key is four scalars —
bounded regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, n_events LONG"
)
STATE_SCHEMA = "start LONG, last LONG, n LONG"


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_us: list[int] = []
    for pdf in batches:
        ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_us.sort()

    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = ts_us[0], ts_us[0], 0

    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if t - last > GAP_SECONDS * 1_000_000:
            if n > 0:
                closed.append((start, last, n))
            start, n = t, 0
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    try:
        state.setTimeoutDuration(GAP_SECONDS * 1000)
    except Exception:  # noqa: BLE001 — NoTimeout mode: nothing to arm
        pass

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame, timeout_conf: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """events(user_id, ts, ...) stream → closed-session stream.

    timeout_conf: use ``GroupStateTimeout.ProcessingTimeTimeout`` on
    continuous streams so idle users' final sessions flush after the
    gap elapses. Default NoTimeout keeps drain-style runs
    (trigger=availableNow) terminating — a pending processing-time
    timeout otherwise holds the query open until the wall-clock gap
    passes."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
