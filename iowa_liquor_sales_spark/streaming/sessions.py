"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

This is the operator class Spark's built-in windowed aggregates cannot
express (sessions have data-dependent extents). State per user is O(1) —
just the open session (start, end, count) — and is closed either by an
in-batch gap or by an event-time timeout once the watermark passes
session_end + gap, so total state is bounded by #active users regardless
of stream length: the 100 TB/forever-running posture.

The batch twin in ``__spark_entry__.q_sessionize`` (lag + cumulative-sum
windows) computes the same sessions; the streaming test checks the two
agree on every session the stream has closed.

Spark 4's successor API (``transformWithStateInPandas`` — typed value/
list/map state, timers, TTL) expresses the same operator; its Python
driver worker imports ``google.protobuf`` for the state-server protocol,
which this container does not ship, so the engine standardizes on
``applyInPandasWithState`` (probed: the TWS worker crashes at
StateMessage_pb2 import here). The migration is mechanical: state tuple →
``handle.getValueState``, the timeout branch → ``handleExpiredTimer``.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)

_US = 1_000_000


def _emit(user_id: int, start_us: int, end_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
        }
    )


def make_session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield _emit(user_id, start_us, end_us, n)
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value) // 1000 for t in pdf["ts"])
        ts_us.sort()
        cur = state.get if state.exists else None
        for t in ts_us:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_us:
                yield _emit(user_id, *cur)
                cur = (t, t, 1)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            # Close once the watermark passes session_end + gap (ms API).
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: one state entry per open session per user,
    event-time timeouts, append output of closed sessions only."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_seconds),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
