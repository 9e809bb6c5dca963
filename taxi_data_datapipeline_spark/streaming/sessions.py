"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch sessionizer (queries_advanced.q_sessionize_events) needs the
whole history per user; a stream can't hold that. This operator keeps ONE
struct of state per user — (session_start, last_ts, n_events) — and emits
a session row when the gap closes it or the state times out, which is the
bounded-state formulation that scales to unbounded streams: state size is
O(active users), independent of stream length.

GroupState mechanics: rows arrive grouped by user per micro-batch; the
handler folds sorted timestamps into the open session, emitting every
closed one. With ``use_timeout=True`` a ProcessingTimeTimeout finalizes
idle users' sessions so state is eventually evicted even if a user never
returns — that is the long-running-production setting; it keeps the query
alive waiting on timers, so drain-and-stop runs (Trigger.AvailableNow,
tests) use the default NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),  # "gap" | "timeout"
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType()),  # epoch seconds
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: float = 30 * 60,
    use_timeout: bool = False,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out: list[tuple] = []

    if state.hasTimedOut:
        start, last, n = state.get
        out.append((user_id, start, last, n, "timeout"))
        state.remove()
    else:
        ts: list[float] = []
        for pdf in pdfs:
            ts.extend(t.timestamp() for t in pdf["ts"] if t is not None)
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                out.append((user_id, start, last, n, "gap"))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            state.update((start, last, n))
            if use_timeout:
                state.setTimeoutDuration(int(gap_seconds * 1000))

    if out:
        yield pd.DataFrame(
            {
                "user_id": [o[0] for o in out],
                "session_start": [pd.Timestamp(o[1], unit="s") for o in out],
                "session_end": [pd.Timestamp(o[2], unit="s") for o in out],
                "n_events": [o[3] for o in out],
                "closed_by": [o[4] for o in out],
            }
        )


def sessionize_stream(
    events: DataFrame, gap_seconds: float = 30 * 60, use_timeout: bool = False
) -> DataFrame:
    """events(user_id long, ts timestamp) stream -> closed-session rows.

    One state struct per user; emits on gap-close (and, with
    ``use_timeout=True``, on processing-time timeout for idle users).
    Use with update output mode.
    """

    def handler(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_seconds, use_timeout)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            handler,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
