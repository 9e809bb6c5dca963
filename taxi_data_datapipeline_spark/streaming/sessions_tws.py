"""Gap-based sessionization on ``transformWithStateInPandas`` — Spark 4's
successor to ``applyInPandasWithState`` (SPARK-49564 / the
transformWithState API): typed per-key state handles, TTL support, and a
processor object instead of a bare function.

Same semantics as ``streaming/sessions.py``: one open-session struct per
user, emit a session row when a > gap_seconds silence closes it. State is
a single ValueState (bounded per user); optional TTL evicts idle users'
state server-side — the piece applyInPandasWithState needed explicit
timers for.

Runtime requirements: the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) and ``google.protobuf``
on the Python side (pyspark's transformWithState worker protocol). Where
protobuf is unavailable, use ``streaming/sessions.py`` — identical
semantics on applyInPandasWithState.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "session_start double, last_ts double, n_events long"


class SessionProcessor(StatefulProcessor):
    """Folds each user's timestamps into an open session; emits closed ones."""

    def __init__(self, gap_seconds: float = 30 * 60, state_ttl_ms: int | None = None):
        self.gap_seconds = gap_seconds
        self.state_ttl_ms = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("open_session", _STATE_SCHEMA, self.state_ttl_ms)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts: list[float] = []
        for pdf in rows:
            ts.extend(t.timestamp() for t in pdf["ts"] if t is not None)
        ts.sort()

        if self.state.exists():
            start, last, n = self.state.get()
        else:
            start, last, n = None, None, 0

        out: list[tuple] = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > self.gap_seconds:
                out.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            self.state.update((start, last, n))

        if out:
            # Emit on the exact microsecond grid: float-seconds -> ns would
            # land ~0.1 ns off the true microsecond and can truncate 1 us low
            # at the Arrow ns->us conversion; rounding to us first is exact
            # (double error << 0.5 us at epoch magnitudes).
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [
                        pd.Timestamp(round(o[1] * 1_000_000), unit="us") for o in out
                    ],
                    "session_end": [
                        pd.Timestamp(round(o[2] * 1_000_000), unit="us") for o in out
                    ],
                    "n_events": [o[3] for o in out],
                }
            )

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    events: DataFrame, gap_seconds: float = 30 * 60, state_ttl_ms: int | None = None
) -> DataFrame:
    """events(user_id long, ts timestamp) stream -> closed-session rows via
    the transformWithState processor. Update output mode, processing-time
    time mode."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_seconds, state_ttl_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
