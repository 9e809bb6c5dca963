"""Streaming record-high detector — custom stateful processing on
``applyInPandasWithState``.

Emits every event that sets a new running maximum of ``value`` for its
user (monitoring "new peak" alerts, leaderboard updates, high-water-mark
tracking). State per user is ONE bigint — the running max in fixed-point
micro-units — the minimum possible footprint.

The batch twin is a window query: value > MAX(value) OVER (ROWS
UNBOUNDED PRECEDING .. 1 PRECEDING) in (ts, event_id) order. Over a
drained AvailableNow run on time-ordered input the emitted set equals
the batch result row-for-row, which makes the streaming operator
oracle-checkable (same equivalence argument as streaming/twap.py; with
out-of-order files a production run would add a watermark + buffer,
noted not implemented).

Values enter BIGINT micro-units via math.floor, matching Spark's
F.floor semantics for negatives, so the comparison is exact — a float
comparison could disagree with the batch plan in the last ulp.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, event_id long, vunits long"
STATE_SCHEMA = "max_vunits long"


def _record_high_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows: list[tuple[int, int, int]] = []  # (ts_us, event_id, vunits)
    for pdf in pdfs:
        for ts, eid, val in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
            if ts is None:
                continue
            rows.append(
                (int(ts.value // 1000), int(eid), math.floor(float(val) * 1e6))
            )
    rows.sort()  # event-time order, event_id tiebreak — the batch ORDER BY

    cur = state.get[0] if state.exists else None
    out_e: list[int] = []
    out_v: list[int] = []
    for _ts, eid, vunits in rows:
        if cur is None or vunits > cur:
            out_e.append(eid)
            out_v.append(vunits)
            cur = vunits
    if cur is not None:
        state.update((cur,))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(out_e), dtype="int64"),
            "event_id": pd.Series(out_e, dtype="int64"),
            "vunits": pd.Series(out_v, dtype="int64"),
        }
    )


def record_high_stream(events: DataFrame) -> DataFrame:
    """events(ts, event_id, user_id, value) stream -> record-setting
    events (user_id, event_id, vunits)."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _record_high_fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
