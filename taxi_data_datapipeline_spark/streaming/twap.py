"""Streaming TWAP segments — custom stateful processing on
``applyInPandasWithState``.

The batch TWAP (`time_weighted_value`) derives each event's holding
duration with LEAD(); a stream cannot look ahead, so the streaming form
inverts it: per user, keep the LAST (ts, value) in state and emit the
closed segment (value, duration) when the next event arrives. Over a
drained AvailableNow run the emitted segment set equals the batch LEAD
derivation row-for-row — which is what makes the query oracle-checkable.

State is one (last_ts_us, last_vunits) pair per user — O(active users),
the smallest possible footprint for this computation. No timeout is
registered: an AvailableNow drain with pending ProcessingTime timers
never terminates (ROUND_NOTES landmine 3); a production continuous run
would add a TTL to evict dormant users.

Values enter BIGINT micro-units (math.floor, matching Spark's F.floor
for negatives) and durations are integer microseconds, so downstream
aggregation stays in the engine's exact-arithmetic regime.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEGMENT_SCHEMA = "user_id long, vunits long, dur_us long"
STATE_SCHEMA = "last_ts_us long, last_vunits long"


def _segments_fn(
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
    # Event-time order within the batch; ties broken by event_id exactly
    # like the batch window ORDER BY (ts, event_id).
    rows.sort()

    if state.exists:
        last_ts, last_v = state.get
    else:
        last_ts, last_v = None, None

    out_v: list[int] = []
    out_d: list[int] = []
    for ts_us, _eid, vunits in rows:
        if last_ts is not None:
            out_v.append(last_v)
            out_d.append(ts_us - last_ts)
        last_ts, last_v = ts_us, vunits
    if last_ts is not None:
        state.update((last_ts, last_v))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(out_v), dtype="int64"),
            "vunits": pd.Series(out_v, dtype="int64"),
            "dur_us": pd.Series(out_d, dtype="int64"),
        }
    )


def twap_segment_stream(events: DataFrame) -> DataFrame:
    """events(ts, event_id, user_id, value) stream -> closed holding
    segments (user_id, vunits, dur_us)."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _segments_fn,
            outputStructType=SEGMENT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
