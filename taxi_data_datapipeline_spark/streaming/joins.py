"""Stream-stream joins: watermarked interval joins between live streams.

Batch attribution (``asof_purchase_view`` / ``asof_next_purchase``) has a
streaming twin: correlate two *unbounded* event streams — views with the
purchases that follow within an attribution window — without ever holding
either stream whole. Structured Streaming does this with symmetric hash
join state bounded by two things, both REQUIRED for state cleanup:

* a watermark on each side (how late either stream's events may arrive);
* a time-range join condition (how far apart matched events may be).

Spark derives each side's state retention from watermark + range: a view
older than ``watermark + attribution window`` can never match a future
purchase, so its state is evicted. Without the range condition the join
state grows forever — the classic unbounded-state bug this module's test
locks against (appending the range predicate is the fix, not tuning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two (optionally streaming) DataFrames on an equi-key plus a
    forward time interval: right event in ``[left_ts, left_ts + window]``.

    Works identically on batch DataFrames (the watermark is a no-op there),
    which is how the test proves stream == batch row-for-row. Left-outer
    emits unmatched left rows once their state expires (streaming) — the
    "view that never converted" record.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l, r = lw.alias("l"), rw.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {window}"))
    )
    return l.join(r, cond, how)


def view_purchase_attribution(
    views: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Views joined to every purchase by the same user within the window.

    Output: user_id, view_id, view_ts, purchase_id, purchase_ts, value.
    """
    joined = interval_join(
        views, purchases, on="user_id", window=window, watermark=watermark
    )
    return joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("view_id"),
        F.col("l.ts").alias("view_ts"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("r.ts").alias("purchase_ts"),
        F.col("r.value").alias("value"),
    )
