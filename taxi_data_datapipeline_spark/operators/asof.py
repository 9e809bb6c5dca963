"""As-of (point-in-time) join — an operator Spark lacks as a primitive.

``asof_join(left, right, ...)`` attaches, to every left row, the most
recent right row with the same key whose timestamp is <= the left row's
timestamp (``direction="backward"``, the default; ties at equal
timestamps DO match), or the earliest right row with timestamp >= the
left row's (``direction="forward"``). An optional ``tolerance`` interval
nulls out matches farther than the tolerance from the left timestamp —
pandas ``merge_asof`` semantics.

Implementation is the scalable union-marker pattern, not a range join:

1. union left and right rows into one stream tagged with a side marker;
2. one shuffle: Window.partitionBy(key).orderBy(ts, marker) — right rows
   sort BEFORE left rows at equal ts, so <= semantics fall out of the
   frame (unbounded preceding .. current row);
3. the latest right row rides along as a single struct via
   ``last(struct, ignorenulls=True)`` (struct-per-row, so a NULL inside a
   matched right row is preserved — it never falls through to an older
   row).

Cost: ONE shuffle on the join key, linear scan per partition — no
key x time-range blowup like an inequality join (Catalyst would plan that
as a nested-loop/range join with per-key quadratic behavior). Skewed keys
split under AQE; window state is O(1) per partition (the running last
struct), so this survives arbitrarily long histories.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of left join (backward or forward).

    Output: every ``left`` column, plus ``{right_ts}{suffix}`` (the matched
    right row's timestamp, NULL when no match) and ``{c}{suffix}`` for each
    of ``right_cols`` (default: all non-key, non-ts right columns). Among
    right rows tied on (key, ts) the struct-wise max wins backward, the
    struct-wise min forward — deterministic either way. ``tolerance`` is a
    SQL interval string (e.g. ``"2 hours"``): a match farther than that
    from the left timestamp comes back as all-NULL, exactly like pandas
    ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    right_cols = list(right_cols)
    left_payload = [c for c in left.columns if c not in on]

    rstruct = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in right_cols],
    )
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).alias("_r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_payload
        ],
        rstruct.alias("_r"),
    )

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=False)
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_r").asc()]
    else:
        # descending time: the frame above a left row holds all right rows
        # with ts >= it; last non-null = the nearest (smallest such ts).
        order = [F.col("_t").desc(), F.col("_side").asc(), F.col("_r").desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)

    if tolerance is None:
        valid = F.lit(True)
    elif direction == "backward":
        valid = F.col(f"_m.{right_ts}") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
    else:
        valid = F.col(f"_m.{right_ts}") <= F.col("_t") + F.expr(f"INTERVAL {tolerance}")

    def _gated(col):
        return F.when(valid, col)

    return (
        unioned.withColumn("_m", matched)
        .filter(F.col("_side") == 1)
        .select(
            *on,
            *[F.col(c) for c in left_payload],
            _gated(F.col(f"_m.{right_ts}")).alias(f"{right_ts}{suffix}"),
            *[_gated(F.col(f"_m.{c}")).alias(f"{c}{suffix}") for c in right_cols],
        )
    )
