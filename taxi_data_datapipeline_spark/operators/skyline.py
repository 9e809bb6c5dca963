"""Grid-pruned 2-D skyline (Pareto-optimal set) operator.

The skyline of a point set under (minimize ``min_col``, maximize
``max_col``) is every point not dominated by another — dominated meaning
some other point is no worse on both axes and strictly better on at
least one (Borzsony/Kossmann/Stocker, ICDE'01).

The naive formulation is the O(n^2) NOT EXISTS self-join. At 100 TB that
is never acceptable, so this operator runs the classic two-phase
grid prune:

1. **Bucket prune (linear, one shuffle).** Bucket points by fixed-width
   ranges of ``min_col``. Every point in a strictly lower bucket has a
   strictly smaller ``min_col`` value (bucket upper edge <= the probe
   bucket's lower edge), so a point whose ``max_col`` does not exceed the
   running maximum of all lower buckets is dominated and is dropped with
   a broadcast join against the bucket-summary table (bucket count =
   value_range / width — tiny, never a global window, never a sort of
   the data).
2. **Exact verify (bounded).** Survivors are at most (points tied with a
   bucket's running max) + (points in the single bucket where the
   running max increases past them) — in practice a few per bucket. The
   exact dominance anti-join runs survivors-vs-survivors with the small
   side broadcast.

Phase 1 never loses a skyline point: pruning only removes points with a
STRICTLY cheaper, no-worse-quantity witness. Phase 2 applies the exact
dominance predicate, so the result equals the naive definition —
the DuckDB oracle runs the NOT EXISTS form directly.

Reference parity: the reference engine has no skyline operator; this is
part of the extended analytics surface (multi-objective "best tradeoff"
scans used for model/data selection frontiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket_width: float,
) -> DataFrame:
    """Pareto frontier of ``df`` minimizing ``min_col``, maximizing
    ``max_col``. Returns the input columns unchanged; dominance ties
    (exact duplicates on both axes) are all kept, matching the NOT
    EXISTS definition."""
    # Consumed by the bucket summary AND the survivor filter; callers
    # hand in join+aggregate chains (skyline_orders: orders x lineitem
    # rollup), so materialize ONCE instead of re-executing the upstream
    # per consumer (24 scans / 38 Exchanges in one plan before).
    pts = df.withColumn(
        "_b", (F.col(min_col) / F.lit(bucket_width)).cast("long")
    ).localCheckpoint(eager=True)

    # Bucket summary: max(max_col) per bucket, then the running max over
    # all STRICTLY lower buckets via a broadcast self-join on the tiny
    # bucket table (no global window; bucket count is bounded by the
    # value range, not the row count).
    bmax = pts.groupBy("_b").agg(F.max(max_col).alias("_bmax"))
    lower = (
        bmax.alias("hi")
        .join(
            F.broadcast(bmax.alias("lo")),
            F.col("lo._b") < F.col("hi._b"),
            "left",
        )
        .groupBy(F.col("hi._b").alias("_b"))
        .agg(F.max(F.col("lo._bmax")).alias("_lower_max"))
    )

    survivors = (
        pts.join(F.broadcast(lower), "_b")
        .filter(
            F.col("_lower_max").isNull()
            | (F.col(max_col) > F.col("_lower_max"))
        )
        .drop("_b", "_lower_max")
        # frontier candidates (per-bucket winners): tiny, 2 consumers
        .localCheckpoint(eager=True)
    )

    # Exact dominance among survivors (bounded set -> broadcast
    # nested-loop anti-join is the cheap and correct plan here).
    s = survivors.alias("s")
    d = survivors.select(
        F.col(min_col).alias("_dmin"), F.col(max_col).alias("_dmax")
    ).alias("d")
    dominated = (
        (F.col("_dmin") <= F.col(f"s.{min_col}"))
        & (F.col("_dmax") >= F.col(f"s.{max_col}"))
        & (
            (F.col("_dmin") < F.col(f"s.{min_col}"))
            | (F.col("_dmax") > F.col(f"s.{max_col}"))
        )
    )
    return s.join(F.broadcast(d), dominated, "left_anti")
