"""Skew mitigation: salted two-phase aggregation.

A groupBy on a skewed key sends the hot key's entire input to one
reducer. Salting splits every key into ``n_salts`` shards — phase 1
aggregates (key, salt) partials (uniformly distributed), phase 2 merges
the <= n_salts partial rows per key. Total shuffle volume is unchanged;
the MAX PER-REDUCER volume drops by ~n_salts.

For algebraic aggregates (count/sum/min/max) Spark's own map-side partial
aggregation already bounds reducer input per map task, so salting matters
when the aggregate state itself is big (collect/distinct-style) or when
AQE skew handling is unavailable (e.g. the aggregate feeds a further
stage that pins the partitioning). The operator exists for those cases
and as the documented pattern; results are bit-identical to the plain
groupBy, which is what the oracle checks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_col: str | None = None,
    n_salts: int = 16,
    sum_alias: str = "total",
) -> DataFrame:
    """count(*) (and optionally an exact decimal sum surfaced as double)
    per key, computed as salted partials then merged.

    Salt = pmod(xxhash64(monotonically_increasing_id()), n_salts) —
    uniform across a partition's rows and deterministic within a run
    (unlike rand(), it cannot disagree between a task and its retry in a
    way that double-counts: the id depends only on partition+position).
    """
    cols = list(keys) + ([sum_col] if sum_col else [])
    salted = df.select(*cols).withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    aggs1 = [F.count(F.lit(1)).alias("_c")]
    aggs2 = [F.sum("_c").alias("n")]
    if sum_col:
        aggs1.append(F.sum(F.col(sum_col).cast("decimal(18,2)")).alias("_s"))
        aggs2.append(F.sum("_s").cast("double").alias(sum_alias))
    phase1 = salted.groupBy(*keys, "_salt").agg(*aggs1)
    return phase1.groupBy(*keys).agg(*aggs2)
