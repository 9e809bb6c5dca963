"""Jackknife CI operator vs an independent pandas recomputation."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.resample import (
    jackknife_count_ci,
    jackknife_sum_ci,
)


def _bucket(x: int, b: int = 20) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16) % b


def test_jackknife_count_matches_manual(spark):
    rows = [(i, "g1" if i % 3 else "g2") for i in range(1, 500)]
    df = spark.createDataFrame(rows, ["id", "g"])
    out = {r.g: r for r in jackknife_count_ci(df, ["g"], "id").collect()}

    for g in ("g1", "g2"):
        ids = [i for i, gg in rows if gg == g]
        counts: dict[int, int] = {}
        for i in ids:
            counts[_bucket(i)] = counts.get(_bucket(i), 0) + 1
        n = sum(counts.values())
        b = 20.0
        sum_c2 = sum(c * c for c in counts.values())
        var = ((b - 1) / b) * (sum_c2 - n * n / b)
        assert out[g].n == n
        assert math.isclose(out[g].se, math.sqrt(var), rel_tol=1e-12)
        assert out[g].ci_lo < n < out[g].ci_hi


def test_jackknife_sum_matches_manual(spark):
    rows = [(i, float(i) * 1.25 + 3) for i in range(1, 400)]
    df = spark.createDataFrame(rows, ["id", "v"])
    # group column required for the window; use a constant group
    df = df.withColumn("g", F.lit("all"))
    r = jackknife_sum_ci(df, ["g"], "id", F.col("v")).collect()[0]

    sums: dict[int, int] = {}
    for i, v in rows:
        cents = round(v * 100)
        sums[_bucket(i)] = sums.get(_bucket(i), 0) + cents
    total = sum(sums.values())
    b = 20
    e2 = sum((b * s - total) ** 2 for s in sums.values())
    var = (b - 1) / b**3 * e2 / 10000.0
    assert math.isclose(r.total, total / 100.0, rel_tol=1e-12)
    assert math.isclose(r.se, math.sqrt(var), rel_tol=1e-12)
    assert r.ci_lo < r.total < r.ci_hi
