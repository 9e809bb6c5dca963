"""Sketch-based approximations must stay within their advertised error
of the exact answers they replace at scale."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_approx_percentile_within_rank_error(spark):
    approx = {
        r["l_returnflag"]: [r["ap25"], r["ap50"], r["ap75"], r["ap99"]]
        for r in QUERIES["approx_percentile_prices"](spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for flag, aps in approx.items():
        vals = sorted(
            r[0]
            for r in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for p, a in zip([0.25, 0.5, 0.75, 0.99], aps):
            # GK guarantee: returned value's rank within n/accuracy of target.
            target = p * (n - 1)
            import bisect

            lo = bisect.bisect_left(vals, a)
            hi = bisect.bisect_right(vals, a) - 1
            rank_err = min(abs(lo - target), abs(hi - target))
            assert rank_err <= max(1.0, n / 10000), (flag, p, rank_err, n)


def test_approx_distinct_close_to_exact(spark):
    row = QUERIES["approx_distinct"](spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
    ).collect()[0]
    # rsd=2%; allow 5 sigma.
    assert abs(row["approx_orders"] - exact["orders"]) / exact["orders"] < 0.1
    assert abs(row["approx_parts"] - exact["parts"]) / exact["parts"] < 0.1


def test_hll_rollup_matches_exact_and_direct(spark):
    rolled = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["hll_daily_rollup"](spark, SF).collect()
    }
    ev_exact = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    )
    for r in ev_exact:
        est, exact = rolled[r["event_type"]], r["d"]
        # Union-of-daily-sketches must estimate within HLL error (lgK=12
        # default: ~1.6% rsd; cardinality here is tiny so near-exact).
        assert abs(est - exact) / max(exact, 1) < 0.05, (r["event_type"], est, exact)


def test_hll_portable_within_error_bound(spark):
    """The derandomized md5-HLL estimate stays within ~5 sigma of the
    standard error (1.04/sqrt(256) = 6.5%) of the exact daily distinct
    count, and its integer invariants hold: 256 registers account for
    every bucket, and a day with few users keeps most registers at zero."""
    rows = QUERIES["hll_portable_daily"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_zero"] <= 256
        # harmonic sum is bounded by all-zero (256 * 2^33) below by >=1
        assert 0 < r["harmonic_scaled"] <= 256 * (1 << 33)
        # The query emits the RAW estimator plus n_zero (ln() is not
        # bit-stable across engines, so the low-range branch is the
        # consumer's); apply the canonical linear-counting correction
        # here exactly as Flajolet et al. specify: E <= 2.5m with zero
        # registers -> m * ln(m / V).
        est = r["hll_estimate"]
        if est <= 2.5 * 256 and r["n_zero"] > 0:
            est = 256 * math.log(256 / r["n_zero"])
        rel = abs(est - r["exact_distinct"]) / r["exact_distinct"]
        assert rel < 5 * 1.04 / 16, (r["day"], rel)


def test_kmv_set_sketch_error_bounds(spark):
    """KMV estimates for |A|, |B|, |A u B|, |A n B| all land within
    ~4/sqrt(k) relative error of exact (k=256 -> 25%; observed ~2%),
    and the structural invariants hold: Jaccard in [0,1], the
    intersection estimate is Jaccard x union, and inclusion-exclusion
    approximately holds across the four estimates."""
    r = QUERIES["kmv_set_sketch"](spark, SF).collect()[0]
    k = r["k"]
    bound = 4.0 / (k ** 0.5)
    for est, exact in (
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]),
        (r["est_intersect"], r["exact_intersect"]),
    ):
        assert abs(est - exact) / exact <= bound, (est, exact)
    assert 0.0 <= r["est_jaccard"] <= 1.0
    assert abs(r["est_intersect"] - r["est_jaccard"] * r["est_union"]) < 1e-9
