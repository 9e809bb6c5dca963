"""Incremental view maintenance + mergeable histogram quantiles.

The DuckDB gate already value-hash-checks both queries end-to-end; these
tests pin the properties the hash can't see:

* IVM: the signed-partial merge survives ANY batch split of the same
  changelog (associativity/commutativity — the property that makes the
  maintenance distributable), a delete that empties a group drops it,
  and an update shifts revenue by exactly the delta.
* Histogram quantiles: the interpolated estimate is within one bucket
  width of the exact percentile (the sketch's error bound), and the
  histogram pass shuffles bucket-sized, not row-sized, data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import QUERIES
from taxi_data_datapipeline_spark.queries_incremental import _signed_partial

SF = "/root/testdata/sf0.001"


def _mk_changelog(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderpriority string, omonth int, o_totalprice double, w long"
    )


def _merge(*partials):
    out = partials[0]
    for p in partials[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("o_orderpriority", "omonth")
        .agg(
            F.sum("n_live").cast("long").alias("n_live"),
            (F.sum("rev_cents").cast("double") / 100).alias("revenue"),
        )
        .filter(F.col("n_live") > 0)
    )


def test_ivm_merge_is_batch_split_invariant(spark):
    rows = [
        ("HIGH", 1, 100.0, 1),
        ("HIGH", 1, 50.0, 1),
        ("LOW", 2, 30.0, 1),
        # update HIGH/1 100.0 -> 120.0 (retract + insert)
        ("HIGH", 1, 100.0, -1),
        ("HIGH", 1, 120.0, 1),
        # delete the only LOW/2 row: group must vanish
        ("LOW", 2, 30.0, -1),
    ]
    # One batch vs three batches vs reversed order — identical view.
    views = [
        _merge(_signed_partial(_mk_changelog(spark, rows))),
        _merge(*[_signed_partial(_mk_changelog(spark, rows[i : i + 2]))
                 for i in range(0, 6, 2)]),
        _merge(_signed_partial(_mk_changelog(spark, rows[::-1]))),
    ]
    results = [sorted(map(tuple, v.collect())) for v in views]
    assert results[0] == results[1] == results[2]
    assert results[0] == [("HIGH", 1, 2, 170.0)]  # LOW/2 dropped, update applied


def test_ivm_query_matches_scratch_recompute(spark):
    view = QUERIES["mv_incremental_revenue"](spark, SF)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    survived = (
        orders.filter(F.col("o_orderkey") % 7 != 3)
        .withColumn(
            "price",
            F.when(
                (F.col("o_orderkey") % 11 == 5), F.col("o_totalprice") + 10.0
            ).otherwise(F.col("o_totalprice")),
        )
        .groupBy("o_orderpriority", F.month("o_orderdate").alias("omonth"))
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            (
                F.sum((F.col("price") * 100).cast("decimal(38,0)")).cast("double")
                / 100
            ).alias("revenue"),
        )
    )
    assert sorted(map(tuple, view.collect())) == sorted(
        map(tuple, survived.collect())
    )


def test_histogram_quantile_error_bound(spark):
    out = {r["q"]: r for r in QUERIES["histogram_quantile_estimate"](spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    mn, mx = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).first()
    width = (mx - mn) / 256.0 + 0.01
    exact = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.9, 0.99))"
        )
    ).first()[0]
    for q, ex in zip((0.25, 0.5, 0.75, 0.9, 0.99), exact):
        assert abs(out[q]["estimate"] - ex) <= width, (q, out[q]["estimate"], ex)


def test_histogram_shuffle_is_bucket_sized(spark):
    # The aggregate above the scan must group by the 256-ary bucket (a
    # partial_count per bucket per partition), never shuffle raw rows.
    plan = QUERIES["histogram_quantile_estimate"](
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_aqp_estimate_within_error_bars(spark):
    rows = QUERIES["aqp_group_revenue"](spark, SF).collect()
    assert rows
    for r in rows:
        # Bernoulli-sampling CLT: exact within 5 standard errors, and the
        # sample is ~10% of rows (binomial 5-sigma bounds at these n).
        assert abs(r["est_revenue"] - r["exact_revenue"]) <= 5 * r["se_revenue"]
        frac = r["n_sample"] / r["n_exact"]
        assert 0.03 < frac < 0.2, frac


def test_rolling_origin_folds_are_temporally_sound(spark):
    rows = {(r["fold"], r["role"]): r for r in QUERIES["rolling_origin_cv"](spark, SF).collect()}
    for fold in (1, 2, 3):
        tr, te = rows[(fold, "train")], rows[(fold, "test")]
        # test strictly follows train, contiguously
        assert tr["last_day"] < te["first_day"]
        # expanding window: each fold trains on strictly more days
        if fold > 1:
            assert tr["n_days"] > rows[(fold - 1, "train")]["n_days"]
            # and fold k's test start is after fold k-1's
            assert te["first_day"] > rows[(fold - 1, "test")]["first_day"]


def test_token_budget_allocations_sum_to_budget(spark):
    rows = QUERIES["token_budget_mix"](spark, SF).collect()
    assert sum(r["alloc_final"] for r in rows) == 1_000_000
    assert all(r["alloc_final"] >= r["alloc_base"] >= 0 for r in rows)
    # temperature < 1 upsamples small sources: allocation shares are
    # flatter than raw char shares (smallest source gets MORE than raw).
    total_chars = sum(r["chars"] for r in rows)
    smallest = min(rows, key=lambda r: r["chars"])
    assert smallest["alloc_final"] / 1_000_000 > smallest["chars"] / total_chars


def test_interval_coverage_bounds(spark):
    rows = QUERIES["interval_coverage"](spark, SF).collect()
    assert rows
    for r in rows:
        span = (r["last_end"] - r["first_start"]).total_seconds()
        # coverage is at least one 5-min window and never exceeds the span
        assert 300 <= r["covered_seconds"] <= span + 1
        assert r["n_islands"] >= 1


def test_watermark_late_audit_monotone(spark):
    rows = QUERIES["watermark_late_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        # a longer watermark can only drop fewer rows, and in-order rows
        # are never dropped by any watermark
        assert r["dropped_at_1h"] <= r["dropped_at_10m"]
        assert r["dropped_at_10m"] <= r["n_events"] - r["n_in_order"]


def test_growth_accounting_flow_identity(spark):
    """active(w) - active(w-1) == new(w) + resurrected(w) - churned(w)
    for every interior week — the decomposition's defining identity."""
    from collections import defaultdict

    rows = QUERIES["growth_accounting"](spark, SF).collect()
    by_wk = defaultdict(lambda: defaultdict(int))
    for r in rows:
        by_wk[r["wk"]][r["status"]] = r["n_users"]
    weeks = sorted(by_wk)
    active = {
        w: by_wk[w]["new"] + by_wk[w]["retained"] + by_wk[w]["resurrected"]
        for w in weeks
    }
    assert len(weeks) >= 3
    for prev, cur in zip(weeks, weeks[1:]):
        delta = active[cur] - active[prev]
        flow = by_wk[cur]["new"] + by_wk[cur]["resurrected"] - by_wk[cur]["churned"]
        assert delta == flow, (cur, delta, flow)
