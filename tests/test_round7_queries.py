"""Structural property pins for the round-7 additions — invariants the
value-hash oracle can't state (it proves engine agreement; these prove
the SHAPE is the intended one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.dedup import (
    blocked_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from taxi_data_datapipeline_spark.operators.skyline import skyline_2d
from taxi_data_datapipeline_spark.queries import QUERIES, load

SF_SMOKE = "/root/testdata/sf0.001"


def test_prefix_filter_is_complete_vs_ground_truth(spark):
    """Prefix filtering is an EXACT candidate generator: at t = 1/2 it
    must return precisely the pairs the quadratic blocked ground truth
    finds at jaccard >= 0.5 (single all-docs block = no blocking loss)."""
    docs = load(spark, SF_SMOKE, "documents").withColumn("one", F.lit(1))
    truth = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in blocked_jaccard_pairs(docs, block_cols=["one"], threshold=0.5)
        .select("doc_a", "doc_b", "jaccard")
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(docs).collect()
    }
    assert got == truth
    for a, b, j in got:
        assert a < b and j >= 0.5


def test_skyline_matches_naive_definition(spark):
    """Grid prune + bounded verify returns exactly the NOT EXISTS set,
    at several bucket widths (including one wide enough that everything
    lands in a single bucket — pure phase-2)."""
    orders = load(spark, SF_SMOKE, "orders")
    li = load(spark, SF_SMOKE, "lineitem")
    pts = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_totalprice").alias("price"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    rows = pts.collect()
    naive = {
        r.o_orderkey
        for r in rows
        if not any(
            q.price <= r.price
            and q.qty >= r.qty
            and (q.price < r.price or q.qty > r.qty)
            for q in rows
        )
    }
    for width in (1000.0, 10000.0, 10**9):
        got = {r.o_orderkey for r in skyline_2d(pts, "price", "qty", width).collect()}
        assert got == naive, f"width={width}"


def test_skyline_frontier_is_monotone(spark):
    out = sorted(
        QUERIES["skyline_orders"](spark, SF_SMOKE).collect(),
        key=lambda r: r.price,
    )
    assert out
    # along increasing price, quantity must strictly increase (else the
    # cheaper point would dominate)
    for a, b in zip(out, out[1:]):
        assert b.qty > a.qty


def test_cms_estimate_upper_bounds_exact(spark):
    r = QUERIES["cms_join_size"](spark, SF_SMOKE).collect()[0]
    assert r.exact_size > 0
    assert r.cms_estimate >= r.exact_size  # CMS inner product never undershoots
    assert r.rel_error >= 0.0


def test_jl_distortion_concentrates_near_one(spark):
    rows = QUERIES["random_projection_jl"](spark, SF_SMOKE).collect()
    assert rows
    ratios = [r.dist_ratio for r in rows]
    assert all(x > 0 for x in ratios)
    mean = sum(ratios) / len(ratios)
    # E[ratio] = 1 under JL; k=16 keeps individual pairs noisy but the
    # mean over hundreds of pairs lands well inside [0.7, 1.3]
    assert 0.7 < mean < 1.3


def test_lm_quality_scores_reference_slice_lower(spark):
    df = QUERIES["lm_quality_score"](spark, SF_SMOKE)
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "source")
    j = df.join(docs, "doc_id")
    agg = j.groupBy(
        F.col("source").isin(["src1", "src2", "src3", "src4"]).alias("is_train")
    ).agg(F.avg("avg_nll").alias("m"), F.count(F.lit(1)).alias("n"))
    by = {r.is_train: r for r in agg.collect()}
    assert by[True].n > 0 and by[False].n > 0
    # in-domain text must score lower NLL under its own LM
    assert by[True].m < by[False].m
    for r in df.collect():
        assert r.n_bigrams >= 1 and r.avg_nll > 0


def test_snm_pairs_respect_window_and_ordering(spark):
    rows = QUERIES["snm_candidate_pairs"](spark, SF_SMOKE).collect()
    for r in rows:
        assert 1 <= r.gap <= 4
        assert 0.05 <= r.jaccard <= 1.0


def test_did_cells_consistent(spark):
    r = QUERIES["did_purchase_effect"](spark, SF_SMOKE).collect()[0]
    did = (r.mean_treat_post - r.mean_treat_pre) - (
        r.mean_ctrl_post - r.mean_ctrl_pre
    )
    assert abs(did - r.did) < 5e-6  # recomputed from rounded cells


def test_mmr_selects_five_distinct_with_valid_scores(spark):
    rows = QUERIES["mmr_rerank"](spark, SF_SMOKE).collect()
    assert sorted(r.mmr_rank for r in rows) == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    by_rank = sorted(rows, key=lambda r: r.mmr_rank)
    # rank-1 is the pure-relevance pick; λ·cos ∈ (−0.7, 0.7]
    assert -0.7 < by_rank[0].mmr_score <= 0.7
    # greedy objective is non-increasing over steps 2..5 (each later step
    # optimizes over a subset with at-least-as-large penalties)
    for a, b in zip(by_rank[1:], by_rank[2:]):
        assert b.mmr_score <= a.mmr_score + 1e-12


def test_containment_is_superset_of_jaccard_pairs(spark):
    """Every symmetric near-dup pair (J >= 0.5) must appear in the
    containment join in at least one direction (C(a->b) >= J(a,b))."""
    docs = load(spark, SF_SMOKE, "documents").withColumn("one", F.lit(1))
    jpairs = {
        (r.doc_a, r.doc_b)
        for r in blocked_jaccard_pairs(docs, block_cols=["one"], threshold=0.5)
        .select("doc_a", "doc_b")
        .collect()
    }
    cont = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["containment_join"](spark, SF_SMOKE).collect()
    }
    for a, b in jpairs:
        assert (a, b) in cont or (b, a) in cont
    for a, b in cont:
        assert a != b


def test_nb_confusion_covers_all_test_docs(spark):
    rows = QUERIES["nb_lang_classifier"](spark, SF_SMOKE).collect()
    n_test = (
        load(spark, SF_SMOKE, "documents")
        .filter(
            "conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) % 5 = 0"
        )
        .count()
    )
    assert sum(r.n for r in rows) == n_test
    correct = sum(r.n for r in rows if r.true_lang == r.pred_lang)
    # the synthetic corpus's per-language frequency tilt is weak (all
    # langs share one 31-token vocabulary): unigram NB tops out at ~0.39
    # here, confirmed by an independent pure-Python NB that reproduces
    # the engine's accuracy exactly — assert clearly above the 1/5
    # uniform-guess baseline
    assert correct / n_test > 0.25


def test_stump_gains_nonnegative_and_cells_consistent(spark):
    rows = QUERIES["decision_stump_split"](spark, SF_SMOKE).collect()
    assert len(rows) == 6
    for r in rows:
        assert r.n_l + r.n_r == rows[0].n_l + rows[0].n_r
        assert 0 <= r.pos_l <= r.n_l and 0 <= r.pos_r <= r.n_r
        assert r.info_gain >= -1e-9  # IG of any split is non-negative


def test_sprt_decisions_consistent_with_boundary(spark):
    rows = QUERIES["sprt_sequential_test"](spark, SF_SMOKE).collect()
    assert rows
    import math
    bound = math.log(19)
    for r in rows:
        if r.llr >= bound + 1e-6:
            assert r.decision == "accept_h1"
        elif r.llr <= -bound - 1e-6:
            assert r.decision == "accept_h0"
        assert r.n_treat >= 0 and r.n_ctrl >= 0


def test_markov_attribution_shares_form_distribution(spark):
    rows = QUERIES["markov_attribution"](spark, SF_SMOKE).collect()
    assert {r.channel for r in rows} == {"click", "error", "signup", "view"}
    for r in rows:
        # removing a channel reroutes its traffic to NULL, so conversion
        # probability can only drop: removal effects are non-negative
        assert r.removal_units >= 0
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-5


def test_hll_intersection_within_error_band(spark):
    # structural invariants hold at any scale: merged-register union
    # dominates each input sketch and never exceeds their sum
    r = QUERIES["hll_set_intersection"](spark, SF_SMOKE).collect()[0]
    assert r.exact_intersection > 0
    assert r.est_union <= r.est_purchasers + r.est_clickers + 1e-9
    assert r.est_union >= max(r.est_purchasers, r.est_clickers) - 1e-9
    # the ~6.5%-per-sketch error band only applies in HLL's design regime
    # n >> m (m = 256): assert it at sf0.1 (n = 1500), not at smoke scale
    # where raw HLL without the linear-counting branch overestimates
    big = QUERIES["hll_set_intersection"](spark, "/root/testdata/sf0.1").collect()[0]
    assert (
        abs(big.est_intersection - big.exact_intersection)
        < 0.25 * big.exact_intersection
    )
