"""Structural property pins for the round-6 query additions — the
invariants the value-hash oracle can't state (it only proves both
engines agree; these prove the SHAPE is the intended one)."""

from __future__ import annotations

from taxi_data_datapipeline_spark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def test_cusum_changepoint_is_proper_split(spark):
    rows = QUERIES["cusum_changepoint"](spark, SF_SMOKE).collect()
    assert rows, "at least one event type"
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types)), "one changepoint per type"
    for r in rows:
        assert r.n_days >= 2
        assert r.cusum_units >= 0
        # the excluded-last-point rule guarantees both sides are non-empty
        assert r.mean_before is not None and r.mean_after is not None


def test_bh_rejections_form_rank_prefix(spark):
    rows = QUERIES["bh_sign_trend"](spark, SF_SMOKE).collect()
    assert rows
    by_rank = sorted(rows, key=lambda r: r.bh_rank)
    ranks = [r.bh_rank for r in by_rank]
    assert ranks == list(range(1, len(rows) + 1))
    # step-up: the reject set is exactly a prefix of the p-sorted order
    flags = [r.reject for r in by_rank]
    assert all(f in (0, 1) for f in flags)
    if 1 in flags:
        last = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: last + 1])
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        assert 0 <= r.n_up <= r.n_pairs


def test_t_closeness_bounded_and_flag_consistent(spark):
    rows = QUERIES["t_closeness_audit"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.t_closeness <= 1.0 + 1e-9
        assert r.breach == (1 if r.t_closeness > 0.15 else 0)
        assert r.group_size >= 1


def test_ahash_pairs_canonical_and_within_radius(spark):
    rows = QUERIES["multimodal_ahash_dedup"](spark, SF_SMOKE).collect()
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))


def test_conformal_coverage_near_nominal(spark):
    rows = QUERIES["conformal_event_interval"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_covered <= r.n_test
        # finite-sample guarantee: coverage >= 90% - slack for tiny test splits
        if r.n_test >= 50:
            assert r.coverage >= 0.80
        assert r.interval_halfwidth >= 0


def test_shapley_efficiency_exact(spark):
    rows = QUERIES["shapley_attribution"](spark, SF_SMOKE).collect()
    assert rows
    k = rows[0].n_channels
    fact = 1
    for i in range(2, k + 1):
        fact *= i
    total_units = sum(r.shapley_units for r in rows)
    # efficiency: sum of Shapley values = k! * v(grand coalition), exactly
    assert total_units == fact * rows[0].n_attributed
    assert abs(sum(r.credit_share for r in rows) - 1.0) < 1e-9


def test_rrf_fusion_weights_consistent(spark):
    from taxi_data_datapipeline_spark.queries_data import _RRF_W

    rows = QUERIES["rrf_hybrid_rank"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    units = [r.rrf_units for r in rows]
    assert units == sorted(units, reverse=True)
    for r in rows:
        expect = (_RRF_W.get(r.dense_rank, 0) if r.dense_rank else 0) + (
            _RRF_W.get(r.sparse_rank, 0) if r.sparse_rank else 0
        )
        assert r.rrf_units == expect
        assert r.dense_rank is not None or r.sparse_rank is not None
