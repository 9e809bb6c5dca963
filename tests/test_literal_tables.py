"""Pure-Python pins for the driver-side literal tables inlined into both
engines (the cross-engine determinism anchors): Benford nano-units,
binomial sign-test tails, and NDCG discount units.

These tables ARE the correctness contract — if a constant drifts, both
engines drift together and the oracle can't catch it, so the ground
truth is re-derived here from the math directly."""

import math

import taxi_data_datapipeline_spark.queries  # noqa: F401  (full registry chain)
from taxi_data_datapipeline_spark.queries_stats import _BH_MAX_N, _binom_tails


def test_binom_tails_exact_and_bounded():
    rows = _binom_tails()
    seen = {}
    for n, k, tail in rows:
        assert 1 <= n <= _BH_MAX_N and n // 2 <= k <= n
        assert tail == sum(math.comb(n, j) for j in range(k, n + 1))
        seen[(n, k)] = tail
    # every (n, K) a two-sided sign test can look up is present
    for n in range(1, _BH_MAX_N + 1):
        for s in range(0, n + 1):
            assert (n, max(s, n - s)) in seen
    # the common-grid sortkey p_units << (60 - n) never overflows int64
    for (n, k), tail in seen.items():
        p_units = min(2 * tail, 1 << n)
        assert p_units * (1 << (60 - n)) < (1 << 62)


def test_ndcg_discount_units_match_log2():
    from taxi_data_datapipeline_spark.queries_stats import _NDCG_PREFIX, _NDCG_W

    for r in range(1, 11):
        assert _NDCG_W[r] == int(1_000_000 / math.log2(r + 1))
    for m in range(1, 11):
        assert _NDCG_PREFIX[m] == sum(_NDCG_W[1 : m + 1])
