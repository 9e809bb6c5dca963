"""Property tests for the sketch / selection tier: CMS overestimate
guarantee, quantile-normalization distribution equality, walk
determinism and validity."""

import os

from taxi_data_datapipeline_spark.queries import QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_cms_never_underestimates(spark):
    rows = QUERIES["cms_heavy_hitters"](spark, SF).collect()
    assert rows, "CMS top-k must be non-empty"
    assert all(r["est_cnt"] >= r["true_cnt"] for r in rows)


def test_quantile_normalization_matches_pooled_distribution(spark):
    """After normalization, each source's value multiset is exactly the
    pooled quantile values at its ranks — so every normalized value must
    exist in the pooled length distribution, and within each source the
    mapping must be monotone in the original length."""
    out = QUERIES["quantile_normalize_lengths"](spark, SF).collect()
    pooled = {
        r["n_chars"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("n_chars")
        .collect()
    }
    assert all(r["normalized_len"] in pooled for r in out)
    by_source: dict = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(
            (r["n_chars"], r["doc_id"], r["normalized_len"])
        )
    for rows in by_source.values():
        rows.sort()
        norms = [n for _, _, n in rows]
        assert norms == sorted(norms)  # monotone mapping


def test_walks_are_deterministic_and_valid(spark):
    """Two plans over the same data produce identical walk corpora, and
    every hop follows a real edge."""
    a = {r["start_node"]: r["path"] for r in QUERIES["hash_random_walks"](spark, SF).collect()}
    b = {r["start_node"]: r["path"] for r in QUERIES["hash_random_walks"](spark, SF).collect()}
    assert a == b
    from taxi_data_datapipeline_spark.queries_advanced import (
        _copurchase_edges_support,
    )

    edges = {
        (r["a"], r["b"])
        for r in _copurchase_edges_support(spark, SF).collect()
    }
    adj = set()
    for x, y in edges:
        adj.add((x, y))
        adj.add((y, x))
    for path in a.values():
        nodes = [int(n) for n in path.split("->")]
        assert len(nodes) == 4
        for u, v in zip(nodes, nodes[1:]):
            assert (u, v) in adj
