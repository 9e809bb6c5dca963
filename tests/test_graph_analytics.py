"""Triangle census + fixed-point PageRank on graphs with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.graphs import (
    pagerank_units,
    triangle_stats,
)

# K4 on {1,2,3,4} (4 triangles) plus a pendant node 5 hanging off 4 and an
# isolated edge 6-7: 4 triangles, 8 edges, 7 nodes.
EDGES = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    (4, 5),
    (6, 7),
]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "a long, b long")


def test_triangle_census_known_graph(spark):
    row = triangle_stats(_edges_df(spark)).collect()[0]
    assert row.n_nodes == 7
    assert row.n_edges == 8
    assert row.n_triangles == 4
    # wedges: degs 3,3,3,4,1,1,1 -> C(3,2)*3 + C(4,2) + 0*3 = 9 + 6 = 15
    assert row.clustering == round(3.0 * 4 / 15, 6)


def test_triangle_census_triangle_free(spark):
    # a path 1-2-3-4 has wedges but no triangles
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    row = triangle_stats(path).collect()[0]
    assert row.n_triangles == 0
    assert row.clustering == 0.0


def test_pagerank_mass_conservation_and_symmetry(spark):
    r = pagerank_units(_edges_df(spark)).collect()
    ranks = {row.node: row.runits for row in r}
    assert set(ranks) == {1, 2, 3, 4, 5, 6, 7}
    # total mass stays ~1.0 (floor divisions only ever LOSE units)
    total = sum(ranks.values())
    assert 0.999 * 10**12 < total <= 10**12
    # symmetric roles get identical ranks (1,2,3 interchangeable; 6,7 too)
    assert ranks[1] == ranks[2] == ranks[3]
    assert ranks[6] == ranks[7]
    # the K4 hub with the pendant outranks the K4 rim, which outranks the
    # pendant and the isolated pair
    assert ranks[4] > ranks[1] > ranks[5]
    assert ranks[1] > ranks[6]


def test_pagerank_is_deterministic_across_partitionings(spark):
    e = _edges_df(spark)
    r1 = {(row.node, row.runits) for row in pagerank_units(e).collect()}
    r2 = {
        (row.node, row.runits)
        for row in pagerank_units(e.repartition(13)).collect()
    }
    assert r1 == r2


def test_min_label_rounds_respects_hop_limit(spark):
    from taxi_data_datapipeline_spark.operators.graphs import min_label_rounds

    # path 1-2-3-4-5-6-7: after k rounds node i holds min id within k hops
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "a long, b long"
    )
    l1 = {r.node: r.label for r in min_label_rounds(path, iters=1).collect()}
    assert l1 == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6}
    l3 = {r.node: r.label for r in min_label_rounds(path, iters=3).collect()}
    # 3 rounds of min-propagation double reach via relabeled neighbors:
    # label(v) after k rounds = min over nodes whose chain of k steps
    # reaches v; on a path that closes the whole prefix quickly
    assert l3[1] == 1 and l3[7] <= 4


def test_min_label_rounds_converges_to_components(spark):
    from taxi_data_datapipeline_spark.operators.graphs import min_label_rounds

    labels = {
        r.node: r.label
        for r in min_label_rounds(_edges_df(spark), iters=4).collect()
    }
    # K4+pendant collapses to 1; the isolated edge to 6
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6}


def test_bfs_depths_path_graph(spark):
    from taxi_data_datapipeline_spark.operators.graphs import bfs_depths

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "a long, b long"
    )
    d = {r.node: r.depth for r in bfs_depths(path, 1, iters=4).collect()}
    assert d == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}  # nodes beyond 4 hops absent


def test_bfs_depths_branching(spark):
    from taxi_data_datapipeline_spark.operators.graphs import bfs_depths

    d = {r.node: r.depth for r in bfs_depths(_edges_df(spark), 1, iters=2).collect()}
    # K4 neighbors at 1 hop, pendant 5 at 2 (via 4); 6/7 unreachable
    assert d == {1: 0, 2: 1, 3: 1, 4: 1, 5: 2}


def test_kcore_peels_to_the_clique(spark):
    from taxi_data_datapipeline_spark.operators.graphs import kcore_nodes

    out = {
        r.node: r.degree
        for r in kcore_nodes(_edges_df(spark), k=3, rounds=3).collect()
    }
    # the 3-core of K4+pendant+isolated edge is exactly the K4
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_empty_when_k_exceeds_density(spark):
    from taxi_data_datapipeline_spark.operators.graphs import kcore_nodes

    assert kcore_nodes(_edges_df(spark), k=4, rounds=3).count() == 0


def test_star_cc_matches_propagation_on_random_graphs(spark):
    """Alternating star contraction and min-label propagation must label
    identically on graphs where both converge."""
    import random

    from taxi_data_datapipeline_spark.operators.graphs import (
        connected_components,
        connected_components_star,
    )

    rnd = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(40 + 10 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        prop = {r.node: r.comp for r in connected_components(df).collect()}
        star = {r.node: r.comp for r in connected_components_star(df).collect()}
        assert star == prop, f"trial {trial}"


def test_star_cc_long_chain_beyond_propagation_reach(spark):
    """A 512-node path has diameter 511: min-label propagation at the
    default budget (20 iterations x 2 rounds) provably cannot close it,
    while star contraction needs O(log n) alternations. The star result
    must label every node with the chain head."""
    from taxi_data_datapipeline_spark.operators.graphs import (
        connected_components_star,
    )

    n = 512
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = {r.node: r.comp for r in connected_components_star(df).collect()}
    assert len(out) == n
    assert set(out.values()) == {0}


def test_star_cc_cliques_and_isolated_pairs(spark):
    from taxi_data_datapipeline_spark.operators.graphs import (
        connected_components_star,
    )

    edges = (
        [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]  # clique
        + [(100, 101), (200, 201)]  # disjoint pairs
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = {r.node: r.comp for r in connected_components_star(df).collect()}
    assert all(out[x] == 10 for x in range(10, 15))
    assert out[100] == 100 and out[101] == 100
    assert out[200] == 200 and out[201] == 200
