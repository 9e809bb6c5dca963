"""Connected components over a pair list — turning near-dup PAIRS into
dedup GROUPS (every doc in a component keeps one representative).

Algorithm: iterative min-label propagation. Each node starts labeled with
itself; every round, each node takes the min label among itself and its
neighbors; stop when a round changes nothing. Rounds = graph diameter,
which for dedup graphs (tight cliques + chains of a few hops) is small.

Scale shape: each round is one join edges-to-labels + one min-aggregate —
both shuffles on the node id. Label state is checkpoint-truncated
(``localCheckpoint``) so the lineage doesn't grow with iterations — the
classic Spark iterative-algorithm pattern. The convergence check rides
the checkpoint job as an ``Observation`` metric, so each round costs
exactly one job and only a scalar ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    min node id reachable. Undirected."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # materialize once: every round joins against sym, and without this
        # each round would recompute the (possibly expensive) upstream
        # pair-generation plan from scratch
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        # neighbor labels: for node u, the labels of every v it touches
        nbr = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("u", "node")
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (F.col("comp") != F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                )).cast("long").alias("_changed"),
            )
        )
        # Piggyback the convergence metric on the checkpoint job itself
        # (Observation fires when the eager materialization runs) — one
        # Spark job per round instead of checkpoint + separate agg.
        obs = Observation()
        new_labels = new_labels.observe(
            obs, F.sum("_changed").alias("chg")
        ).localCheckpoint(eager=True)
        changed = obs.get["chg"] or 0
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def triangle_stats(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """Global triangle census over an undirected edge list (canonical
    ``src < dst`` rows): one row with node/edge/triangle counts and the
    global clustering coefficient.

    Algorithm: degree orientation (Chiba-Nishizeki / the MapReduce
    triangle-counting standard) — orient every edge from its lower-degree
    endpoint to its higher-degree one (ties by id), then count, for each
    oriented edge (u, v), the common OUT-neighbors |N+(u) & N+(v)| via
    per-node sorted adjacency arrays and `array_intersect`. Out-degrees
    are bounded by O(sqrt(m)) regardless of skew, so no adjacency array
    explodes on a celebrity node, and the per-edge intersection costs
    O(|N+(u)| + |N+(v)|) — total work O(m^1.5), the optimal combinatorial
    bound. Compared to wedge ENUMERATION (self-join on the apex, then a
    closing join), this moves edge-count rows instead of wedge-count rows
    through the shuffle — on a dense co-occurrence graph wedges outnumber
    edges ~30x, and that factor is exactly what the exchange saves. The
    adjacency table is node-sized (one array row per node) and typically
    broadcasts; at 100 TB it degrades to an ordinary hash join, still
    edge-count-sized.
    """
    # The edge list is consumed four times (degrees, both orientation
    # joins via deg, the wedge-closing join, the edge count); materialize
    # it once so the upstream pair-generation plan doesn't re-execute per
    # consumer — the same multi-pass materialization every graph engine
    # performs before triangle enumeration.
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da")
    db = deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    # adj is node-sized; not force-broadcast — AQE picks broadcast when it
    # fits and a hash join when a 100 TB graph's adjacency doesn't.
    adj = o.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    tri = (
        o.join(adj, "u")
        .join(
            adj.select(F.col("u").alias("v"), F.col("nbrs").alias("vnbrs")),
            "v",
        )
        .select(
            F.size(F.array_intersect(F.col("nbrs"), F.col("vnbrs"))).alias("nc")
        )
        .agg(F.sum("nc").alias("n_triangles"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        counts.join(F.broadcast(n_edges))
        .join(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering"),
        )
    )


def pagerank_units(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    iters: int = 5,
    units: int = 10**12,
) -> DataFrame:
    """PageRank over an undirected edge list, computed entirely in
    fixed-point integer arithmetic: ranks are BIGINT micro-units
    (1.0 == ``units``), damping 0.85 applied as *17 DIV 20, per-neighbor
    shares as integer floor division. Every operation is exact and
    deterministic, so ANY engine reproduces the result bit-for-bit — no
    float fold-order or ulp concerns, which is what makes an iterative
    numeric algorithm fully oracle-checkable (the same trick as the
    fixed-point embedding quantization).

    Shape per iteration: one join of the symmetric edge list against the
    rank table (shuffle on node id) + one sum aggregate — the standard
    Spark iterative pattern. The edge list is checkpoint-materialized
    once; 5 iterations = 5 shuffle rounds, independent of data size. On
    an undirected graph every node has out-degree >= 1, so there is no
    dangling-mass term.
    """
    # One pass builds everything iteration-invariant: symmetrize (the
    # input is canonical unique pairs, so the two directions cannot
    # collide — no dedup shuffle needed), compute out-degrees and a
    # first-row marker with two windows sharing ONE exchange on u, and
    # materialize. The node count rides the same job as an Observation —
    # zero extra actions before the iterations start.
    sym0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    wu = Window.partitionBy("u")
    wuo = Window.partitionBy("u").orderBy("v")
    obs = Observation()
    sym = (
        sym0.withColumn("outdeg", F.count(F.lit(1)).over(wu))
        .withColumn("_first", (F.row_number().over(wuo) == 1).cast("long"))
        .observe(obs, F.sum("_first").alias("n"))
        .localCheckpoint(eager=True)
    )
    n = int(obs.get["n"])  # scalar: rank seed + teleport term need it
    r = (
        sym.filter(F.col("_first") == 1)
        .select(F.col("u").alias("node"), F.lit(units // n).cast("long").alias("runits"))
    )
    base = (3 * units) // (20 * n)  # 0.15/N in units, floored
    # The rank table is node-sized and the checkpointed edge list has no
    # partitioning metadata (localCheckpoint erases outputPartitioning),
    # so a shuffle join would re-exchange ALL edges every round. N is
    # already on the driver: broadcast the ranks while they plausibly fit
    # an executor (~64 MB at the threshold), else fall back to the
    # per-round hash join every billion-node distributed PageRank pays.
    bcast_ranks = n <= 4_000_000
    for _ in range(iters):
        r_build = r.withColumnRenamed("node", "u")
        if bcast_ranks:
            r_build = F.broadcast(r_build)
        contrib = (
            sym.join(r_build, "u")
            .select(
                F.col("v").alias("node"),
                F.expr("runits * 17 DIV (20 * outdeg)").alias("c"),
            )
        )
        # Eagerly materialize the node-sized rank table each round:
        # without this, round k's broadcast subtree re-executes every
        # previous round's edge pass (lineage is cut, each iteration is
        # one bounded job over the cached edges).
        r = contrib.groupBy("node").agg(
            (F.lit(base) + F.sum("c")).cast("long").alias("runits")
        ).localCheckpoint(eager=True)
    return r


def min_label_rounds(
    edges: DataFrame, src: str = "a", dst: str = "b", iters: int = 5
) -> DataFrame:
    """Fixed-round min-label propagation: after round k each node is
    labeled with the minimum node id within k hops. Unlike
    ``connected_components`` (which iterates to convergence, a
    data-dependent stopping rule), the round count here is FIXED — which
    makes the result a pure deterministic function of the edge list, so
    a SQL oracle can reproduce it by unrolling the rounds as chained
    CTEs (same oracle pattern as the fixed-point PageRank). On graphs
    whose diameter <= iters the result IS the connected components.

    Shape per round: one join of the symmetric edge list against the
    node-sized label table + one min-aggregate, both shuffling node-id
    keyed rows; labels are checkpoint-truncated per round so lineage
    stays flat.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        nbr = (
            sym.join(
                labels.select(
                    F.col("node").alias("u"), F.col("label").alias("ul")
                ),
                "u",
            )
            .groupBy("v")
            .agg(F.min("ul").alias("nbr_label"))
            .withColumnRenamed("v", "node")
        )
        labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels
