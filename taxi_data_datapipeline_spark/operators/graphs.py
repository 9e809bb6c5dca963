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

from pyspark.sql import DataFrame, Observation
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
