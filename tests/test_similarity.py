"""Similarity-search operator invariants on tiny synthetic vectors."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row

from taxi_data_datapipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    similarity_join_blas,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(7)
    rows = [
        Row(
            vec_id=i,
            label=str(i % 3),
            embedding=[rng.uniform(-1, 1) for _ in range(16)],
        )
        for i in range(60)
    ]
    return spark.createDataFrame(rows)


def test_full_multiprobe_equals_bruteforce(spark, vectors):
    """Probing every bucket (hamming radius = n_planes) must recover the
    exact brute-force top-k — multi-probe's recall ceiling is exactness."""
    qv = vectors.filter("vec_id = 0").first()["embedding"]
    exact = [(r.vec_id, r.cosine_sim) for r in brute_force_topk(vectors, qv, k=5).collect()]
    full_probe = [
        (r.vec_id, r.cosine_sim)
        for r in lsh_topk(vectors, qv, k=5, n_planes=3, multi_probe=3).collect()
    ]
    assert full_probe == exact


def test_multiprobe_monotone_recall(spark, vectors):
    """Wider probe radius never returns fewer of the true top-k."""
    qv = vectors.filter("vec_id = 0").first()["embedding"]
    exact_ids = {r.vec_id for r in brute_force_topk(vectors, qv, k=5).collect()}
    recalls = []
    for r in range(0, 4):
        got = {x.vec_id for x in lsh_topk(vectors, qv, k=5, n_planes=3, multi_probe=r).collect()}
        recalls.append(len(got & exact_ids))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 5


def test_ivf_self_hit(spark, vectors):
    """A vector's own list always contains it: querying with vector v
    returns v itself at similarity 1."""
    qv = vectors.filter("vec_id = 7").first()["embedding"]
    top = ivf_topk(vectors, qv, k=1, n_lists=8).collect()
    assert top[0].vec_id == 7
    assert math.isclose(top[0].cosine_sim, 1.0, abs_tol=1e-6)


def test_blas_join_threshold_and_symmetry(spark, vectors):
    out = similarity_join_blas(vectors, block_col="label", threshold=0.2).collect()
    assert all(r.cosine_sim >= 0.2 for r in out)
    assert all(r.id_a < r.id_b for r in out)


def test_srp_constants_match_live_derivation(spark):
    """functions/srp_constants.py (used verbatim by the DuckDB oracles for
    the LSH/IVF ANN queries) must equal the engine's live
    xxhash64(plane, dim)/2^63 derivation — drift here would silently turn
    the oracle into a different algorithm."""
    from pyspark.sql import functions as F

    from taxi_data_datapipeline_spark.functions.srp_constants import SRP_COMPONENTS

    live = (
        spark.range(16)
        .withColumnRenamed("id", "p")
        .crossJoin(spark.range(64).withColumnRenamed("id", "d"))
        .select(
            "p",
            "d",
            (
                F.xxhash64(F.col("p").cast("int"), F.col("d").cast("int")).cast("double")
                / F.lit(float(2**63))
            ).alias("c"),
        )
        .collect()
    )
    for r in live:
        assert SRP_COMPONENTS[r["p"]][r["d"]] == r["c"], (r["p"], r["d"])


def test_ivf_lists_actually_spread(spark, vectors):
    """Regression for the transform-lambda arity bug: a two-parameter
    lambda got the array INDEX bound to the plane id, collapsing every
    projection to the same value and every vector into list 0 (IVF then
    scans the whole corpus). The quantizer must spread vectors over many
    lists."""
    from pyspark.sql import functions as F

    from taxi_data_datapipeline_spark.operators.similarity import ivf_bucket

    dims = len(vectors.first()["embedding"])
    lists = (
        vectors.withColumn("lst", ivf_bucket(F.col("embedding"), dims, 16))
        .select("lst")
        .distinct()
        .count()
    )
    assert lists >= 8, f"only {lists} distinct IVF lists — quantizer collapsed"
