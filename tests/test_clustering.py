"""Lloyd k-means: differential test against a NumPy reference (same
seeds, same iteration count) + monotone inertia."""

from __future__ import annotations

import numpy as np

from taxi_data_datapipeline_spark.operators.clustering import lloyd_kmeans
from taxi_data_datapipeline_spark.queries import load

SF = "/root/testdata/sf0.001"


def _numpy_lloyd(X, k, iters):
    C = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        inertia = d2[np.arange(len(X)), lab].sum()
        for i in range(k):
            if (lab == i).any():
                C[i] = X[lab == i].mean(axis=0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1), inertia


def test_lloyd_matches_numpy_reference(spark):
    emb = load(spark, SF, "embeddings")
    rows = sorted(
        ((r["vec_id"], [float(x) for x in r["embedding"]]) for r in emb.collect())
    )
    X = np.array([v for _, v in rows], dtype=np.float64)
    ids = [i for i, _ in rows]

    assigned, hist = lloyd_kmeans(emb, k=4, iters=3)
    got = {
        r["vec_id"]: r["cluster"]
        for r in assigned.select("vec_id", "cluster").collect()
    }
    labels, _ = _numpy_lloyd(X, k=4, iters=3)
    want = dict(zip(ids, labels))

    mismatches = sum(1 for i in ids if got[i] != want[i])
    # Ties / float fold order can flip points sitting on boundaries; with
    # continuous random embeddings there should be none.
    assert mismatches == 0, f"{mismatches} label mismatches"
    # Lloyd's guarantee: inertia never increases.
    assert all(b <= a * (1 + 1e-12) for a, b in zip(hist, hist[1:])), hist


def test_semdedup_chunked_gram_matches_monolithic(spark):
    """The row-chunked Gram tiles (per-group memory O(chunk*c), ADVICE-class
    100 TB fix: a hot cluster previously built a c x c int64 matrix) must
    return the bit-identical dup set as a single-tile run. 600 vectors in
    ONE cluster with planted exact duplicates and near-boundary pairs;
    cells_per_chunk=1200 forces 2-row tiles (300 chunks), the default is a
    single tile at this size."""
    import pandas as pd

    from taxi_data_datapipeline_spark.operators.clustering import (
        cluster_block_semdedup,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(-(2 ** 18), 2 ** 18, size=(200, 16), dtype=np.int64)
    rows = []
    vid = 0
    for i in range(200):
        rows.append((vid, 0, [int(x) for x in base[i]])); vid += 1
        # exact duplicate (cos = 1) of every 5th vector
        if i % 5 == 0:
            rows.append((vid, 0, [int(x) for x in base[i]])); vid += 1
        # scaled copy (cos = 1, different norm) of every 7th
        if i % 7 == 0:
            rows.append((vid, 0, [int(x * 3) for x in base[i]])); vid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "cluster", "v"])
    )
    mono = cluster_block_semdedup(df, num=9, den=100)
    tiled = cluster_block_semdedup(df, num=9, den=100, cells_per_chunk=1200)
    a = sorted(r["vec_id"] for r in mono.collect())
    b = sorted(r["vec_id"] for r in tiled.collect())
    assert a == b and len(a) > 0, (len(a), len(b))
