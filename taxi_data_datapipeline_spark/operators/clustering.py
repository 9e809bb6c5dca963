"""Iterative k-means (Lloyd's algorithm) over an embedding column.

The other iterative-algorithm tier next to connected components
(operators/graphs.py): a driver-side loop over fully distributed steps.
Per iteration (r12: assign + update FUSED into one vectorized pass,
see _assign_partials):

1. **assign** — nearest-centroid as one batch numpy matmul against the
   k x dim centroid matrix (centroids ride into the closure as
   literals — no join, no shuffle). The final output pass still uses
   the JVM literal-centroid expression (_assign/_assign_units) so the
   returned DataFrame stays pure-Column.
2. **update** — batch-local (cluster, dim) partial sums in the SAME
   pass -> groupBy(cluster, dim) over k x dim x n_batches rows ->
   rebuilt into ordered arrays on the driver (k x dim values — bytes,
   not data).

Per-iteration driver traffic is exactly the k x dim centroid matrix, the
irreducible state of Lloyd's algorithm; everything row-shaped stays
distributed. At 100 TB each iteration is one scan + one
aggregate-to-k*dim-rows shuffle.

Convergence / quality is asserted differentially against a NumPy
reference implementation in tests/test_clustering.py (same seeds, same
iteration count) — float fold order differs across engines, so this is
test-verified rather than oracle-hashed.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.similarity import dot


def _assign_partials(
    df: DataFrame,
    vec_col: str,
    centroid_rows: list[tuple[int, list]],
    integer: bool,
    with_d2: bool,
) -> DataFrame:
    """Fused assignment + (cluster, dim) partial sums in ONE vectorized
    pass (r12 optimization, guide §4.2): nearest-centroid assignment runs
    as a batch numpy matmul inside the same mapInPandas that computes the
    centroid-update partials, instead of a separate JVM pass whose
    per-row higher-order-function distance fold (aggregate over zip_with,
    interpreted — never whole-stage-codegen'd) dominated every iteration.

    Exactness: the INTEGER path is bit-identical to the JVM fold by
    construction (int64 arithmetic is fold-order-free; ties break to the
    lowest cluster id in both — array_min on (d2, cid) structs and
    np.argmin both pick the first minimum of the cid-sorted candidate
    list). The FLOAT path's distances may differ from the JVM fold in
    final ulps (numpy pairwise summation vs in-order fold), which can
    only matter on exact distance ties — the same tolerance the
    differential test has always granted the float tier; the partial
    SUMS per (cluster, batch) remain the identical numpy column-sums as
    before, so equal assignments give bit-equal centroids."""
    import numpy as np
    import pandas as pd

    sum_t = "long" if integer else "double"
    np_t = np.int64 if integer else np.float64
    cids = [cid for cid, _ in centroid_rows]
    cmat = np.array([v for _, v in centroid_rows], dtype=np_t)
    dims = cmat.shape[1]
    schema = f"cluster int, dim int, s {sum_t}, n long"
    if with_d2:
        schema += ", d2s long" if integer else ", d2s double"

    def gen(it):
        c2 = (cmat * cmat).sum(axis=1)
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np_t)
            d2 = (x * x).sum(axis=1)[:, None] - 2 * (x @ cmat.T) + c2[None, :]
            lab = d2.argmin(axis=1)
            for j, cid in enumerate(cids):
                sel = lab == j
                if not sel.any():
                    continue
                m = x[sel]
                out = {
                    "cluster": np.full(dims, int(cid), dtype=np.int32),
                    "dim": np.arange(dims, dtype=np.int32),
                    "s": m.sum(axis=0),
                    "n": np.full(dims, len(m), dtype=np.int64),
                }
                if with_d2:
                    d2s = np.zeros(dims, dtype=np_t)
                    d2s[0] = d2[sel, j].sum()
                    out["d2s"] = d2s
                yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema)


def _assign(df: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """Add `cluster` (nearest centroid index) and `d2` (squared L2 to it)."""
    ev = F.col(vec_col)
    self_dot = dot(ev, ev)
    alts: list[Column] = []
    for k, c in enumerate(centroids):
        cv = F.array(*[F.lit(float(x)) for x in c])
        d2 = self_dot - 2 * dot(ev, cv) + F.lit(sum(x * x for x in c))
        alts.append(F.struct(d2.alias("d2"), F.lit(k).alias("k")))
    best = F.array_min(F.array(*alts))
    return (
        df.withColumn("_b", best)
        .withColumn("cluster", F.col("_b.k"))
        .withColumn("d2", F.col("_b.d2"))
        .drop("_b")
    )


def lloyd_kmeans(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[float]]:
    """Run `iters` Lloyd iterations seeded from the first k rows by
    `id_col`. Returns (assigned DataFrame with cluster/d2, per-iteration
    inertia history). The returned DataFrame is lazily re-derivable —
    only k x dim centroids and one inertia double per iteration ever
    reach the driver."""
    seeds = df.filter(F.col(id_col) < k).select(id_col, vec_col).collect()
    centroids = [
        [float(x) for x in r[vec_col]]
        for r in sorted(seeds, key=lambda r: r[id_col])
    ]
    dims = len(centroids[0])
    inertia_hist: list[float] = []

    # Persist the projected input for the life of the loop (guide §5:
    # iterative algorithms re-read their input once per iteration —
    # without this every iteration re-pays the parquet scan + fan-out
    # exchange). Unpersisted before return; the RETURNED frame derives
    # from the raw scan, so nothing cached outlives the algorithm.
    v64 = df.select(
        F.col(vec_col).cast("array<double>").alias("_v64")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(iters):
        # assignment + inertia + new centroids in ONE fused vectorized
        # pass (see _assign_partials) -> one k*dims-row groupBy; only
        # the centroid matrix reaches the driver.
        stats = (
            _assign_partials(
                v64,
                "_v64",
                list(enumerate(centroids)),
                integer=False,
                with_d2=True,
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum("s").alias("s_sum"),
                F.sum("n").alias("n"),
                F.sum("d2s").alias("d2_sum"),
            )
            .collect()
        )
        by_cluster: dict[int, list[float]] = {}
        inertia = 0.0
        for r in stats:
            by_cluster.setdefault(r["cluster"], [0.0] * dims)[r["dim"]] = (
                r["s_sum"] / r["n"]
            )
            inertia += r["d2_sum"]  # nonzero only on each partial's dim-0 row
        inertia_hist.append(inertia)
        centroids = [
            by_cluster.get(i, centroids[i]) for i in range(k)
        ]  # empty cluster keeps its old centroid

    v64.unpersist(blocking=False)
    return _assign(df, centroids, vec_col), inertia_hist


def _trunc_div(s: int, n: int) -> int:
    """Truncating integer division (toward zero) — matches SQL DIV /
    DuckDB ``//`` on negative sums, unlike Python's flooring ``//``."""
    q = abs(s) // n
    return -q if s < 0 else q


def _assign_units(xu: DataFrame, centroids: dict[int, list[int]]) -> DataFrame:
    """Nearest-centroid assignment in exact BIGINT arithmetic: squared
    L2 distance as an in-order integer fold, argmin via array_min over
    (d2u, cid) structs (ties -> lowest cid). Mapper-only: centroids are
    literals, no join, no shuffle."""
    alts = []
    for cid in sorted(centroids):
        cv = F.array(*[F.lit(int(c)) for c in centroids[cid]])
        d2u = F.aggregate(
            F.zip_with(F.col("v"), cv, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        alts.append(F.struct(d2u.alias("d2u"), F.lit(cid).alias("k")))
    best = F.array_min(F.array(*alts))
    return (
        xu.withColumn("_b", best)
        .withColumn("cluster", F.col("_b.k"))
        .withColumn("d2u", F.col("_b.d2u"))
        .drop("_b")
    )


def lloyd_kmeans_units(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1 << 20,
) -> DataFrame:
    """Lloyd's k-means entirely in BIGINT fixed-point: components enter
    integer units (floor to 2^-20), distances are exact integer sums,
    and centroid updates are truncating integer divisions — so every
    iteration is a pure deterministic function of the input and ANY
    engine reproduces the final assignment bit-for-bit (the same trick
    that makes the fixed-point PageRank oracle-checkable; float Lloyd
    can only ever be differentially tested because mean() fold order
    moves ulps across partitionings).

    Semantics mirrored by the SQL oracle: seeds = the k lowest ids'
    vectors; ties in assignment break to the lowest cluster id; a
    cluster that loses all members is DROPPED (not re-seeded).

    Scale shape per iteration: one mapper-only assignment pass
    (centroid literals — no join) + one groupBy(cluster, dim) whose
    result is k x dims rows; only that centroid matrix reaches the
    driver, the irreducible state of Lloyd's algorithm.
    """
    xu = df.select(
        id_col,
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))),
        ).alias("v"),
    )
    seeds = xu.filter(F.col(id_col) < k).select(id_col, "v").collect()
    centroids = {int(r[id_col]): [int(x) for x in r["v"]] for r in seeds}
    dims = len(next(iter(centroids.values())))
    vu = xu.select("v").persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(iters):
        # Fused assignment + batch-local int64 partial sums in ONE
        # vectorized pass (exact — units ~ 2^20, dots <= dims * 2^40 and
        # sums over any realistic block count stay far inside int64), so
        # the exchange carries k x dims x n_batches rows instead of
        # rows x dims tuples AND the per-row interpreted JVM distance
        # fold is gone; the summed (cluster, dim) totals — and hence
        # every centroid — are bit-identical to the plan this replaces.
        stats = (
            _assign_partials(
                vu,
                "v",
                sorted(centroids.items()),
                integer=True,
                with_d2=False,
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        newc: dict[int, list[int]] = {}
        for r in stats:
            newc.setdefault(r["cluster"], [0] * dims)[r["dim"]] = _trunc_div(
                int(r["s"]), int(r["n"])
            )
        centroids = newc  # empty clusters drop, mirroring the SQL
    vu.unpersist(blocking=False)
    return _assign_units(xu, centroids).select(id_col, "cluster", "d2u")


def cluster_block_semdedup(
    assigned: DataFrame,
    num: int = 9,
    den: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "v",
    cells_per_chunk: int = 4_000_000,
) -> DataFrame:
    """SemDeDup's within-cluster duplicate marking (Abbas et al., arXiv
    2303.09540) as ONE grouped-map pass: ``assigned`` carries
    (id, cluster, integer-unit vector); the result is the distinct ids
    that have a LOWER-id vector in the same cluster with
    cos^2 >= num/den (and dot > 0) — the paper's greedy drop rule.

    Each cluster block becomes a numpy int64 Gram matrix (``M @ M.T`` is
    EXACT: 2^-20-unit coordinates give |dot| <= 64 * 2^40 = 2^46, well
    inside int64), so the quadratic stage runs as one C-speed matmul per
    cluster instead of per-pair array lambdas — measured 13x faster than
    the zip_with/aggregate expression form at sf0.1 (7.3 s -> 0.54 s for
    ~500k pairs) while returning the bit-identical dup set. The
    den*dot^2 >= num*|a|^2*|b|^2 test reaches ~2^99, beyond float64's
    53-bit mantissa, so floats only PREFILTER with a 1e-9 relative
    margin (~1e6 x float64's worst-case product error); pairs inside the
    margin are re-checked in exact Python integers. No float decides any
    boundary — the no-float-cosine guarantee of the SQL form survives.

    Scale shape: shuffle on cluster (the one shuffle the stage needs).
    The Gram never materializes as a c x c matrix: rows are processed in
    chunks of ~4M cells (chunk x c tiles, <= ~32 MB of int64 each), so
    per-group MEMORY is O(c * dims + chunk * c) — linear in the cluster —
    while results stay bit-identical (each tile sees the same exact int64
    dots). CPU within a cluster is inherently quadratic (that IS
    SemDeDup); the paper's k ~ n/500 scaling keeps cluster sizes, and
    hence per-cluster CPU, ~constant as the corpus grows — the fixed-k
    evaluation queries deliberately do NOT rescale k, which is why the
    sf1->sf3->sf6 ladder shows their documented ~quadratic growth
    (bench_history/scale_ratio_r9_sf6.json: 3.6x at 2x data)."""
    import numpy as np
    import pandas as pd

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.array(pdf[vec_col].tolist(), dtype=np.int64)[order]
        n = len(ids)
        norms = np.einsum("ij,ij->i", M, M)  # int64-exact |v|^2 (<= 2^46)
        nf = norms.astype(np.float64)
        dup_col = np.zeros(n, dtype=bool)
        chunk = max(1, cells_per_chunk // max(n, 1))
        cols = np.arange(n)[None, :]
        for s in range(0, n, chunk):
            t = min(s + chunk, n)
            G = M[s:t] @ M.T  # (t-s, n) tile, exact int64
            Gf = G.astype(np.float64)
            lhs = float(den) * Gf * Gf
            rhs = float(num) * np.outer(nf[s:t], nf)
            tri = np.arange(s, t)[:, None] < cols  # strict upper: i < j
            pos = G > 0
            clear_yes = pos & tri & (lhs > rhs * (1 + 1e-9))
            border = pos & tri & ~clear_yes & (lhs >= rhs * (1 - 1e-9))
            dup = clear_yes
            for i, j in zip(*np.nonzero(border)):
                d, na, nb = int(G[i, j]), int(norms[s + i]), int(norms[j])
                if den * d * d >= num * na * nb:
                    dup[i, j] = True
            dup_col |= dup.any(axis=0)
        return pd.DataFrame({id_col: ids[np.nonzero(dup_col)[0]]})

    return assigned.groupBy("cluster").applyInPandas(
        block, f"{id_col} long"
    ).distinct()
