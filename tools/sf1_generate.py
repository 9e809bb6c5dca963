"""Generate an sf1 dataset (10x sf0.1) for scale validation, entirely
derived from the driver's read-only sf0.1 parquet — written to
``.scale/sf1/`` inside the repo (gitignored; ~170 MB).

Construction = key-shifted replication, the standard scale-up that
preserves every distribution while growing entity counts linearly
(TPC-H itself scales customer/supplier/part/orders/lineitem linearly
with SF; region/nation stay fixed):

* region/nation: copied (fixed-size dims at every SF).
* customer/supplier/part/orders/lineitem/events: 10 replicas, every
  key column shifted by ``replica * stride`` with one stride per key
  space, so referential integrity holds WITHIN each replica and join
  fanouts stay exactly what they were at sf0.1 (a 10x-data join does
  10x work — the linear baseline scale validation needs).
* events: user_id shifted too (10x users, per-user series length
  unchanged — sessionization/window work scales linearly, matching
  how a 10x corpus adds users rather than making each user 10x
  longer).
* documents: replica i > 0 rewrites every token by suffixing ``~i``,
  so replicas are DISJOINT in shingle space: the within-replica
  near-dup structure is preserved exactly and cross-replica false
  candidates are impossible — total near-dup work is exactly 10x,
  which is the honest linear yardstick (verbatim replication would
  manufacture quadratic duplicate clusters that no real 10x corpus
  has).
* embeddings: vec_id shifted; each replicated vector gets a tiny
  deterministic per-(replica, dimension) perturbation so ANN top-k
  never degenerates into 10-way exact ties.

Deterministic end to end (no RNG, xxhash-derived perturbations).

Usage: python tools/sf1_generate.py [--out .scale/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

# Key strides: comfortably above each sf0.1 key range so replica key
# spaces never collide (max observed keys: custkey 15e3, suppkey 1e3,
# partkey 2e4, orderkey ~6e5, event_id 1e5, user_id ~?, doc_id 5e3,
# vec_id 2e3 — strides are 10x-headroom round numbers).
STRIDE = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def shifted(df, i: int, cols: dict[str, str]):
    out = df
    for col, space in cols.items():
        out = out.withColumn(col, (F.col(col) + F.lit(i * STRIDE[space])).cast("long"))
    return out


def replicate(df, factor: int, cols: dict[str, str], extra=None):
    parts = []
    for i in range(factor):
        p = shifted(df, i, cols)
        if extra is not None:
            p = extra(p, i)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    k = args.factor
    os.makedirs(args.out, exist_ok=True)

    spark = get_spark("sf1_generate")
    t0 = time.time()

    def w(df, name, parts=8):
        # Several output files => the scan splits across executors at
        # read time even for single-row-group-sized tables.
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{name}.parquet")
        )
        print(f"  {name}: {df.count()} rows", flush=True)

    rd = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")

    # Fixed dims.
    for t in ("region", "nation"):
        rd(t).write.mode("overwrite").parquet(os.path.join(args.out, f"{t}.parquet"))
        print(f"  {t}: copied", flush=True)

    w(replicate(rd("customer"), k, {"c_custkey": "custkey"}), "customer", 4)
    w(replicate(rd("supplier"), k, {"s_suppkey": "suppkey"}), "supplier", 2)
    w(replicate(rd("part"), k, {"p_partkey": "partkey"}), "part", 4)
    w(
        replicate(rd("orders"), k, {"o_orderkey": "orderkey", "o_custkey": "custkey"}),
        "orders",
        8,
    )
    w(
        replicate(
            rd("lineitem"),
            k,
            {
                "l_orderkey": "orderkey",
                "l_partkey": "partkey",
                "l_suppkey": "suppkey",
            },
        ),
        "lineitem",
        16,
    )
    w(
        replicate(
            rd("events"), k, {"event_id": "event_id", "user_id": "user_id"}
        ),
        "events",
        8,
    )

    def doc_extra(p, i):
        if i == 0:
            return p
        # Token-space remap: every token gets a per-replica suffix, so
        # shingle sets across replicas are disjoint.
        return p.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", rf"$1~{i}")
        ).withColumn("n_chars", F.length("text"))

    w(replicate(rd("documents"), k, {"doc_id": "doc_id"}, doc_extra), "documents", 8)

    def emb_extra(p, i):
        if i == 0:
            return p
        # +/- up to ~1e-3 per dimension, deterministic in (vec_id, i, dim).
        return p.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, j: (
                    x
                    + (
                        F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i), j), F.lit(2001))
                        - 1000
                    ).cast("float")
                    / 1e6
                ).cast("float"),
            ),
        )

    w(replicate(rd("embeddings"), k, {"vec_id": "vec_id"}, emb_extra), "embeddings", 4)

    print(f"sf1 written to {args.out} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
