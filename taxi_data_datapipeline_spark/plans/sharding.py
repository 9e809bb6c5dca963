"""Training-shard writer: content-hashed shards + a verification manifest.

The last mile of a training-data pipeline: materialize the curated
corpus as N reproducible shards a trainer can stream independently.
Shard assignment is CONTENT-hashed (md5 of a stable key), never
row-order- or partition-dependent, so a rerun over the same corpus
produces byte-identical shard membership regardless of cluster geometry
— the same determinism contract as the shard_assignment query.

The manifest records per-shard row counts and an order-insensitive
content checksum (XOR-fold of per-row 60-bit md5 prefixes — commutative, so it
is partition-order independent), which is what lets a consumer verify a
shard without re-reading the whole corpus and lets an incremental rerun
prove "nothing changed".
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_column(key, n_shards: int):
    """Deterministic shard id from a stable key column: first 8 md5 hex
    chars -> int -> mod n. Pure engine-independent arithmetic."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % n_shards
    ).cast("int")


def write_training_shards(
    df: DataFrame,
    key: str,
    out_dir: str,
    n_shards: int = 16,
) -> dict:
    """Write ``df`` as ``n_shards`` hash-sharded parquet partitions plus
    ``manifest.json``. Returns the manifest dict.

    One shuffle (repartition on the shard id); each shard writes from
    its own partition, so shard files are as parallel as the cluster.
    The checksum aggregates BEFORE the write from the same shuffled
    frame, riding the job that already exists.
    """
    sharded = df.withColumn("shard", shard_column(F.col(key), n_shards))
    # Data under out_dir/data, manifest beside it — a JSON file inside
    # the parquet root would break naive directory scans.
    sharded.repartition(n_shards, "shard").write.partitionBy(
        "shard"
    ).mode("overwrite").parquet(os.path.join(out_dir, "data"))

    # 15 hex chars = 60 bits: conv() output stays inside int64
    # (16 chars can exceed 2^63-1 and ANSI-fail the bigint cast).
    half = F.substring(F.md5(F.col(key).cast("string")), 1, 15)
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # XOR-fold of per-row md5 prefixes: commutative + associative,
            # hence independent of partitioning and arrival order. bit_xor
            # is a real (partial+merge) aggregate: constant memory per
            # shard, vs collect_list which would buffer every row hash of
            # a ~10^9-row shard on one executor before folding.
            F.bit_xor(F.conv(half, 16, 10).cast("bigint")).alias("checksum"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key": key,
        "total_rows": int(sum(r["rows"] for r in stats)),
        "shards": [
            {
                "shard": int(r["shard"]),
                "rows": int(r["rows"]),
                "checksum": int(r["checksum"]),
            }
            for r in stats
        ],
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def verify_shards(spark: SparkSession, out_dir: str, key: str) -> bool:
    """Recompute the manifest from the written files and compare — the
    consumer-side integrity check."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        expect = json.load(f)
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    # 15 hex chars = 60 bits: conv() output stays inside int64
    # (16 chars can exceed 2^63-1 and ANSI-fail the bigint cast).
    half = F.substring(F.md5(F.col(key).cast("string")), 1, 15)
    got = (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(F.conv(half, 16, 10).cast("bigint")).alias("checksum"),
        )
        .orderBy("shard")
        .collect()
    )
    actual = [
        {"shard": int(r["shard"]), "rows": int(r["rows"]), "checksum": int(r["checksum"])}
        for r in got
    ]
    return actual == expect["shards"]
