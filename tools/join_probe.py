"""Join scale probe: the three join regimes at 100 M fact rows.

* broadcast — 1 M-row dim ships to every task, fact never shuffles;
* sort-merge — fact-fact equi-join, both sides shuffle on the key;
* bloom-filtered — selective dim filter injects a runtime bloom filter
  into the fact scan before the shuffle (thresholds forced for the probe;
  at production scale they trigger on their own).

Usage: python tools/join_probe.py [--rows 100000000] [--dim 1000000]
Prints one JSON line {"rows": N, "joins": {name: {...}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--dim", type=int, default=1_000_000)
    args = ap.parse_args()

    spark = get_spark("join_probe")

    def fact(n):
        return spark.range(n).select(
            F.pmod(F.xxhash64("id"), F.lit(args.dim)).alias("k"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0).alias("v"),
        )

    dim = spark.range(args.dim).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(50)).alias("grp"),
    )

    def bcast(f):
        return (
            f.join(F.broadcast(dim), "k")
            .groupBy("grp")
            .agg(F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"))
        )

    def smj(f):
        # fact-fact self-join on the key (disable broadcast to force SMJ)
        agg = f.groupBy("k").agg(F.sum("v").alias("kv"))
        return (
            f.hint("merge")
            .join(agg.hint("merge"), "k")
            .groupBy(F.pmod(F.col("k"), F.lit(50)).alias("grp"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def bloom(f):
        hot = dim.filter(F.col("grp") == 0)  # 2% of keys survive
        return (
            f.join(hot.hint("shuffle_hash"), "k")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    JOINS = {"broadcast_dim": bcast, "sort_merge_factfact": smj, "bloom_selective": bloom}

    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    small = fact(1_000_000)
    for fn in JOINS.values():
        fn(small).write.format("noop").mode("overwrite").save()

    f = fact(args.rows)
    out = {}
    for name, fn in JOINS.items():
        t0 = time.time()
        fn(f).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        out[name] = {
            "wall_sec": round(wall, 2),
            "mrows_per_sec": round(args.rows / wall / 1e6, 2),
        }
    print(json.dumps({"rows": args.rows, "joins": out}))


if __name__ == "__main__":
    main()
