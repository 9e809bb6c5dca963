"""Transactional-table (sources/txlog.py) overhead probe.

Answers the two questions that decide whether the log layer is viable at
scale: (1) what does a commit cost beyond the parquet write itself, and
(2) what does snapshot resolution cost as the log grows, with and
without checkpoints. Data I/O is ordinary Spark parquet either way, so
these constants ARE the layer's total overhead.

Usage: python tools/tx_probe.py [--commits 200]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from taxi_data_datapipeline_spark.session import get_spark  # noqa: E402
from taxi_data_datapipeline_spark.sources.txlog import TxTable  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=200)
    args = ap.parse_args()
    spark = get_spark("tx_probe", cpus=8)
    base = tempfile.mkdtemp(prefix="tx_probe_")
    out: dict = {"commits": args.commits}
    try:
        # one staged df reused; stage cost measured separately so the
        # commit numbers isolate LOG overhead from parquet writing
        df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v")
        t0 = time.time()
        df.write.mode("overwrite").parquet(os.path.join(base, "plain"))
        out["parquet_write_s"] = round(time.time() - t0, 3)

        for interval, tag in [(10, "ck10"), (0, "nock")]:
            tdir = os.path.join(base, f"tbl_{tag}")
            shutil.rmtree(tdir, ignore_errors=True)
            t = TxTable(spark, tdir, checkpoint_interval=interval)
            t0 = time.time()
            for _ in range(args.commits):
                t.append(df)
            wall = time.time() - t0
            out[f"{tag}_commit_per_s"] = round(args.commits / wall, 1)
            t0 = time.time()
            for _ in range(50):
                t.files_at()
            out[f"{tag}_resolve_ms"] = round((time.time() - t0) / 50 * 1000, 2)
        # read-back overhead vs plain parquet on the same file count
        t = TxTable(spark, os.path.join(base, "tbl_ck10"))
        t0 = time.time()
        n = t.read().count()
        out["tx_read_s"] = round(time.time() - t0, 3)
        out["tx_read_rows"] = n
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
