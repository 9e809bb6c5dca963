"""Streaming throughput probe: rate source -> watermarked tumbling-window
aggregate -> noop-ish sink, sustained processedRowsPerSecond.

The batch probes measure the kernels; this one measures the streaming
runtime around them — micro-batch scheduling, state-store updates,
watermark advance — the regime the incremental pivot refresh and the
streaming dedup/session tiers run in.

Usage: python tools/stream_probe.py [--rps 5000000] [--seconds 20]
Prints one JSON line with the median processed-rows/s across batches.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rps", type=int, default=5_000_000)
    ap.add_argument("--seconds", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark("stream_probe")
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(args.rps))
        .option("numPartitions", "32")
        .load()
    )
    agg = (
        src.withWatermark("timestamp", "10 seconds")
        .groupBy(
            F.window("timestamp", "5 seconds").alias("w"),
            F.pmod(F.col("value"), F.lit(100)).alias("grp"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value") % 1000).alias("s"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_probe_sink")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(args.seconds)
    progress = [
        json.loads(p) if isinstance(p, str) else p for p in q.recentProgress
    ]
    rates = [
        p["processedRowsPerSecond"]
        for p in progress
        if p.get("numInputRows", 0) > 0 and p.get("processedRowsPerSecond")
    ]
    out = {
        "offered_rps": args.rps,
        "batches": len(rates),
        "median_processed_rps": round(statistics.median(rates)) if rates else 0,
        "max_processed_rps": round(max(rates)) if rates else 0,
    }
    print(json.dumps(out))
    q.stop()


if __name__ == "__main__":
    main()
