"""Flagship scale probe: the hourly pivot over N synthetic rows.

Generates trips Spark-side (spark.range + hash exprs — no I/O bias, no
files) and times the full pivot kernel (derive -> single-shuffle
conditional aggregate -> HAVING) through the noop sink. This is the
reproducible source of the README throughput number.

Usage: python tools/pivot_probe.py [--rows 100000000] [--min-rides 50]
Prints one JSON line: {"rows": N, "wall_sec": s, "mrows_per_sec": x}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.pivot import hourly_pivot
from taxi_data_datapipeline_spark.session import get_spark


def synth_trips(spark, n: int):
    """Deterministic trips: 30 days of timestamps, 260 places, 3 types."""
    t3 = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(3))
    return spark.range(n).select(
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.xxhash64("id"), F.lit(86400 * 30))
        ).alias("pickup_datetime"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(260))
        .cast("string")
        .alias("pickup_place"),
        F.when(t3 == 0, "yellow")
        .when(t3 == 1, "green")
        .otherwise("fhv")
        .alias("taxi_type"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--min-rides", type=int, default=50)
    args = ap.parse_args()

    spark = get_spark("pivot_probe")
    df = synth_trips(spark, args.rows)
    # Warm-up on a small slice: JIT + codegen out of the measurement.
    hourly_pivot(synth_trips(spark, 1_000_000), min_rides=args.min_rides).write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.time()
    hourly_pivot(df, min_rides=args.min_rides).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "rows": args.rows,
                "wall_sec": round(wall, 2),
                "mrows_per_sec": round(args.rows / wall / 1e6, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
