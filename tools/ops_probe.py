"""Event-operator scale probe: CDC compaction, sessionization, OHLC,
hopping windows over N synthetic events with a deliberately hot key.

Complements tools/pivot_probe.py (flagship) and tools/scale_probe.py
(dedup ladder): these four are the stateful/time-series kernels whose
plans must stay single-shuffle and map-side-combining to survive 100 TB.
The generator plants one hot user (~10% of all events) so the probe also
exercises skew behavior, not just throughput on uniform keys.

Usage: python tools/ops_probe.py [--rows 100000000]
Prints one JSON line: {"rows": N, "ops": {name: {"wall_sec": s,
"mrows_per_sec": x}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.session import get_spark


def synth_events(spark, n: int):
    """Deterministic events over 30 days, 100k users; user 0 is hot
    (~10% of rows) — the skew case every stateful op must survive."""
    h = F.xxhash64("id")
    uid = F.when(F.pmod(h, F.lit(10)) == 0, F.lit(0)).otherwise(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000))
    )
    t5 = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5))
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(h, F.lit(86400 * 30))
        ).alias("ts"),
        uid.alias("user_id"),
        F.when(t5 == 0, "view")
        .when(t5 == 1, "click")
        .when(t5 == 2, "purchase")
        .when(t5 == 3, "signup")
        .otherwise("error")
        .alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(50_000)) / 100.0).alias("value"),
    )


def op_cdc(ev):
    latest = ev.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("s")
    )
    return latest.filter(F.col("s.event_type") != "error").select(
        "user_id", F.col("s.ts").alias("last_ts"), F.col("s.value").alias("last_value")
    )


def op_sessionize(ev):
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def op_ohlc(ev):
    ord_key = F.struct("ts", "event_id")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / F.lit(21600)).cast("long") * F.lit(21600)
    )
    return ev.groupBy(bucket.alias("bucket"), "event_type").agg(
        F.min_by("value", ord_key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ord_key).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def op_hopping(ev):
    return ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


OPS = {
    "cdc_compaction": op_cdc,
    "session_windows": op_sessionize,
    "ohlc_bars": op_ohlc,
    "hopping_windows": op_hopping,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    args = ap.parse_args()

    spark = get_spark("ops_probe")
    # Warm-up on a small slice.
    small = synth_events(spark, 1_000_000)
    for fn in OPS.values():
        fn(small).write.format("noop").mode("overwrite").save()

    ev = synth_events(spark, args.rows)
    out = {}
    for name, fn in OPS.items():
        t0 = time.time()
        fn(ev).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        out[name] = {
            "wall_sec": round(wall, 2),
            "mrows_per_sec": round(args.rows / wall / 1e6, 2),
        }
    print(json.dumps({"rows": args.rows, "ops": out}))


if __name__ == "__main__":
    main()
