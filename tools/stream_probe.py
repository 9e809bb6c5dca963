"""Streaming throughput probes: sustained processed-rows/s for the
streaming runtime AND each custom stateful operator, load-annotated.

Two probe kinds:

* ``window`` (the original): rate source -> watermarked tumbling-window
  aggregate — measures the micro-batch runtime around the built-in
  state store (the regime of the incremental pivot refresh).
* stateful operators (``sessions`` / ``records`` / ``twap`` /
  ``dedup``): rate source mapped to each operator's input schema ->
  the operator -> noop sink. The rate source deliberately OVER-OFFERS
  (default 2 M rows/s) so batches backlog and
  ``processedRowsPerSecond`` measures the operator's true sustained
  capacity, not the offered rate. Each probe runs until >=
  ``--events`` rows (default 10 M) have been processed or
  ``--max-seconds`` elapses, and is annotated with the 1-min kernel
  loadavg at start/end so an inflated number is auditable as host
  noise (this container shares a kernel with other tenants).

Usage:
  python tools/stream_probe.py                     # original window probe
  python tools/stream_probe.py --op all            # every stateful op
  python tools/stream_probe.py --op twap --events 10000000

Prints ONE JSON line per probe.
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


def _drain(q, target_events: int, max_seconds: float) -> dict:
    """Poll a started query until >= target_events input rows are
    processed (or the clock runs out); return rate stats over batches."""
    seen: dict[int, dict] = {}
    t0 = time.time()
    while time.time() - t0 < max_seconds:
        time.sleep(1.0)
        for p in q.recentProgress:
            if isinstance(p, str):
                p = json.loads(p)
            seen[p["batchId"]] = p
        if sum(p["numInputRows"] for p in seen.values()) >= target_events:
            break
    q.stop()
    rates = [
        p["processedRowsPerSecond"]
        for p in seen.values()
        if p.get("numInputRows", 0) > 0 and p.get("processedRowsPerSecond")
    ]
    total = sum(p["numInputRows"] for p in seen.values())
    return {
        "batches": len(rates),
        "events_processed": int(total),
        "median_processed_rps": round(statistics.median(rates)) if rates else 0,
        "max_processed_rps": round(max(rates)) if rates else 0,
        "probe_seconds": round(time.time() - t0, 1),
    }


def _rate_source(spark, rps: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rps))
        .option("numPartitions", "32")
        .load()
    )


def probe_window(spark, rps: int, target_events: int, max_seconds: float) -> dict:
    src = _rate_source(spark, rps)
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
        agg.writeStream.format("noop")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    return _drain(q, target_events, max_seconds)


def _event_stream(spark, rps: int, n_users: int):
    """Map the rate source onto the (ts, event_id, user_id, value) shape
    the stateful operators consume; values cycle so record-highs and
    TWAP segments keep closing instead of saturating."""
    src = _rate_source(spark, rps)
    return src.select(
        F.col("timestamp").alias("ts"),
        F.col("value").alias("event_id"),
        (F.col("value") % n_users).alias("user_id"),
        ((F.col("value") % 997).cast("double") / 7.0).alias("value"),
    )


def probe_sessions(spark, rps, target_events, max_seconds, n_users=50_000) -> dict:
    from taxi_data_datapipeline_spark.streaming.sessions import sessionize_stream

    ev = _event_stream(spark, rps, n_users).select("user_id", "ts")
    q = (
        sessionize_stream(ev, gap_seconds=60.0)
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(processingTime="2 seconds")
        .start()
    )
    return _drain(q, target_events, max_seconds)


def probe_records(spark, rps, target_events, max_seconds, n_users=50_000) -> dict:
    from taxi_data_datapipeline_spark.streaming.records import record_high_stream

    q = (
        record_high_stream(_event_stream(spark, rps, n_users))
        .writeStream.format("noop")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    return _drain(q, target_events, max_seconds)


def probe_twap(spark, rps, target_events, max_seconds, n_users=50_000) -> dict:
    from taxi_data_datapipeline_spark.streaming.twap import twap_segment_stream

    q = (
        twap_segment_stream(_event_stream(spark, rps, n_users))
        .writeStream.format("noop")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    return _drain(q, target_events, max_seconds)


def probe_sessions_tws(spark, rps, target_events, max_seconds,
                       n_users=50_000) -> dict:
    """transformWithStateInPandas sessionizer (Spark 4 typed-state API on
    the protobuf worker protocol + RocksDB provider) — the direct
    throughput comparison against probe_sessions' applyInPandasWithState
    twin: identical gap semantics, different state-protocol constant."""
    from taxi_data_datapipeline_spark.streaming.sessions_tws import (
        sessionize_stream_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = _event_stream(spark, rps, n_users).select("user_id", "ts")
        q = (
            sessionize_stream_tws(ev, gap_seconds=60.0)
            .writeStream.format("noop")
            .outputMode("update")
            .trigger(processingTime="2 seconds")
            .start()
        )
        return _drain(q, target_events, max_seconds)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def probe_dedup(spark, rps, target_events, max_seconds) -> dict:
    """Watermark-bounded exact dedup (dropDuplicatesWithinWatermark on the
    normalized-text fingerprint) at a 50% duplicate rate — the JVM-side
    stateful tier (no Python workers), so its ceiling is the state store."""
    from taxi_data_datapipeline_spark.streaming.dedup import (
        dedup_stream_within_watermark,
    )

    src = _rate_source(spark, rps)
    docs = src.select(
        F.col("timestamp").alias("crawl_ts"),
        F.col("value").alias("doc_id"),
        F.concat(
            F.lit("document body "),
            (F.col("value") % (max(target_events, 2) // 2)).cast("string"),
        ).alias("text"),
    )
    q = (
        dedup_stream_within_watermark(docs, "1 hour")
        .writeStream.format("noop")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    return _drain(q, target_events, max_seconds)


def probe_join(spark, rps, target_events, max_seconds, n_users=50_000) -> dict:
    """Stream-stream watermarked interval join (the streaming_interval_
    attribution shape): one rate source split into a view stream and a
    purchase stream by value parity, joined per user within a 1-minute
    forward window. JVM symmetric hash join — the ceiling is state-store
    insert/eviction on BOTH sides, the most state-intensive operator in
    the streaming tier."""
    from taxi_data_datapipeline_spark.streaming.joins import interval_join

    ev = _event_stream(spark, rps, n_users).select(
        "ts", "event_id", "user_id", "value"
    )
    views = ev.filter(F.col("event_id") % 2 == 0)
    purchases = ev.filter(F.col("event_id") % 2 == 1)
    joined = interval_join(
        views, purchases, on="user_id", window="1 minute", watermark="2 minutes"
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("r.value").alias("value"),
    )
    q = (
        joined.writeStream.format("noop")
        .outputMode("append")
        .trigger(processingTime="2 seconds")
        .start()
    )
    return _drain(q, target_events, max_seconds)


PROBES = {
    "window": probe_window,
    "sessions": probe_sessions,
    "sessions_tws": probe_sessions_tws,
    "records": probe_records,
    "twap": probe_twap,
    "dedup": probe_dedup,
    "join": probe_join,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="window", choices=[*PROBES, "all"])
    ap.add_argument("--rps", type=int, default=None,
                    help="offered rows/s (default: 5M window, 2M stateful)")
    ap.add_argument("--events", type=int, default=10_000_000,
                    help="stop once this many rows processed")
    ap.add_argument("--max-seconds", type=float, default=150.0,
                    help="hard cap per probe")
    ap.add_argument("--seconds", type=float, default=None,
                    help="legacy alias for --max-seconds (window probe)")
    args = ap.parse_args()
    if args.seconds is not None:
        args.max_seconds = args.seconds

    spark = get_spark("stream_probe")
    ops = list(PROBES) if args.op == "all" else [args.op]
    for op in ops:
        rps = args.rps or (5_000_000 if op == "window" else 2_000_000)
        load0 = round(os.getloadavg()[0], 1)
        stats = PROBES[op](spark, rps, args.events, args.max_seconds)
        out = {
            "op": op,
            "offered_rps": rps,
            **stats,
            "loadavg_start": load0,
            "loadavg_end": round(os.getloadavg()[0], 1),
        }
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
