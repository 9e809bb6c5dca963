"""RocksDB state store provider: the scale-path backend for stateful
streaming.

The default HDFSBackedStateStoreProvider keeps every key of every state
partition on the executor HEAP — at 100 TB-scale state (dedup keys,
session windows over months) that's an OOM, not a config problem. The
RocksDB provider (bundled with Spark, off-heap + spillable to local SSD,
changelog-checkpointed) is what production stateful pipelines run on.
This pins that (a) the bundled rocksdbjni actually loads and serves a
stateful query in this build, (b) results are IDENTICAL to the default
provider (state backend must be invisible to semantics), and (c) the
query's progress metrics prove RocksDB was engaged, not silently
fallen back from.
"""

from __future__ import annotations

import itertools
import json

import pytest
from pyspark.sql import functions as F

import taxi_data_datapipeline_spark.queries  # noqa: F401 — registry init first (avoids partial-module import)

SF = "/root/testdata/sf0.001"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _run_hourly_counts(spark, sf_dir):
    """Watermarked hourly count over the events file stream, drained with
    AvailableNow into a memory sink; returns (rows, last_progress)."""
    from taxi_data_datapipeline_spark.queries_advanced import _stream_events

    raw = _stream_events(spark, sf_dir)
    agg = (
        raw.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt")
    )
    name = f"rocks_state_{next(_counter)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    rows = sorted(map(tuple, spark.table(name).collect()))
    return rows, progress



_counter = itertools.count()


@pytest.fixture()
def rocksdb_conf(spark):
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    yield
    spark.conf.unset(PROVIDER_CONF)


def test_rocksdb_state_store_matches_default_and_engages(spark, rocksdb_conf):
    rocks_rows, progress = _run_hourly_counts(spark, SF)

    # (c) prove RocksDB served the state: its provider-specific metrics
    # appear in the state operator's customMetrics (absent under the
    # default provider).
    ops = progress["stateOperators"] if progress else []
    assert ops, "no stateful operator reported progress"
    custom = json.dumps(ops)
    assert "rocksdb" in custom.lower(), custom[:500]

    # (b) identical results under the default provider.
    spark.conf.unset(PROVIDER_CONF)
    default_rows, _ = _run_hourly_counts(spark, SF)
    assert rocks_rows == default_rows

    # and both equal the batch aggregate (the semantics anchor).
    from taxi_data_datapipeline_spark.queries import load

    batch = (
        load(spark, SF, "events")
        .groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt")
    )
    assert rocks_rows == sorted(map(tuple, batch.collect()))
