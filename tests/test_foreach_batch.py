"""foreachBatch upsert sink: maintain a latest-state parquet table from a
CDC-style stream — the merge-into pattern for plain-parquet sinks.

Each micro-batch folds into the store via read-modify-overwrite keyed on
user_id with (ts, event_id) recency; replaying a batch is a no-op
(idempotent upsert), which is what makes foreachBatch + overwrite safe
under at-least-once batch delivery.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _write_shard(path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        coerce_timestamps="us",
    )


def _upsert(store: str):
    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        cols = ["user_id", "ts", "event_id", "value"]
        incoming = batch.select(*cols)
        if os.path.isdir(store):
            current = spark.read.parquet(store).select(*cols)
            merged = current.unionByName(incoming)
        else:
            merged = incoming
        latest = (
            merged.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "value")).alias("s"))
            .select("user_id", "s.ts", "s.event_id", "s.value")
        )
        # collect-then-rewrite keeps the example self-contained; a real
        # sink writes to a staging dir and renames, or uses a table
        # format with MERGE
        rows = latest.collect()
        out = spark.createDataFrame(rows, latest.schema)
        out.write.mode("overwrite").parquet(store)

    return fn


def test_foreach_batch_upsert_latest_state(spark, tmp_path):
    d = str(tmp_path / "in")
    store = str(tmp_path / "store")
    os.makedirs(d)
    _write_shard(
        f"{d}/a.parquet",
        [
            (1, 1, "2024-01-01 00:00:00", 10.0),
            (2, 2, "2024-01-01 00:00:05", 20.0),
        ],
    )
    _write_shard(
        f"{d}/b.parquet",
        [
            (3, 1, "2024-01-01 00:01:00", 30.0),  # supersedes event 1
            (4, 3, "2024-01-01 00:00:30", 40.0),
        ],
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        stream.writeStream.foreachBatch(_upsert(store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = {
        r.user_id: (r.event_id, r.value)
        for r in spark.read.parquet(store).collect()
    }
    assert state == {1: (3, 30.0), 2: (2, 20.0), 3: (4, 40.0)}


def test_checkpoint_recovery_processes_only_new_files(spark, tmp_path):
    """Restarting a checkpointed stream resumes from the committed source
    offsets: the second run sees ONLY files added after the first drain
    (no reprocessing, no missed data) — the recovery contract that makes
    an incremental pipeline restartable after a crash or deploy."""
    d = str(tmp_path / "in2")
    store = str(tmp_path / "store2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(d)
    _write_shard(f"{d}/a.parquet", [(1, 1, "2024-01-01 00:00:00", 10.0)])
    _write_shard(f"{d}/b.parquet", [(2, 2, "2024-01-01 00:00:05", 20.0)])
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def run_once(batch_log: list):
        upsert = _upsert(store)

        def fn(batch, batch_id):
            batch_log.append(batch.count())
            upsert(batch, batch_id)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    first_batches: list = []
    run_once(first_batches)
    assert sum(first_batches) == 2  # both initial shards processed

    # New data arrives while the query is DOWN; one row supersedes user 1.
    _write_shard(f"{d}/c.parquet", [(3, 1, "2024-01-01 00:01:00", 30.0)])

    second_batches: list = []
    run_once(second_batches)
    # Recovery: only the new file's rows were read the second time.
    assert sum(second_batches) == 1, second_batches
    state = {
        r.user_id: (r.event_id, r.value)
        for r in spark.read.parquet(store).collect()
    }
    assert state == {1: (3, 30.0), 2: (2, 20.0)}
