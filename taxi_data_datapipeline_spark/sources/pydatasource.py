"""Custom Python DataSource (Spark 4 API): deterministic synthetic trips.

The reference's input universe is "NYC TLC parquet files, one per
(taxi_type, month)" (``pivot_utils.py:261-297``). This source generates
that universe directly inside Spark — no files — for generator-driven
testing and benchmarking of the pivot pipeline at any scale:

    spark.dataSource.register(SynthTripsSource)
    spark.read.format("synthtrips")
         .option("rows_per_partition", 100000)
         .option("months", 3).load()

Design points (the Spark-native parts):

* One `InputPartition` per (taxi_type, month) — the generator's unit of
  parallelism mirrors the reference's unit of work, so a 443-"file"
  dataset fans out across the cluster exactly like the real listing.
* Rows derive from xxhash-free pure-Python hashing of (partition, i) —
  deterministic everywhere, no RNG state, re-reads identical (tested).
* The reader yields plain tuples; Spark pickles per batch. This is the
  SLOW path relative to parquet scan (Python generator), which is
  exactly what it's for: a correctness/scale harness, not a prod scan.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TAXI_TYPES = ["yellow", "green", "fhv"]


def _h(*parts: int) -> int:
    raw = ":".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


class SynthTripsSource(DataSource):
    """`synthtrips` format: options rows_per_partition (default 1000),
    months (default 2, starting 2024-01)."""

    @classmethod
    def name(cls) -> str:
        return "synthtrips"

    def schema(self) -> str:
        return (
            "pickup_datetime timestamp, pickup_location string, "
            "taxi_type string, month_id int"
        )

    def reader(self, schema) -> DataSourceReader:
        return SynthTripsReader(self.options)

    def streamReader(self, schema) -> "SynthTripsStreamReader":
        return SynthTripsStreamReader(self.options)


class SynthTripsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows_per_partition", "1000"))
        self.months = int(options.get("months", "2"))

    def partitions(self):
        return [
            InputPartition((t, m))
            for t in range(len(TAXI_TYPES))
            for m in range(self.months)
        ]

    def read(self, partition):
        t_idx, m = partition.value
        taxi_type = TAXI_TYPES[t_idx]
        month_start = datetime(2024, 1, 1) + timedelta(days=31 * m)
        month_start = month_start.replace(day=1)
        for i in range(self.rows):
            h = _h(t_idx, m, i)
            ts = month_start + timedelta(seconds=h % (28 * 86400))
            place = str(h // 7 % 260)
            yield (ts, place, taxi_type, m)


class SynthTripsStreamReader(DataSourceStreamReader):
    """Streaming form of the same universe: each micro-batch covers the
    next arrived MONTH across all taxi types — modeling how the real
    dataset lands (one file per (type, month) per month). Offsets are
    ``{"month": n}`` = "months fully ingested"; partitions(start, end)
    fans each batch out as one InputPartition per (type, month), the
    identical parallelism unit as the batch reader, and ``read`` is the
    same deterministic generator — so stream-drained contents equal the
    batch read row-for-row (tested)."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows_per_partition", "1000"))
        self.months = int(options.get("months", "2"))
        self.months_per_batch = int(options.get("months_per_batch", "1"))

    def initialOffset(self) -> dict:
        return {"month": 0}

    def latestOffset(self) -> dict:
        # All months are "already arrived" in this synthetic universe;
        # months_per_batch throttles how many each micro-batch ingests
        # (the maxFilesPerTrigger analog).
        cur = getattr(self, "_cur", 0)
        self._cur = min(self.months, cur + self.months_per_batch)
        return {"month": self._cur}

    def partitions(self, start: dict, end: dict):
        return [
            InputPartition((t, m))
            for t in range(len(TAXI_TYPES))
            for m in range(start["month"], end["month"])
        ]

    def commit(self, end: dict) -> None:
        pass

    def read(self, partition):
        yield from SynthTripsReader(
            {"rows_per_partition": str(self.rows), "months": str(self.months)}
        ).read(partition)
