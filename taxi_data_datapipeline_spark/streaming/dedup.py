"""Streaming deduplication — the incremental tier of the dedup ladder.

A training-data ingest pipeline rarely gets its corpus in one batch: crawl
shards arrive continuously, and re-crawls repeat documents. Running the
batch ``dedup_exact`` over the full corpus per shard is O(corpus) each
time; the streaming form keeps a fingerprint state store and emits only
first-seen documents per micro-batch.

Two built-in strategies, chosen by whether arrivals carry an event time:

* ``dropDuplicates`` on the fingerprint — exact, but state grows with the
  number of distinct documents forever (fine when a compacted state store
  backs it, the right call for "dedup against all history");
* ``dropDuplicatesWithinWatermark`` — bounds state by event time: a
  re-crawl of a document more than the watermark after its first sighting
  is NOT suppressed. That is the 100 TB/day answer when "duplicate" means
  "seen recently", e.g. re-crawl suppression windows.

The fingerprint is the same normalized-text md5 as the batch operator
(``operators/dedup.py``), so streaming and batch tiers agree on identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("crawl_ts", T.TimestampType()),
    ]
)


def fingerprint_expr(text_col: str = "text"):
    """Normalized-text fingerprint — identical to the batch dedup tier."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    ).alias("fingerprint")


def read_doc_stream(
    spark: SparkSession,
    input_dir: str,
    schema: T.StructType = DOC_STREAM_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Parquet file-source stream of crawl shards (one file per trigger)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_dir)
    )


def dedup_stream(docs: DataFrame) -> DataFrame:
    """First-seen-wins exact dedup over all history.

    State: one row per distinct fingerprint, forever — pair with a
    RocksDB-backed state store and state-store compaction in production.
    """
    return docs.withColumn("fingerprint", fingerprint_expr()).dropDuplicates(
        ["fingerprint"]
    )


def dedup_stream_within_watermark(docs: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Recency-bounded dedup: suppress re-sightings of a fingerprint within
    the watermark of its first sighting; state for older fingerprints is
    evicted, keeping the store O(arrival rate x watermark) instead of
    O(corpus). Late rows (older than the watermark) are dropped entirely.
    """
    return (
        docs.withColumn("fingerprint", fingerprint_expr())
        .withWatermark("crawl_ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def run_dedup_to_memory(
    spark: SparkSession,
    input_dir: str,
    table_name: str = "dedup_docs",
    bounded: bool = False,
    watermark: str = "24 hours",
    schema: T.StructType = DOC_STREAM_SCHEMA,
) -> DataFrame:
    """Drain all available shards through the dedup stream (AvailableNow)
    into an in-memory sink; returns the surviving first-seen documents."""
    docs = read_doc_stream(spark, input_dir, schema=schema)
    stream = (
        dedup_stream_within_watermark(docs, watermark) if bounded else dedup_stream(docs)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
