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


def lsh_incremental_stream(
    new_docs: DataFrame,
    old_buckets: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    ngram: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Streaming incremental near-dup screen: each arriving document is
    MinHash-banded IN THE STREAM (the same codegen signature expressions
    as the batch tier) and joined stream-static against the existing
    corpus's precomputed bucket table — the online form of
    operators/dedup.py:minhash_lsh_incremental, and the architecture a
    production ingest runs: the old side is a persisted table the batch
    pipeline refreshes, the stream only ever does O(batch) work.

    ``old_buckets`` carries (band, bh, old_doc, old_grams) — bucket keys
    plus the shingle set needed for in-stream exact verification (at
    scale the grams column would live in a side lookup; inlined here so
    a single stream-static join verifies too). Duplicate candidate
    pairs from multi-band collisions are dropped with unbounded
    dropDuplicates state — keyed by matched pair, which is
    answer-sized, not corpus-sized.
    """
    from taxi_data_datapipeline_spark.functions.text import ngram_shingles

    rows = num_perm // bands
    grams = ngram_shingles(F.col("text"), ngram)
    # Streaming aggregation would need a watermark; instead derive the
    # signature per-row with array expressions (each row carries its own
    # grams — no cross-row state required).
    def _perm(i: int):
        # Single-argument lambda ONLY: a second parameter (even with a
        # bound default) makes transform() pass the ARRAY INDEX as the
        # second argument, silently replacing the permutation seed.
        return lambda g: F.xxhash64(g, F.lit(i))

    mins = [
        F.array_min(F.transform(F.col("new_grams"), _perm(i))).alias(f"m{i}")
        for i in range(num_perm)
    ]
    sig = new_docs.select(
        F.col("doc_id").alias("new_doc"), grams.alias("new_grams")
    ).select("new_doc", "new_grams", *mins)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * rows + r}") for r in range(rows)]).alias(
                "bh"
            ),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "new_doc",
        "new_grams",
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(
        "new_doc",
        "new_grams",
        F.col("bk.band").alias("band"),
        F.col("bk.bh").alias("bh"),
    )
    joined = banded.join(old_buckets, ["band", "bh"])
    verified = joined.select(
        "new_doc",
        "old_doc",
        F.round(
            F.size(F.array_intersect("new_grams", "old_grams")).cast("double")
            / F.size(F.array_union("new_grams", "old_grams")),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= jaccard_threshold)
    return verified.dropDuplicates(["new_doc", "old_doc"])


def build_old_buckets(
    old_docs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    ngram: int = 3,
) -> DataFrame:
    """The static side for ``lsh_incremental_stream``: (band, bh,
    old_doc, old_grams) — in production a table the batch pipeline
    maintains per ingest."""
    from taxi_data_datapipeline_spark.functions.text import ngram_shingles

    rows = num_perm // bands
    grams = ngram_shingles(F.col("text"), ngram)
    # Kept as per-row array expressions (NOT the batch tier's
    # explode+groupBy): the explode form was measured NEUTRAL here and
    # adds a full shuffle of the exploded gram stream, while this form
    # is mapper-only — the better shape for a static side that a batch
    # pipeline rebuilds per ingest.
    def _perm(i: int):
        return lambda g: F.xxhash64(g, F.lit(i))  # see lsh_incremental_stream

    mins = [
        F.array_min(F.transform(F.col("old_grams"), _perm(i))).alias(f"m{i}")
        for i in range(num_perm)
    ]
    sig = old_docs.select(
        F.col("doc_id").alias("old_doc"), grams.alias("old_grams")
    ).select("old_doc", "old_grams", *mins)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * rows + r}") for r in range(rows)]).alias(
                "bh"
            ),
        )
        for b in range(bands)
    ]
    return sig.select(
        "old_doc",
        "old_grams",
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(
        F.col("bk.band").alias("band"),
        F.col("bk.bh").alias("bh"),
        "old_doc",
        "old_grams",
    )
