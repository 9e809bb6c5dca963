"""Small-file compaction: fewer, right-sized files, identical data."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.compact import (
    compact_parquet,
    dataset_bytes,
)
from taxi_data_datapipeline_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_compact_reduces_file_count_and_preserves_data(spark, tmp_path):
    frag_dir = str(tmp_path / "fragmented")
    out_dir = str(tmp_path / "compacted")

    ev = load(spark, SF, "events")
    ev.repartition(40).write.parquet(frag_dir)  # simulate per-shard ingest

    stats = compact_parquet(spark, frag_dir, out_dir, target_file_size="64MB")
    assert stats["input_files"] == 40
    assert stats["output_files"] == 1  # tiny dataset -> single file
    assert stats["rows"] == ev.count()

    before = spark.read.parquet(frag_dir)
    after = spark.read.parquet(out_dir)
    key = [c for c in ev.columns]
    assert sorted(map(tuple, before.select(key).collect())) == sorted(
        map(tuple, after.select(key).collect())
    )


def test_compact_sorted_layout_improves_rowgroup_pruning(spark, tmp_path):
    frag_dir = str(tmp_path / "frag2")
    out_dir = str(tmp_path / "sorted")
    ev = load(spark, SF, "events")
    ev.repartition(16).write.parquet(frag_dir)

    compact_parquet(
        spark, frag_dir, out_dir, "64MB", sort_within_partitions_by=["user_id"]
    )
    after = spark.read.parquet(out_dir)
    assert after.filter(F.col("user_id") == 3).count() == ev.filter(
        F.col("user_id") == 3
    ).count()
    assert dataset_bytes(spark, after) > 0
