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


def test_sorted_compaction_gives_disjoint_rowgroup_stats(spark, tmp_path):
    """The point of the sorted layout: row-group min/max on the sort key
    must be (near-)disjoint so a filtering reader skips whole row groups
    via footer stats alone."""
    import pyarrow.parquet as pq

    frag_dir = str(tmp_path / "frag3")
    out_dir = str(tmp_path / "zsorted")
    ev = load(spark, SF, "events")
    ev.repartition(8).write.parquet(frag_dir)

    compact_parquet(
        spark,
        frag_dir,
        out_dir,
        "64MB",
        sort_within_partitions_by=["user_id"],
        writer_options={"parquet.block.size": str(16 * 1024)},
    )

    import glob

    ranges = []
    for f in glob.glob(f"{out_dir}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("user_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) >= 3, f"want multiple row groups, got {len(ranges)}"
    ranges.sort()
    overlaps = sum(
        1 for (a, b) in zip(ranges, ranges[1:]) if b[0] < a[1]
    )
    # Sorted-within-file: at most the file-boundary row groups may overlap.
    assert overlaps == 0, (overlaps, ranges)
