"""Small-file compaction: fewer files, identical data."""

import os

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.plans.maintenance import compact_parquet

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _parquet_files(d):
    return [
        os.path.join(r, f)
        for r, _dd, ff in os.walk(d)
        for f in ff
        if f.endswith(".parquet")
    ]


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # Simulate a streaming sink's droppings: 64 tiny files.
    ev.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    n_out = compact_parquet(spark, src, dst, target_file_bytes=4 * 1024 * 1024)
    assert n_out < 64
    assert len(_parquet_files(dst)) == n_out

    a = spark.read.parquet(src).agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum("user_id")
    ).collect()[0]
    b = spark.read.parquet(dst).agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum("user_id")
    ).collect()[0]
    assert tuple(a) == tuple(b)
