"""Training-shard writer: reproducible membership, verifiable manifest."""

import os

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.plans.sharding import (
    shard_column,
    verify_shards,
    write_training_shards,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_write_and_verify_shards(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, "doc_id", out, n_shards=8)
    assert manifest["total_rows"] == docs.count()
    assert len(manifest["shards"]) <= 8
    assert verify_shards(spark, out, "doc_id")


def test_shard_assignment_is_partition_independent(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = docs.withColumn("shard", shard_column(F.col("doc_id"), 16))
    b = docs.repartition(13).withColumn("shard", shard_column(F.col("doc_id"), 16))
    ga = {r["doc_id"]: r["shard"] for r in a.select("doc_id", "shard").collect()}
    gb = {r["doc_id"]: r["shard"] for r in b.select("doc_id", "shard").collect()}
    assert ga == gb


def test_tamper_detection(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    out = str(tmp_path / "shards")
    write_training_shards(docs, "doc_id", out, n_shards=4)
    # Drop one shard directory: verification must fail.
    import shutil

    data = os.path.join(out, "data")
    victim = next(
        os.path.join(data, d)
        for d in os.listdir(data)
        if d.startswith("shard=")
    )
    shutil.rmtree(victim)
    assert not verify_shards(spark, out, "doc_id")
