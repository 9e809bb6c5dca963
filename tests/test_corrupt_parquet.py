"""Corrupt-parquet posture: a truncated file fails the scan loudly by
default, and ignoreCorruptFiles turns it into a skip — the same
quarantine-vs-fail decision the CSV/JSONL sources expose per-row,
surfaced at file granularity."""

import os
import shutil

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _fragmented_copy(spark, tmp_path):
    d = str(tmp_path / "frag")
    spark.read.parquet(f"{SF}/events.parquet").repartition(4).write.parquet(d)
    parts = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    return d, parts


def test_truncated_file_fails_by_default(spark, tmp_path):
    d, parts = _fragmented_copy(spark, tmp_path)
    # Truncate one shard mid-file: footer gone.
    with open(parts[0], "r+b") as f:
        f.truncate(os.path.getsize(parts[0]) // 2)
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import CapturedException

    with pytest.raises((Py4JJavaError, CapturedException, Exception)):
        spark.read.parquet(d).count()


def test_ignore_corrupt_files_skips_and_counts_rest(spark, tmp_path):
    d, parts = _fragmented_copy(spark, tmp_path)
    good_rows = spark.read.parquet(*parts[1:]).count()
    shutil.copy(parts[1], parts[0])  # make a baseline first
    with open(parts[0], "r+b") as f:
        f.truncate(os.path.getsize(parts[0]) // 2)
    # Schema must be DECLARED: footer-based inference happens at analysis
    # time, before ignoreCorruptFiles (an execution-time setting) can
    # skip anything — the same declared-schema posture as the CSV/JSONL
    # sources.
    schema = spark.read.parquet(*parts[1:]).schema
    saved = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        got = (
            spark.read.schema(schema)
            .parquet(d)
            .agg(F.count(F.lit(1)))
            .collect()[0][0]
        )
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", saved)
    assert got == good_rows
