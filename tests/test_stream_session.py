"""The streaming session clone (r12 optimization): state-store partition
count derives from the stream source's size instead of inheriting the
batch session's core count — streaming micro-batches run without AQE, so
nothing else ever coalesces the per-operator state-store instances."""

from __future__ import annotations

import os

import pytest

import taxi_data_datapipeline_spark.queries  # noqa: F401  (registry import order)
from taxi_data_datapipeline_spark.queries_advanced import (
    _STREAM_BYTES_PER_PARTITION,
    _STREAM_MIN_PARTITIONS,
    _stream_session,
)

SF = "/root/testdata/sf0.001"


def test_clone_gets_size_derived_partitions(spark):
    sess = _stream_session(spark, SF)
    nbytes = os.path.getsize(f"{SF}/events.parquet")
    expect = min(
        max(_STREAM_MIN_PARTITIONS, -(-nbytes // _STREAM_BYTES_PER_PARTITION)),
        spark.sparkContext.defaultParallelism,
    )
    assert int(sess.conf.get("spark.sql.shuffle.partitions")) == expect
    # the caller's session is untouched (bench threads share it)
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == int(
        spark.sparkContext.defaultParallelism
    )
    # correctness-critical confs carried onto the clone
    assert sess.conf.get("spark.sql.session.timeZone") == spark.conf.get(
        "spark.sql.session.timeZone"
    )
    assert sess.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"


def test_clone_is_memoized_per_partition_count(spark):
    assert _stream_session(spark, SF) is _stream_session(spark, SF)


def test_env_override_wins(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "7")
    sess = _stream_session(spark, SF)
    assert int(sess.conf.get("spark.sql.shuffle.partitions")) == 7


def test_nonlocal_source_keeps_callers_session(spark):
    # object-store paths can't be sized locally; the caller's session
    # (and therefore its configuration) must pass through unchanged
    assert _stream_session(spark, "s3a://bucket/prefix") is spark


@pytest.mark.parametrize("name", ["streaming_session_windows"])
def test_streaming_query_result_unchanged_on_clone(spark, name):
    """The drained stream result is a function of the data, not of the
    state partition count: same rows at the derived count and at the
    session default."""
    from taxi_data_datapipeline_spark.queries import QUERIES

    got = QUERIES[name](spark, SF)
    n_default = None
    try:
        os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = str(
            spark.sparkContext.defaultParallelism
        )
        wide = QUERIES[name](spark, SF)
        n_default = wide.count()
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", None)
    assert got.count() == n_default
    assert got.exceptAll(wide).count() == 0
    assert wide.exceptAll(got).count() == 0
