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
    before = spark.conf.get("spark.sql.shuffle.partitions")
    sess = _stream_session(spark, SF)
    nbytes = os.path.getsize(f"{SF}/events.parquet")
    expect = min(
        max(_STREAM_MIN_PARTITIONS, -(-nbytes // _STREAM_BYTES_PER_PARTITION)),
        spark.sparkContext.defaultParallelism,
    )
    assert int(sess.conf.get("spark.sql.shuffle.partitions")) == expect
    # the caller's session is untouched (bench threads share it). NB:
    # compare against the PRE-CALL value, not defaultParallelism — in the
    # full suite test_launch_cwd.py pins the context to local[2] at
    # collection time while the fixture session keeps 4 shuffle
    # partitions, so the two legitimately differ.
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
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


def test_load_memo_not_poisoned_by_clone(spark, monkeypatch):
    """The load() memo must be SESSION-keyed: clones share an
    applicationId, and a clone-bound DataFrame in an app-wide memo makes
    a later createOrReplaceTempView register in the CLONE's catalog —
    the main session's spark.sql then fails with TABLE_OR_VIEW_NOT_FOUND
    (r12 gate: sql_shipping_priority / sql_lateral_topk)."""
    from taxi_data_datapipeline_spark.queries import load

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "3")
    clone = _stream_session(spark, SF)
    assert clone is not spark
    df_clone = load(clone, SF, "customer")
    assert df_clone.sparkSession is clone
    df_main = load(spark, SF, "customer")
    assert df_main.sparkSession is spark
    df_main.createOrReplaceTempView("_memo_probe_customer")
    assert spark.sql("SELECT COUNT(*) FROM _memo_probe_customer").collect()[0][0] > 0
    spark.catalog.dropTempView("_memo_probe_customer")


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
