"""Runtime bloom-filter join pruning: the 100 TB shuffle-join lever.

When a shuffle join's build side carries a selective filter, Catalyst can
inject a bloom-filter aggregate on the build side and push a
``might_contain`` predicate into the probe side's SCAN — rows that cannot
join are dropped before the shuffle, which at 100 TB is the difference
between shuffling the full fact table and shuffling the matching slice.

The feature is sized for clusters: the DEFAULT thresholds
(``creationSideThreshold`` 10 MB build / ``applicationSideScanSizeThreshold``
10 GB probe) mean it fires on real fact-dimension joins without any
configuration, but NOT on the tiny local test parquet — so this test
lowers the probe-side threshold to 0 to pin the mechanism itself, and the
engine leaves the defaults untouched in session.py (broadcast joins are
strictly better when the build side fits, and AQE already converts those).
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bloom_spark():
    from taxi_data_datapipeline_spark.session import get_spark

    spark = get_spark("runtime_filter_test")
    # Pin the mechanism on small local data: force a shuffle join (bloom
    # filters never apply to broadcast joins) and drop the probe-side size
    # floor that exists to keep the filter from firing on small scans.
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "10GB",
    )


def test_bloom_filter_injected_on_selective_shuffle_join(bloom_spark):
    o = bloom_spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    li = bloom_spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    j = li.join(
        o.filter(F.col("o_orderpriority") == "1-URGENT"),
        li.l_orderkey == o.o_orderkey,
    )
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom" in optimized.lower(), (
        "runtime bloom filter not injected — probe-side pruning lost"
    )
    # The filter must also survive into the physical plan and the result
    # must be identical to the unfiltered-join semantics.
    physical = j._jdf.queryExecution().executedPlan().toString()
    assert "bloom" in physical.lower()
    expect = li.join(
        o.filter(F.col("o_orderpriority") == "1-URGENT").hint("merge"),
        li.l_orderkey == o.o_orderkey,
    ).count()
    assert j.count() == expect


def test_bloom_filter_absent_for_broadcast_join(bloom_spark):
    """When the build side broadcasts, the bloom filter must NOT appear —
    broadcast pruning subsumes it (the engine's default path)."""
    bloom_spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    try:
        o = bloom_spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        li = bloom_spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        j = li.join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == o.o_orderkey,
        )
        physical = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in physical
        assert "bloom" not in physical.lower()
    finally:
        bloom_spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
