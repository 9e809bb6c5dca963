"""Bucketed co-located join: pre-bucketing both sides on the join key lets
Spark sort-merge-join them with ZERO exchanges — the bucketing IS the
shuffle, paid once at write time and amortized over every later join.
This is the 100 TB pattern for repeated fact-fact joins.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default warehouse (spark-warehouse/ under cwd); tables dropped after
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # tiny test tables would broadcast; disable so the plan shows the
    # bucketed sort-merge path a fact-fact join takes at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), "o_orderkey")
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucketing replaces the shuffle
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    t1, _ = bucketed_tables
    from pyspark.sql import functions as F

    agg = spark.table(t1).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = spark._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # bucket layout satisfies the agg's distribution
