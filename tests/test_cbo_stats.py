"""Cost-based optimizer inputs: ANALYZE TABLE statistics must reach the
logical plan (rowCount) — at cluster scale these stats drive join
reordering and broadcast decisions when file sizes mislead (e.g. highly
compressed or wide-but-filtered tables)."""

from __future__ import annotations

from taxi_data_datapipeline_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_analyze_table_stats_reach_the_optimizer(spark):
    load(spark, SF, "nation").write.mode("overwrite").saveAsTable("nation_cbo")
    saved_cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.sql("ANALYZE TABLE nation_cbo COMPUTE STATISTICS")
        spark.sql(
            "ANALYZE TABLE nation_cbo COMPUTE STATISTICS FOR COLUMNS n_nationkey"
        )
        expected = spark.table("nation_cbo").count()

        stats = (
            spark.table("nation_cbo")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().isDefined(), "ANALYZE row count missing from plan"
        assert stats.rowCount().get() == expected

        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED nation_cbo n_nationkey"
            ).collect()
        }
        assert int(desc["distinct_count"]) > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved_cbo)
        spark.sql("DROP TABLE IF EXISTS nation_cbo")
