"""ORC source/sink coverage: the engine's normalization pipeline is
format-agnostic — Spark's built-in ORC reader/writer slots in where
parquet does (columnar, predicate pushdown, column pruning), so a
deployment whose lake is ORC runs the same plans."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_preserves_pivot_result(spark, tmp_path):
    """Write the events table as ORC, re-run the hourly rollup from the
    ORC copy, and require the same result as from parquet."""
    from taxi_data_datapipeline_spark.queries import load

    ev = load(spark, SF, "events").select("ts", "user_id", "event_type")
    orc_dir = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(orc_dir)

    def rollup(df):
        return (
            df.filter(F.col("ts").isNotNull())
            .groupBy(F.hour("ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    from_parquet = {tuple(r) for r in rollup(ev).collect()}
    from_orc = {tuple(r) for r in rollup(spark.read.orc(orc_dir)).collect()}
    assert from_orc == from_parquet
    assert len(from_orc) > 0


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    """The scale properties promised for parquet scans hold for ORC too:
    the predicate reaches the scan (PushedFilters) and only referenced
    columns are read (ReadSchema)."""
    from taxi_data_datapipeline_spark.queries import load

    orc_dir = str(tmp_path / "events_orc2")
    load(spark, SF, "events").write.mode("overwrite").orc(orc_dir)

    q = (
        spark.read.orc(orc_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "event_type" in plan.split("PushedFilters")[1].split("]")[0]
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"user_id", "event_type"}, cols
