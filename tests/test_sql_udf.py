"""SQL-callable UDF surface: a vectorized pandas UDF registered into the
SQL catalog must be usable from pure SQL text and agree with the
equivalent built-in expression (the UDF is the escape hatch; built-ins
stay the hot path)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import col, pandas_udf

from taxi_data_datapipeline_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_pandas_udf_registered_in_sql_catalog(spark):
    @pandas_udf("double")
    def clamp01(v: pd.Series) -> pd.Series:
        return (v / 500.0).clip(0.0, 1.0)

    spark.udf.register("clamp01", clamp01)
    load(spark, SF, "events").createOrReplaceTempView("events_udf_src")
    got = spark.sql(
        """
        SELECT event_id, clamp01(value) AS v01
        FROM events_udf_src ORDER BY event_id LIMIT 200
        """
    ).collect()
    want = (
        load(spark, SF, "events")
        .selectExpr("event_id", "LEAST(GREATEST(value / 500.0, 0.0), 1.0) AS v01")
        .orderBy(col("event_id"))
        .limit(200)
        .collect()
    )
    assert [(r["event_id"], round(r["v01"], 12)) for r in got] == [
        (r["event_id"], round(r["v01"], 12)) for r in want
    ]
    assert any(0.0 < r["v01"] < 1.0 for r in got)
