"""CSV source coverage: the normalization pipeline also runs over CSV
drops (the classic landing-zone format). CSV is row-oriented — no column
pruning or predicate pushdown at the storage layer — so the tests assert
semantic parity with parquet plus the schema controls that make CSV safe
at scale: explicit schemas (no inference pass over 100 TB) and corrupt-row
tolerance via the PERMISSIVE/DROPMALFORMED modes."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_preserves_rollup(spark, tmp_path):
    """Write the events table as headered CSV, re-read it with an explicit
    schema, and require the same hourly rollup as from parquet."""
    from taxi_data_datapipeline_spark.queries import load

    ev = load(spark, SF, "events").select("ts", "user_id", "event_type")
    csv_dir = str(tmp_path / "events_csv")
    ev.write.mode("overwrite").option("header", True).csv(csv_dir)

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )

    def rollup(df):
        return (
            df.filter(F.col("ts").isNotNull())
            .groupBy(F.hour("ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    from_parquet = {tuple(r) for r in rollup(ev).collect()}
    back = spark.read.schema(schema).option("header", True).csv(csv_dir)
    from_csv = {tuple(r) for r in rollup(back).collect()}
    assert from_csv == from_parquet
    assert len(from_csv) > 0


def test_csv_explicit_schema_skips_inference_and_drops_malformed(spark, tmp_path):
    """An explicit schema means no inference scan, and DROPMALFORMED
    discards corrupt rows instead of failing the job — both mandatory for
    unattended ingestion of third-party CSV drops."""
    p = tmp_path / "drop.csv"
    p.write_text(
        "user_id,amount\n"
        "1,10.5\n"
        "2,not_a_number_with_extra,field,overflow\n"
        "3,7.25\n"
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(1, 10.5), (3, 7.25)]
