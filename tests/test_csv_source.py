"""CSV source coverage: schema'd read + the same canonical normalization
expressions used by the parquet ingest path (BASELINE 'Parquet/CSV')."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from taxi_data_datapipeline_spark.functions.timestamps import coerce_timestamp


def test_csv_trips_normalize(spark, tmp_path):
    p = tmp_path / "yellow_tripdata_2024-03.csv"
    p.write_text(
        "tpep_pickup_datetime,PULocationID,fare\n"
        "2024-03-01 08:05:00,132,10.5\n"
        "2024-03-01 09:10:00,7,3.25\n"
        "not-a-date,9,1.0\n"
    )
    schema = T.StructType(
        [
            T.StructField("tpep_pickup_datetime", T.StringType()),
            T.StructField("PULocationID", T.IntegerType()),
            T.StructField("fare", T.DoubleType()),
        ]
    )
    raw = spark.read.csv(str(p), header=True, schema=schema)
    trips = raw.select(
        coerce_timestamp(F.col("tpep_pickup_datetime"), T.StringType()).alias(
            "pickup_datetime"
        ),
        F.col("PULocationID").cast("string").alias("pickup_place"),
    )
    rows = trips.collect()
    assert len(rows) == 3
    ok = [r for r in rows if r.pickup_datetime is not None]
    assert len(ok) == 2  # bad datetime coerced to NULL, not an error
    assert {r.pickup_place for r in rows} == {"132", "7", "9"}
