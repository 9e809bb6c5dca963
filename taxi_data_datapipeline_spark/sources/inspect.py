"""Debug inspector (reference S9, ``inspect_parquet.py:1-47``).

The reference's one-off script printed a file's schema, the detected
datetime/location columns, and a first-batch sample. Spark-side this is
``printSchema``/``show``/``summary`` plus the same detection layer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from taxi_data_datapipeline_spark.sources.paths import (
    infer_month_from_path,
    infer_taxi_type_from_path,
)
from taxi_data_datapipeline_spark.sources.schema_detect import resolve_trip_schema


def inspect_parquet(spark: SparkSession, path: str, n_rows: int = 5) -> dict:
    """Schema + detection + sample for one parquet path; returns the
    detection summary (also printed, mirroring the reference script)."""
    df = spark.read.parquet(path)
    ts = resolve_trip_schema(df.schema)
    info = {
        "path": path,
        "columns": df.columns,
        "taxi_type": infer_taxi_type_from_path(path),
        "year_month": infer_month_from_path(path),
        "datetime_col": ts.datetime_col if ts else None,
        "place_mode": ts.place_mode if ts else None,
    }
    df.printSchema()
    df.show(n_rows, truncate=40)
    print(info)
    return info
