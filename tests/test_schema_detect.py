"""Column detection — ports reference behaviors
(test_pivot_date_location_hour.py:37-69) plus StructType carriers."""

from __future__ import annotations

from pyspark.sql import types as T

from taxi_data_datapipeline_spark.sources.schema_detect import (
    find_pickup_datetime_col,
    find_pickup_lat_lon_cols,
    find_pickup_location_col,
    resolve_trip_schema,
)


def test_datetime_exact_and_canonical():
    assert find_pickup_datetime_col(["tpep_pickup_datetime", "fare"]) == "tpep_pickup_datetime"
    assert find_pickup_datetime_col(["pickup_datetime"]) == "pickup_datetime"
    assert find_pickup_datetime_col(["lpep_pickup_datetime"]) == "lpep_pickup_datetime"
    assert find_pickup_datetime_col(["request_datetime"]) == "request_datetime"


def test_datetime_case_insensitive_and_fuzzy():
    assert find_pickup_datetime_col(["Trip_Pickup_DateTime"]) == "Trip_Pickup_DateTime"
    assert find_pickup_datetime_col(["my_pickup_time_x"]) == "my_pickup_time_x"
    assert find_pickup_datetime_col(["dropoff_datetime", "fare"]) is None


def test_location_detection():
    assert find_pickup_location_col(["PULocationID", "x"]) == "PULocationID"
    assert find_pickup_location_col(["pickup_location_id"]) == "pickup_location_id"
    assert find_pickup_location_col(["pu_zone"]) == "pu_zone"
    assert find_pickup_location_col(["dropoff_zone"]) is None


def test_latlon_pair():
    assert find_pickup_lat_lon_cols(["Start_Lat", "Start_Lon", "x"]) == ("Start_Lat", "Start_Lon")
    assert find_pickup_lat_lon_cols(["pickup_latitude", "pickup_longitude"]) == (
        "pickup_latitude",
        "pickup_longitude",
    )
    assert find_pickup_lat_lon_cols(["Start_Lat", "fare"]) == (None, None)


def test_structtype_carrier():
    schema = T.StructType(
        [
            T.StructField("tpep_pickup_datetime", T.TimestampType()),
            T.StructField("PULocationID", T.IntegerType()),
        ]
    )
    ts = resolve_trip_schema(schema)
    assert ts is not None
    assert ts.datetime_col == "tpep_pickup_datetime"
    assert ts.location_col == "PULocationID"
    assert ts.place_mode == "location"


def test_resolution_fallbacks():
    assert resolve_trip_schema(["fare_amount"]) is None
    ts = resolve_trip_schema(["Trip_Pickup_DateTime", "Start_Lat", "Start_Lon"])
    assert ts.place_mode == "latlon"
    ts = resolve_trip_schema(["pickup_datetime", "fare"])
    assert ts.place_mode == "empty"
