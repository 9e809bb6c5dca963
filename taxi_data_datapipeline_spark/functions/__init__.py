"""Scalar Column helpers (all JVM-side expressions, no UDFs)."""

from taxi_data_datapipeline_spark.functions.keys import latlon_place_key, place_key
from taxi_data_datapipeline_spark.functions.timestamps import coerce_timestamp

__all__ = ["coerce_timestamp", "latlon_place_key", "place_key"]
