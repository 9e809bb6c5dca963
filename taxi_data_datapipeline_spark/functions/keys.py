"""Place-key derivation.

Reference semantics: the grouping key for "where did the trip start" is a
*string* so that integer zone IDs and synthesized lat/lon buckets share one
column (``pivot_all_files.py:113-119,155``). The lat/lon form is
``round(lat,3) + "_" + round(lon,3)`` — a ~110 m grid bucket.

Float-formatting parity note (SURVEY §7.3): ``CAST(round(x,3) AS STRING)``
renders shortest-round-trip in both Spark and DuckDB (``40.721``, ``40.72``),
so the same expression in oracle SQL hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def place_key(location_col: Column) -> Column:
    """Location-ID place key: force-cast to string."""
    return location_col.cast("string")


def latlon_place_key(lat: Column, lon: Column, precision: int = 3) -> Column:
    """Grid-bucket place key: 'round(lat,p)_round(lon,p)' as a string."""
    return F.concat_ws(
        "_",
        F.round(lat.cast("double"), precision).cast("string"),
        F.round(lon.cast("double"), precision).cast("string"),
    )
