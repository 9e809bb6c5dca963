"""Reference-parity queries: the pivot pipeline surface (SURVEY §2.1-§2.4).

Stand-in mapping onto the driver's ``events`` table (FIXTURES.md §1):
``ts`` -> pickup_datetime, ``user_id`` -> pickup_place, ``event_type`` ->
taxi_type. The flagship query is the reference's entire raison d'être: the
hourly pivot wide table with a min-count HAVING.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.pivot import (
    cleanup_low_count_rows,
    hourly_pivot,
    row_total,
)
from taxi_data_datapipeline_spark.queries import load, register

MIN_RIDES = 2

_HOUR_FILTER_COLS = ",\n       ".join(
    f"COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) = {h}) AS hour_{h}" for h in range(24)
)

_HOURLY_PIVOT_SQL = f"""
SELECT event_type AS taxi_type,
       CAST(ts AS DATE) AS date,
       CAST(user_id AS STRING) AS pickup_place,
       {_HOUR_FILTER_COLS}
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
HAVING COUNT(*) >= {MIN_RIDES}
"""


@register("hourly_pivot", _HOURLY_PIVOT_SQL)
def q_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: (type, date, place) x hour_0..23 counts, HAVING total >= 2.

    Reference: ``pivot_all_files.py:165-292`` collapsed to one shuffle.
    """
    events = load(spark, sf_dir, "events")
    return hourly_pivot(
        events, ts_col="ts", place_col="user_id", type_col="event_type", min_rides=MIN_RIDES
    )


@register(
    "normalize_project",
    """
SELECT event_type AS taxi_type,
       CAST(ts AS DATE) AS date,
       EXTRACT(hour FROM ts)::INT AS hour,
       CAST(user_id AS STRING) AS pickup_place
FROM events
WHERE ts IS NOT NULL
""",
)
def q_normalize_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical projection + derivations (reference P1,P2,F2,F3,F5)."""
    events = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts").isNotNull())
        .select(
            F.col("event_type").alias("taxi_type"),
            F.to_date("ts").alias("date"),
            F.hour("ts").alias("hour"),
            F.col("user_id").cast("string").alias("pickup_place"),
        )
    )


@register(
    "long_counts",
    """
SELECT event_type AS taxi_type,
       CAST(ts AS DATE) AS date,
       CAST(user_id AS STRING) AS pickup_place,
       EXTRACT(hour FROM ts)::INT AS hour,
       COUNT(*) AS cnt
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2, 3, 4
""",
)
def q_long_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-pivot long-format count aggregate (reference A1/A2/A5 merged)."""
    events = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type").alias("taxi_type"),
            F.to_date("ts").alias("date"),
            F.col("user_id").cast("string").alias("pickup_place"),
            F.hour("ts").alias("hour"),
        )
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "low_count_filter",
    f"""
WITH wide AS (
  SELECT event_type AS taxi_type,
         CAST(ts AS DATE) AS date,
         CAST(user_id AS STRING) AS pickup_place,
         {_HOUR_FILTER_COLS}
  FROM events
  WHERE ts IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT * FROM wide
WHERE ({' + '.join(f'hour_{h}' for h in range(24))}) >= 3
""",
)
def q_low_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone post-pivot HAVING filter (reference P3, ``pivot_utils.py:211-224``)."""
    events = load(spark, sf_dir, "events")
    wide = hourly_pivot(
        events, ts_col="ts", place_col="user_id", type_col="event_type", min_rides=0
    )
    kept, _stats = cleanup_low_count_rows(wide, min_rides=3)
    return kept


@register(
    "month_mismatch_audit",
    """
SELECT event_type AS taxi_type,
       COUNT(*) AS input_rows,
       COUNT(*) FILTER (WHERE EXTRACT(year FROM ts) != 2024 OR EXTRACT(month FROM ts) != 1)
           AS month_mismatch
FROM events
WHERE ts IS NOT NULL
GROUP BY 1
""",
)
def q_month_mismatch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit count of rows whose month differs from the file's path month
    (reference A3, ``pivot_all_files.py:158-160``) — counted, never dropped.
    The synthetic events table plays a file stamped 2024-01."""
    events = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    mismatch = (F.year("ts") != 2024) | (F.month("ts") != 1)
    return events.groupBy(F.col("event_type").alias("taxi_type")).agg(
        F.count("*").alias("input_rows"),
        F.sum(mismatch.cast("long")).alias("month_mismatch"),
    )


@register(
    "latlon_place_key",
    """
SELECT event_id,
       CAST(ROUND(value * 0.01 + 40.0, 3) AS VARCHAR) || '_' ||
       CAST(ROUND(value * -0.02 - 73.0, 3) AS VARCHAR) AS pickup_place
FROM events
""",
)
def q_latlon_place_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lat/lon grid place key (reference F6): round(lat,3)_round(lon,3).

    Synthesizes a lat/lon pair from ``events.value`` so the expression runs
    on driver testdata; formatting parity per SURVEY §7.3 risk register.
    """
    from taxi_data_datapipeline_spark.functions.keys import latlon_place_key

    events = load(spark, sf_dir, "events")
    lat = F.col("value") * 0.01 + 40.0
    lon = F.col("value") * -0.02 - 73.0
    return events.select("event_id", latlon_place_key(lat, lon).alias("pickup_place"))


@register(
    "epoch_coercion",
    """
SELECT event_id,
       epoch_ms((epoch_ms(ts) // 1000) * 1000) AS ts_s,
       epoch_ms(epoch_ms(ts)) AS ts_ms
FROM events
""",
)
def q_epoch_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch second/millisecond coercion (reference F1 numeric branch):
    round-trips ts through epoch integers of both units."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.timestamp_seconds(F.floor(F.unix_millis("ts") / 1000)).alias("ts_s"),
        F.timestamp_millis(F.unix_millis("ts")).alias("ts_ms"),
    )


@register("sql_hourly_pivot", _HOURLY_PIVOT_SQL)
def q_sql_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship pivot executed from pure ANSI SQL TEXT: the exact
    string the DuckDB oracle runs is fed verbatim to `spark.sql` (only a
    temp-view registration stands between parquet and the query). The
    reference has no query language at all (SURVEY §3); this entry
    proves the engine's surface is reachable from SQL, not just the
    DataFrame API — same plan, same single shuffle as `hourly_pivot`
    (Catalyst compiles both to the same conditional-aggregate form)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_HOURLY_PIVOT_SQL)
