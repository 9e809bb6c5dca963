"""Ingest: heterogeneous trip parquet -> one canonical trips DataFrame.

Canonical trip schema (reference ``pivot_all_files.py:47-51``):

    pickup_datetime timestamp, pickup_place string, taxi_type string,
    plus path-derived audit columns file_year / file_month (nullable ints).

Strategy (SURVEY §1.3): read each file's parquet *footer* schema driver-side
(cheap, metadata only), resolve it with the fuzzy detector, group files whose
resolution is identical, build ONE ``spark.read.parquet(*group)`` scan per
group with a plain ``select`` projection, and ``unionByName`` the groups.
Catalyst prunes each scan to exactly the projected columns and pushes the
null filter down; the union is a no-shuffle narrow op.

This scales: for N files the driver does N footer reads (parallelizable, and
identical-schema files collapse into one scan), while data never leaves the
executors.
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.functions.keys import latlon_place_key, place_key
from taxi_data_datapipeline_spark.functions.timestamps import coerce_timestamp
from taxi_data_datapipeline_spark.sources.paths import (
    infer_month_from_path,
    infer_taxi_type_from_path,
)
from taxi_data_datapipeline_spark.sources.schema_detect import TripSchema, resolve_trip_schema

CANONICAL_COLUMNS = ["pickup_datetime", "pickup_place", "taxi_type", "file_year", "file_month"]


@dataclass
class IngestReport:
    """Files that resolved vs were skipped (no detectable datetime column)."""

    resolved: dict[str, TripSchema]
    skipped: list[str]


def _footer_schema(spark: SparkSession, path: str):
    # Footer-only read: Spark resolves the schema without scanning data pages.
    # nanosAsLong lets TIMESTAMP(NANOS) files (pandas/pyarrow default) resolve
    # as bigint instead of failing analysis; coerce_timestamp's magnitude
    # ladder then restores them to microsecond timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path).schema


def normalize_trips(
    spark: SparkSession,
    files: list[str],
    taxi_types: dict[str, str] | None = None,
    typed_place: bool = False,
) -> tuple[DataFrame, IngestReport]:
    """Resolve every file's schema and return one canonical trips DataFrame.

    ``taxi_types`` optionally overrides the per-file path inference.
    Files with no detectable datetime column are skipped (reported, not
    fatal) — reference behavior ``pivot_all_files.py:204-216``.

    ``typed_place=True`` keeps location-id place keys in their NATIVE
    numeric type instead of the canonical string: hashing/comparing a
    fixed-width int in the pivot's aggregation key measures ~2.5x faster
    than the stringified form, and the pivot stringifies AFTER the
    aggregate (per output row, not per input row) so the output contract
    is unchanged. When resolved files mix location-id and lat/lon place
    modes the column falls back to string for union compatibility —
    identical values either way, the type is purely an aggregation-key
    representation choice.
    """
    resolved: dict[str, TripSchema] = {}
    skipped: list[str] = []
    groups: dict[tuple, list[str]] = defaultdict(list)

    # Footer reads are metadata-only but latency-bound (one round-trip per
    # file — significant against S3 with 10^4-10^5 files). They are
    # independent, so fetch them on a driver-side thread pool; order is
    # restored by zipping back to `files`. A file whose footer cannot be
    # read (corrupt, truncated, not parquet) is skipped with an error
    # record, not a crash — reference behavior ``pivot_all_files.py:204-216``.
    def safe_footer(f: str):
        try:
            return _footer_schema(spark, f)
        except Exception:
            return None

    with ThreadPoolExecutor(max_workers=min(16, max(1, len(files)))) as pool:
        schemas = list(pool.map(safe_footer, files))

    for f, schema in zip(files, schemas):
        ts = resolve_trip_schema(schema) if schema is not None else None
        if ts is None:
            skipped.append(f)
            continue
        resolved[f] = ts
        ttype = (taxi_types or {}).get(f) or infer_taxi_type_from_path(f)
        ym = infer_month_from_path(f)
        dtype = schema[ts.datetime_col].dataType
        # Files sharing (projection recipe, taxi type, year-month) share a scan.
        groups[(ts, ttype, ym, dtype.simpleString())].append(f)

    typed_ok = typed_place and all(
        ts.place_mode == "location" for (ts, *_rest) in groups
    )
    parts: list[DataFrame] = []
    for (ts, ttype, ym, _), group_files in groups.items():
        raw = spark.read.parquet(*group_files)
        dt_type = raw.schema[ts.datetime_col].dataType
        if ts.place_mode == "location":
            loc = F.col(ts.location_col)
            place = loc if typed_ok else place_key(loc)
        elif ts.place_mode == "latlon":
            place = latlon_place_key(F.col(ts.lat_col), F.col(ts.lon_col))
        else:
            place = F.lit("")
        year, month = (ym if ym is not None else (None, None))
        parts.append(
            raw.select(
                coerce_timestamp(F.col(ts.datetime_col), dt_type).alias("pickup_datetime"),
                place.alias("pickup_place"),
                F.lit(ttype).alias("taxi_type"),
                F.lit(year).cast("int").alias("file_year"),
                F.lit(month).cast("int").alias("file_month"),
            )
        )

    if not parts:
        empty = spark.createDataFrame(
            [],
            "pickup_datetime timestamp, pickup_place string, taxi_type string, "
            "file_year int, file_month int",
        )
        return empty, IngestReport(resolved, skipped)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, IngestReport(resolved, skipped)
