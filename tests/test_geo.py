"""Geohash encoder: published test vectors, cross-engine parity, and
prefix-hierarchy invariants."""

import duckdb
import pytest
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.functions.geo import (
    geohash_col,
    geohash_sql,
    geohash_sql_parts,
)

# Public reference points (Wikipedia "Geohash" article + geohash.org).
VECTORS = [
    (57.64911, 10.40744, "u4pruyd"),
    (42.605, -5.603, "ezs42s0"),
    (39.92324, 116.38938, "wx4g0eb"),
    (-33.86, 151.21, "r3gx2gg"),
]


def test_known_vectors_spark(spark):
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _ in VECTORS], "lat double, lon double"
    )
    got = [
        r.g
        for r in df.select(
            geohash_col(F.col("lat"), F.col("lon"), 7).alias("g")
        ).collect()
    ]
    assert got == [g for _, _, g in VECTORS]


def test_known_vectors_duckdb_parity():
    for lat, lon, expect in VECTORS:
        sql = geohash_sql(str(lat), str(lon), 7)
        assert duckdb.sql(f"SELECT {sql}").fetchone()[0] == expect


def test_prefix_hierarchy(spark):
    """A shorter geohash is a strict prefix of the longer one — the
    property that makes one fine rollup servable at every zoom."""
    df = spark.createDataFrame(
        [(lat, lon) for lat, lon, _ in VECTORS], "lat double, lon double"
    )
    rows = df.select(
        geohash_col(F.col("lat"), F.col("lon"), 7).alias("g7"),
        geohash_col(F.col("lat"), F.col("lon"), 5).alias("g5"),
        geohash_col(F.col("lat"), F.col("lon"), 3).alias("g3"),
    ).collect()
    for r in rows:
        assert r.g7.startswith(r.g5) and r.g5.startswith(r.g3)


def test_out_of_range_clamped(spark):
    """Coordinates outside [-90,90]/[-180,180] clamp to the edge cell
    instead of producing negative bit indexes."""
    df = spark.createDataFrame(
        [(91.0, 181.0), (-91.0, -181.0)], "lat double, lon double"
    )
    rows = df.select(
        geohash_col(F.col("lat"), F.col("lon"), 5).alias("g")
    ).collect()
    assert rows[0].g == "zzzzz"
    assert rows[1].g == "00000"


def test_sql_parts_compose():
    x, y, inter, concat = geohash_sql_parts("57.64911", "10.40744", 7)
    got = duckdb.sql(
        f"SELECT {concat} FROM (SELECT ({inter}) AS gi FROM "
        f"(SELECT {x} AS gx, {y} AS gy))"
    ).fetchone()[0]
    assert got == "u4pruyd"


def test_codegen_no_python_udf(spark):
    """The encoder must stay JVM-side: its plan contains no Python eval."""
    df = spark.range(100).select(
        (F.col("id") * 0.001 + 40.0).alias("lat"),
        (F.col("id") * -0.002 - 73.0).alias("lon"),
    )
    out = df.select(geohash_col(F.col("lat"), F.col("lon"), 6).alias("g"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
