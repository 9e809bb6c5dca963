"""JSONL ingestion: declared schema, malformed-line quarantine, and
schema evolution across parquet generations."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from taxi_data_datapipeline_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    split_quarantine,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("kind", StringType()),
    ]
)

LINES = [
    '{"id": 1, "kind": "a"}',
    '{"id": 2, "kind": "b"}',
    "{broken json",
    '{"id": "not_a_number_but_valid_json?", "kind": "c"}',
    '{"id": 4, "kind": "d"}',
]


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join(LINES) + "\n")

    df = read_jsonl(spark, str(p), SCHEMA)
    good, bad = split_quarantine(df)

    assert sorted(r["id"] for r in good.collect() if r["id"] is not None) == [1, 2, 4]
    bad_lines = [r[CORRUPT_COL] for r in bad.collect()]
    assert "{broken json" in bad_lines


def test_jsonl_dropmalformed_drops(spark, tmp_path):
    p = tmp_path / "feed2.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    df = read_jsonl(spark, str(p), SCHEMA, mode="DROPMALFORMED").drop(CORRUPT_COL)
    assert df.count() == 4  # type-mismatch id coerces to null, line kept


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Generation 2 adds a column; a mergeSchema read sees the union with
    nulls backfilled — the evolution posture for long-lived datasets."""
    gen = str(tmp_path / "dataset")
    spark.range(3).select(F.col("id"), F.lit("x").alias("a")).write.parquet(
        f"{gen}/g=1"
    )
    spark.range(3).select(
        F.col("id"), F.lit("y").alias("a"), F.lit(7).alias("b")
    ).write.parquet(f"{gen}/g=2")

    df = spark.read.option("mergeSchema", "true").parquet(gen)
    assert set(df.columns) == {"id", "a", "b", "g"}
    assert df.filter(F.col("b").isNull()).count() == 3


def test_jsonl_roundtrip_hostile_strings(spark, tmp_path):
    """JSON escaping must keep hostile payloads line-splittable and
    value-faithful: embedded newlines, quotes, backslashes, unicode,
    empty string (JSON keeps it distinct from NULL, unlike CSV), padded
    whitespace, and bit-exact doubles."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    rows = [
        (0, "line\nbreak and \"quote\" and \\backslash\\", 0.1 + 0.2),
        (1, "unicode: naïve café 駅 🚕", 2.0 ** -1074),
        (2, "  padded  ", 1.7976931348623157e308),
        (3, "", -0.0),
        (4, None, None),
    ]
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("s", StringType()),
            StructField("x", DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "hostile_jsonl")
    df.write.mode("overwrite").json(path)
    back = read_jsonl(spark, path, schema)
    good, bad = split_quarantine(back)
    assert bad.count() == 0
    got = {r["id"]: (r["s"], r["x"]) for r in good.collect()}
    for rid, s, x in rows:
        gs, gx = got[rid]
        assert gs == s, (rid, s, gs)
        if x is None:
            assert gx is None
        else:
            assert repr(gx) == repr(x), (rid, x, gx)
    # every written line is one JSON object — embedded newlines escaped,
    # so the files stay line-splittable
    import glob
    n_lines = sum(
        sum(1 for _ in open(f)) for f in glob.glob(f"{path}/part-*.json")
    )
    assert n_lines == len(rows)
