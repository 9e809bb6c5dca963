"""CSV / ORC / text source round-trips, corrupt capture, and plan checks."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from taxi_data_datapipeline_spark.sources.formats import (
    CORRUPT_COL,
    read_csv,
    read_orc,
    read_text,
    write_csv,
    write_orc,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(500)
    )


def test_csv_roundtrip(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "ev_csv")
    write_csv(src, path)
    back = read_csv(spark, path, SCHEMA).drop(CORRUPT_COL)
    assert back.count() == 500
    a = src.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    b = back.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    assert tuple(a) == tuple(b)


def test_csv_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text(
        "event_id,user_id,event_type,value\n"
        "1,10,click,0.5\n"
        "not,a,number,row,extra\n"
        "2,20,view,1.5\n"
    )
    # Spark refuses to filter on only the corrupt column of a lazy CSV
    # scan (same caveat as JSON) — split_quarantine caches one parse and
    # serves both halves from it.
    from taxi_data_datapipeline_spark.sources.jsonl import split_quarantine

    df = read_csv(spark, str(p), SCHEMA)
    good, bad = split_quarantine(df)
    assert good.count() == 2
    assert bad.count() == 1
    assert "not,a,number" in bad.collect()[0][CORRUPT_COL]


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "ev_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == 500
    # Column pruning + predicate pushdown reach the ORC scan.
    q = back.filter(F.col("event_type") == "click").select("event_id")
    plan = spark._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(event_type)" in plan
    assert "ReadSchema" in plan and "value" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_text_source_lines(spark, tmp_path):
    p = tmp_path / "txt"
    p.mkdir()
    (p / "a.txt").write_text("alpha\nbeta\n")
    (p / "b.txt").write_text("gamma\n")
    df = read_text(spark, str(p))
    assert sorted(r.value for r in df.collect()) == ["alpha", "beta", "gamma"]
    whole = read_text(spark, str(p), whole=True)
    assert whole.count() == 2


def test_csv_roundtrip_hostile_strings(spark, tmp_path):
    """CSV quoting must survive the strings that break naive writers:
    embedded delimiters, double quotes, newlines (multiLine read),
    leading/trailing whitespace, unicode, empty vs NULL. Doubles must
    round-trip bit-exactly via shortest-repr formatting."""
    rows = [
        (0, 'plain', 1.5),
        (1, 'comma, inside', -0.1),
        (2, 'quote " inside', 2.0 ** -1074),      # min subnormal
        (3, 'both ", and\nnewline', 1.7976931348623157e308),
        (4, '  padded  ', 0.1 + 0.2),             # classic non-exact decimal
        (5, 'unicode: naïve café 駅 🚕', -0.0),
        (6, '', float('inf')),
        (7, None, None),
        (8, 'trailing\\backslash\\', 6.02214076e23),
    ]
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("s", StringType()),
            StructField("x", DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "hostile_csv")
    write_csv(df, path)
    back = (
        read_csv(spark, path, schema, multiLine="true")
        .drop(CORRUPT_COL)
        .orderBy("id")
        .collect()
    )
    orig = df.orderBy("id").collect()
    assert len(back) == len(orig)
    for a, b in zip(orig, back):
        assert a["id"] == b["id"]
        # Spark's CSV sink writes empty string and NULL identically by
        # default (emptyValue == nullValue == "") — both read back NULL.
        expect_s = a["s"] if a["s"] else None
        assert b["s"] == expect_s, (a["id"], a["s"], b["s"])
        if a["x"] is None:
            assert b["x"] is None
        else:
            import math
            assert math.isnan(b["x"]) if math.isnan(a["x"]) else (
                repr(a["x"]) == repr(b["x"])
            ), (a["id"], a["x"], b["x"])


def test_orc_pre_epoch_boundary_microsecond(spark, tmp_path):
    """Documents an UPSTREAM Spark/ORC writer bug so a silent fix (or
    regression elsewhere) is noticed: fractional timestamps inside the
    final second before the epoch come back +1 s from an ORC round trip
    (seconds truncate toward zero, losing the -1 s borrow); every
    neighboring value and the parquet path are exact. write_orc's
    docstring routes pre-1970 sub-second data to parquet."""
    import datetime

    from pyspark.sql.types import TimestampType

    boundary = datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)
    neighbors = [
        datetime.datetime(1969, 12, 31, 23, 59, 59),          # whole second
        datetime.datetime(1969, 12, 31, 23, 59, 58, 999999),  # prior second
        datetime.datetime(1970, 1, 1, 0, 0, 0, 1),            # after epoch
        datetime.datetime(1902, 1, 1, 3, 4, 5, 123456),       # deep pre-epoch
    ]
    schema = StructType(
        [StructField("id", LongType()), StructField("ts", TimestampType())]
    )
    rows = [(0, boundary)] + [(i + 1, n) for i, n in enumerate(neighbors)]
    df = spark.createDataFrame(rows, schema)
    orc_path = str(tmp_path / "orc_ts")
    write_orc(df, orc_path)
    back = {r["id"]: r["ts"] for r in read_orc(spark, orc_path).collect()}
    # neighbors are exact
    for i, n in enumerate(neighbors):
        assert back[i + 1] == n, (n, back[i + 1])
    # the boundary microsecond is the documented upstream corruption:
    # +1 s shift. If this assert starts failing with back[0] == boundary,
    # the upstream bug is fixed — delete the warning in write_orc.
    assert back[0] == boundary + datetime.timedelta(seconds=1)
    # parquet control: exact
    pq_path = str(tmp_path / "pq_ts")
    df.write.mode("overwrite").parquet(pq_path)
    bp = {r["id"]: r["ts"] for r in spark.read.parquet(pq_path).collect()}
    assert all(bp[i] == ts for i, ts in rows)


def test_xml_roundtrip_hostile_strings(spark, tmp_path):
    """XML entity escaping must survive markup-hostile payloads: angle
    brackets, ampersands, quotes, CDATA-lookalikes, newlines, unicode.
    Doubles round-trip bit-exactly; absent elements read back NULL."""
    from taxi_data_datapipeline_spark.sources.formats import read_xml, write_xml

    rows = [
        (0, "plain", 1.5),
        (1, "<tag> & </tag>", -0.1),
        (2, 'quote " and \' apostrophe', 2.0 ** -1074),
        (3, "]]> cdata-closer & <![CDATA[ opener", 1.7976931348623157e308),
        (4, "line\nbreak\tand tab", 0.1 + 0.2),
        (5, "unicode: naïve café 駅 🚕", -0.0),
        (6, "&amp; pre-escaped entity", 6.02214076e23),
        (7, None, None),
    ]
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("s", StringType()),
            StructField("x", DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "hostile_xml")
    write_xml(df, path, row_tag="row")
    back = read_xml(spark, path, schema, row_tag="row").orderBy("id").collect()
    orig = df.orderBy("id").collect()
    assert len(back) == len(orig)
    for a, b in zip(orig, back):
        assert a["id"] == b["id"]
        assert b["s"] == a["s"], (a["id"], a["s"], b["s"])
        if a["x"] is None:
            assert b["x"] is None
        else:
            assert repr(a["x"]) == repr(b["x"]), (a["id"], a["x"], b["x"])
