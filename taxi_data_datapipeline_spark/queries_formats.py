"""Format round-trip queries: ORC / CSV / JSONL sink -> source -> aggregate.

The reference engine is parquet-only (``pivot_all_files.py`` reads and
writes parquet exclusively); a complete engine also meets feeds where
they arrive. ``sources/formats.py`` and ``sources/jsonl.py`` carry the
readers/writers; these queries put each format under the FULL value-hash
oracle by round-tripping real table data through the format and
aggregating the read-back frame — the oracle computes the identical
aggregate straight from the original parquet, so any loss of fidelity in
the sink or the source (float formatting, timestamp truncation, quote /
escape handling, JSON escaping of newlines) breaks the hash.

Scale note: each round-trip writes one partitioned directory per query
per sf_dir (fixed path, overwrite mode — reruns don't accumulate). The
write runs at input parallelism; the read-back scan splits by byte range
(CSV/JSONL uncompressed) or stripe (ORC), so both legs distribute. The
CSV reader takes a DECLARED schema (never inference — a 100 TB schema
inference pass is the anti-pattern ``sources/formats.py`` documents).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from taxi_data_datapipeline_spark.queries import load, register
from taxi_data_datapipeline_spark.sources.formats import (
    read_xml,
    write_xml,
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)
from taxi_data_datapipeline_spark.sources.jsonl import read_jsonl, split_quarantine


def _rt_dir(sf_dir: str, name: str) -> str:
    """Fixed per-(query, sf_dir) scratch dir; overwrite-mode writes keep
    reruns from accumulating files."""
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir).strip("/"))
    d = os.path.join(tempfile.gettempdir(), "spark_graft_formats", f"{name}_{tag}")
    os.makedirs(d, exist_ok=True)
    return d


# Money idiom shared with the rest of the registry: sum as DECIMAL(38,0)
# of the cent-scaled value (exact, order-independent), divide back at the
# end — both engines emit bit-identical doubles regardless of partitioning.
def _money_sum(col: str, alias: str):
    return (
        F.sum((F.col(col) * 100).cast("decimal(38,0)")).cast("double") / 100
    ).alias(alias)


@register(
    "orc_roundtrip_agg",
    """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_qty,
       CAST(SUM(CAST(l_extendedprice * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100
         AS sum_price,
       CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
       MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> ORC sink -> ORC scan -> pricing-summary aggregate.

    ORC stores doubles and timestamps natively (binary, lossless) and
    splits at stripe granularity with predicate pushdown / column
    pruning, so it is the preferred at-rest alternative to parquet; the
    oracle aggregates the ORIGINAL parquet, so the hash proves the
    sink+source pair is bit-faithful end to end. Readers/writers:
    sources/formats.py (read_orc/write_orc)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    path = _rt_dir(sf_dir, "orc_rt")
    write_orc(li, path)
    back = read_orc(spark, path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        _money_sum("l_quantity", "sum_qty"),
        _money_sum("l_extendedprice", "sum_price"),
        F.sum("l_orderkey").alias("sum_key"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


_CSV_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_ORDERS_CSV_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
    ]
)


@register(
    "csv_roundtrip_agg",
    """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100
         AS sum_price,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
FROM orders
GROUP BY o_orderstatus
""",
)
def q_csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> CSV sink -> declared-schema CSV scan -> status aggregate.

    The lossy spots CSV can hide are exactly what the value-hash checks:
    doubles print as shortest-round-trip decimal strings (parse back to
    the identical bit pattern) and timestamps are pinned to an explicit
    microsecond format on BOTH legs (the default write format truncates
    to millis, which this oracle would catch). Declared schema + pinned
    formats is the deterministic posture sources/formats.py documents —
    schema inference over 100 TB is a full extra nondeterministic pass."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        # Parquet stores o_orderdate as TIMESTAMP(isAdjustedToUTC=false) ->
        # TIMESTAMP_NTZ, which the CSV writer formats with timestampNTZFormat,
        # not timestampFormat. Cast to the session-zoned type (wall-clock
        # identity under the engine's UTC session) so ONE pinned format
        # governs both legs of the round trip.
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    )
    path = _rt_dir(sf_dir, "csv_rt")
    (
        orders.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _CSV_TS_FMT)
        .csv(path)
    )
    back = read_csv(
        spark,
        path,
        _ORDERS_CSV_SCHEMA,
        header=True,
        timestampFormat=_CSV_TS_FMT,
    ).drop("_corrupt_record")
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        _money_sum("o_totalprice", "sum_price"),
        F.sum("o_orderkey").alias("sum_key"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


_DOCS_JSON_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# Every 41st document is replaced by a deliberately malformed JSON line
# (unterminated string) so the PERMISSIVE + _corrupt_record quarantine
# path runs under the oracle too — the oracle derives the same partition
# of the corpus arithmetically (doc_id % 41).
_BAD_MOD = 41


@register(
    "jsonl_roundtrip_quarantine",
    f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)) AS BIGINT)
         AS content_sum
FROM documents WHERE doc_id % {_BAD_MOD} <> 0
GROUP BY lang
UNION ALL
SELECT '__corrupt__' AS lang, COUNT(*) AS n_docs, 0 AS content_sum
FROM documents WHERE doc_id % {_BAD_MOD} = 0
""",
)
def q_jsonl_roundtrip_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> JSONL sink (+ injected malformed lines) -> PERMISSIVE
    scan with corrupt capture -> per-lang content checksum + quarantine count.

    Exercises the whole bad-record posture of sources/jsonl.py (the
    reference's coerce -> count -> keep-going behavior,
    ``pivot_all_files.py:145-150``): well-formed lines round-trip
    losslessly (JSON escapes embedded newlines, so files stay
    line-splittable), malformed lines land whole in ``_corrupt_record``
    and are counted instead of killing the scan. ``content_sum`` folds a
    32-bit md5 prefix of every surviving text, so any mangling of the
    payload — not just a lost row — breaks the value hash."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    good = docs.filter(F.col("doc_id") % _BAD_MOD != 0)
    bad = docs.filter(F.col("doc_id") % _BAD_MOD == 0).select(
        F.concat(
            F.lit('{"doc_id": '),
            F.col("doc_id").cast("string"),
            F.lit(', "text": "'),
        ).alias("value")
    )
    good_dir = _rt_dir(sf_dir, "jsonl_rt_good")
    bad_dir = _rt_dir(sf_dir, "jsonl_rt_bad")
    good.write.mode("overwrite").json(good_dir)
    bad.write.mode("overwrite").text(bad_dir)
    back = read_jsonl(spark, [good_dir, bad_dir], _DOCS_JSON_SCHEMA)
    ok, quarantined = split_quarantine(back)
    per_lang = ok.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
        ).alias("content_sum"),
    )
    corrupt = quarantined.agg(F.count("*").alias("n_docs")).select(
        F.lit("__corrupt__").alias("lang"),
        "n_docs",
        F.lit(0).cast("bigint").alias("content_sum"),
    )
    return per_lang.unionByName(corrupt)


_CUSTOMER_XML_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", LongType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)


@register(
    "xml_roundtrip_agg",
    """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100
         AS sum_acctbal,
       CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
       MIN(c_name) AS first_name,
       MAX(c_name) AS last_name
FROM customer
GROUP BY c_mktsegment
""",
)
def q_xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> XML sink -> declared-schema XML scan -> segment
    aggregate. Spark 4 ships the XML datasource natively (the old
    spark-xml package, folded in), which is where a complete engine
    meets B2B/legacy feeds. The value-hash catches the XML-specific
    loss modes: doubles must print as shortest-round-trip strings and
    parse back bit-identically, text must survive entity escaping, and
    absent-element null semantics must not invent or drop rows — the
    oracle aggregates the original parquet directly. Declared schema
    only (in XML every scalar is text; inference would read the corpus
    twice and still guess)."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    path = _rt_dir(sf_dir, "xml_rt")
    write_xml(cust, path, row_tag="customer")
    back = read_xml(spark, path, _CUSTOMER_XML_SCHEMA, row_tag="customer")
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _money_sum("c_acctbal", "sum_acctbal"),
        F.sum("c_custkey").alias("sum_key"),
        F.min("c_name").alias("first_name"),
        F.max("c_name").alias("last_name"),
    )
