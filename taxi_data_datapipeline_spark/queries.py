"""Query registry: every implemented operator exposed as (spark, sf_dir) -> DataFrame
with a matching DuckDB oracle SQL string.

This is the driver-facing correctness surface (``__spark_entry__.py`` re-exports
it). Conventions that keep the value-hash comparison honest:

* every computed column is aliased identically in the Spark plan and the SQL;
* money aggregates run as DECIMAL(18,2)/DECIMAL(38,4) sums (exact, order-
  independent) and are cast back to DOUBLE at the end, so both engines emit
  bit-identical doubles regardless of partitioning / evaluation order;
* no nondeterministic functions; ties in top-k / windows are broken by
  unique keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` -> rows-only check (non-SQL ops)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
# rejects; read them as long (legacy conf) and floor-convert to microseconds,
# matching DuckDB's ns->us truncation on the oracle side.
_NANOS_TS_COLS = {"events": ["ts"]}


# Memoized source DataFrames: a DataFrame is an immutable logical plan, so
# reusing one per (app, sf_dir, table) is safe and skips the parquet footer
# listing + schema read that spark.read.parquet pays on every call — across
# an 85-query suite that's hundreds of redundant footer reads. This is the
# engine's (tiny) catalog layer.
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, table)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    nanos_cols = _NANOS_TS_COLS.get(table, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    _LOAD_CACHE[key] = df
    return df


# Import side-effect registration of all query groups.
from taxi_data_datapipeline_spark import queries_reference  # noqa: E402,F401
from taxi_data_datapipeline_spark import queries_relational  # noqa: E402,F401
from taxi_data_datapipeline_spark import queries_data  # noqa: E402,F401
from taxi_data_datapipeline_spark import queries_advanced  # noqa: E402,F401
from taxi_data_datapipeline_spark import queries_tpch  # noqa: E402,F401
