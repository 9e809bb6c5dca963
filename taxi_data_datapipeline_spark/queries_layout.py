"""Storage-layout queries: hive-partitioned writes with partition-pruned
reads, and schema evolution across parquet file generations.

At 100 TB the dominant cost is usually the SCAN, and the two levers that
cut it without touching the query are (a) directory layout — a
hive-partitioned table turns a date predicate into a listing-time prune
that never opens the non-matching files' footers — and (b) tolerating
schema drift in place, so a new column doesn't force a full rewrite of
petabytes of history. Both are exercised here under the full value-hash
oracle: each query round-trips real table data through the layout and
aggregates the read-back frame, while the oracle computes the identical
aggregate straight from the original parquet.

Reference parity: the reference pipeline globs flat monthly files and
re-reads everything per run (pivot_all_files.py's directory walk); these
queries are the layout-aware upgrade path a Spark deployment would take.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import load, register


def _layout_dir(sf_dir: str, name: str) -> str:
    """Fixed per-(query, sf_dir) scratch dir; overwrite-mode writes keep
    reruns from accumulating files (same convention as queries_formats)."""
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir).strip("/"))
    d = os.path.join(tempfile.gettempdir(), "spark_graft_layout", f"{name}_{tag}")
    os.makedirs(d, exist_ok=True)
    return d


@register(
    "partitioned_scan_prune",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_value
FROM events
WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
  AND CAST(ts AS DATE) <= DATE '2024-01-14'
GROUP BY event_type
""",
)
def q_partitioned_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events written hive-partitioned by day, then read back with a date
    predicate that prunes at LISTING time: the filter matches the
    partition column, so non-matching directories are skipped before any
    footer is opened — `tests/test_layout.py` pins that the scan's
    inputFiles() contain only the seven matching day directories. This is
    the layout the reference's month-globbing filename convention
    (yellow_tripdata_YYYY-MM) approximates by hand; hive partitioning
    makes it a catalog property the optimizer applies to EVERY query.
    Scale note: the write shuffles by day so each partition directory is
    one file at this size (repartition before partitionBy avoids the
    files-per-task x partitions small-file explosion at 1000 executors)."""
    out = _layout_dir(sf_dir, "events_by_day")
    events = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        events.repartition("event_date")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        (F.col("event_date") >= F.lit("2024-01-08"))
        & (F.col("event_date") <= F.lit("2024-01-14"))
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum((F.col("value") * 100).cast("decimal(38,0)")).cast("double")
            / 100
        ).alias("sum_value"),
    )


@register(
    "schema_evolution_union",
    """
WITH tagged AS (
  SELECT o_totalprice,
         CASE WHEN o_orderkey % 2 = 1
              THEN 'ch' || CAST(o_orderkey % 3 AS VARCHAR)
              ELSE NULL END AS o_channel
  FROM orders
)
SELECT COALESCE(o_channel, 'pre-migration') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100
         AS revenue
FROM tagged
GROUP BY 1
""",
)
def q_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet generations of the orders table — a legacy file
    written before the ``o_channel`` column existed and an evolved file
    carrying it — read back as ONE frame with ``mergeSchema=true``:
    Spark unions the footer schemas and fills the missing column with
    NULL for legacy files, so history never needs rewriting when a
    column lands. The aggregate groups on COALESCE(o_channel,
    'pre-migration'), which value-hash-checks both the evolved rows'
    channel values AND the null-fill semantics of the legacy rows.
    Scale note: schema merge reads ONE footer per distinct file schema
    set (spark.sql.parquet.mergeSchema does a distributed footer
    collect); the data pages of unqueried columns are never read."""
    base = _layout_dir(sf_dir, "orders_evolution")
    legacy_dir, evolved_dir = f"{base}/legacy", f"{base}/evolved"
    orders = load(spark, sf_dir, "orders")
    legacy = orders.filter(F.col("o_orderkey") % 2 == 0)
    evolved = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_channel",
        F.concat(F.lit("ch"), (F.col("o_orderkey") % 3).cast("string")),
    )
    legacy.write.mode("overwrite").parquet(legacy_dir)
    evolved.write.mode("overwrite").parquet(evolved_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        legacy_dir, evolved_dir
    )
    return merged.groupBy(
        F.coalesce(F.col("o_channel"), F.lit("pre-migration")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        (
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)")).cast(
                "double"
            )
            / 100
        ).alias("revenue"),
    )


@register(
    "acid_time_travel",
    """
SELECT * FROM (
  SELECT 'v0' AS snapshot, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_value
  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'
  GROUP BY event_type
  UNION ALL
  SELECT 'latest' AS snapshot, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_value
  FROM events
  GROUP BY event_type)
""",
)
def q_acid_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional-table round trip (sources/txlog.py): commit the
    first half-month of events as version 0, append the rest as version
    1, COMPACT as version 2, then aggregate the time-traveled v0
    snapshot and the post-compaction latest snapshot in one result. The
    oracle recomputes both aggregates straight from the source events —
    proving commit atomicity, snapshot resolution through the
    add/remove fold, and compaction's content-preservation in one
    value-hashed query. The log is one tiny JSON per commit; reads stay
    ordinary distributed parquet scans of the resolved file set."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F  # noqa: F811 (module-level alias)

    from taxi_data_datapipeline_spark.sources.txlog import TxTable

    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    tdir = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_layout",
        "acid_" + re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir).strip("/")),
    )
    shutil.rmtree(tdir, ignore_errors=True)
    t = TxTable(spark, tdir)
    cutoff = F.to_date(F.col("ts")) <= F.lit("2024-01-15").cast("date")
    t.append(ev.filter(cutoff))
    # explicit complement: NULL-ts rows must land in exactly one append
    # (a bare ~cutoff drops them from BOTH halves while the oracle's
    # unfiltered aggregates still count them)
    t.append(ev.filter(~F.coalesce(cutoff, F.lit(False))))
    t.compact()

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (
                F.sum((F.col("value") * 100).cast("decimal(38,0)")).cast("double")
                / 100
            ).alias("sum_value"),
        ).select(F.lit(tag).alias("snapshot"), "event_type", "n_events", "sum_value")

    return agg(t.read(0), "v0").unionByName(agg(t.read(), "latest"))


@register(
    "streaming_tx_sink",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sum_value
FROM events GROUP BY event_type
""",
)
def q_streaming_tx_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming -> transactional table, end-to-end
    exactly-once: the events file stream drains through foreachBatch into
    a TxTable via idempotent (app_id, batch_id) commits, then batch 0 is
    deliberately RE-DELIVERED (the failure/replay case) before reading
    the table back — if the txn high-water mark failed to suppress the
    replay, every count would double and the value-hash oracle (a plain
    aggregate over the source events) would catch it. This is the
    lakehouse sink contract: Spark's checkpoint gives at-least-once batch
    delivery, the table's txn log makes it exactly-once."""
    import shutil
    import tempfile

    from taxi_data_datapipeline_spark.queries_advanced import (
        _stream_events,
        _stream_session,
    )
    from taxi_data_datapipeline_spark.sources.txlog import TxSink, TxTable

    spark = _stream_session(spark, sf_dir)
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir).strip("/"))
    base = os.path.join(tempfile.gettempdir(), "spark_graft_layout", f"txsink_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    t = TxTable(spark, os.path.join(base, "tbl"))
    sink = TxSink(t, app_id="events_ingest")

    def on_batch(bdf: DataFrame, bid: int) -> None:
        sink.append_batch(bdf.select("event_type", "value"), bid)

    q = (
        _stream_events(spark, sf_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # replay batch 0 in full — must be a no-op under the txn watermark
    replayed = sink.append_batch(
        load(spark, sf_dir, "events").select("event_type", "value"), 0
    )
    assert replayed is None, "exactly-once violated: replayed batch committed"
    return t.read().groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.sum((F.col("value") * 100).cast("decimal(38,0)")).cast("double")
            / 100
        ).alias("sum_value"),
    )


@register(
    "acid_merge_upsert",
    """
WITH src AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey + 1000000000, 'N' AS o_orderstatus, o_totalprice
  FROM orders WHERE o_orderstatus = 'P'),
merged AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM src)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(38,0))) AS DOUBLE) / 100
         AS sum_price
FROM merged GROUP BY o_orderstatus
""",
)
def q_acid_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the transactional table: commit orders as version 0,
    upsert a source that UPDATES every finished order (price doubled)
    and INSERTS key-shifted copies of the open ones, then aggregate the
    merged snapshot. The oracle states the same WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT semantics as an anti-join + union over the
    source table — proving the copy-on-write rewrite byte-for-byte. The
    pre-merge snapshot stays time-travel readable (pinned in
    tests/test_txlog.py)."""
    import shutil
    import tempfile

    from taxi_data_datapipeline_spark.sources.txlog import TxTable, merge_upsert

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir).strip("/"))
    tdir = os.path.join(
        tempfile.gettempdir(), "spark_graft_layout", f"merge_{tag}"
    )
    shutil.rmtree(tdir, ignore_errors=True)
    t = TxTable(spark, tdir)
    t.append(orders)
    updates = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    inserts = orders.filter(F.col("o_orderstatus") == "P").select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    merge_upsert(t, updates.unionByName(inserts), ["o_orderkey"])
    return t.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (
            F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)")).cast(
                "double"
            )
            / 100
        ).alias("sum_price"),
    )


@register(
    "acid_change_feed",
    """
WITH half AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
SELECT 0 AS version, 'append' AS operation, half.n AS n_rows FROM half
UNION ALL
SELECT 1, 'append', tot.n FROM tot
UNION ALL
SELECT 2, 'compact', tot.n FROM tot
""",
)
def q_acid_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed over the transactional log: replay the audit trail
    (version, operation) and the row count visible at each snapshot —
    the table-history view a lakehouse exposes as DESCRIBE HISTORY +
    change data feed. Reuses the acid_time_travel commit sequence
    (append half / append rest / compact); each snapshot's count is an
    independent time-travel read resolved through the log fold, so the
    oracle (counts straight from the source) re-proves every
    intermediate version, not just the tip."""
    import shutil
    import tempfile

    from taxi_data_datapipeline_spark.sources.txlog import TxTable

    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.abspath(sf_dir).strip("/"))
    tdir = os.path.join(
        tempfile.gettempdir(), "spark_graft_layout", f"cdf_{tag}"
    )
    shutil.rmtree(tdir, ignore_errors=True)
    t = TxTable(spark, tdir)
    cutoff = F.to_date(F.col("ts")) <= F.lit("2024-01-15").cast("date")
    t.append(ev.filter(cutoff))
    # explicit complement: NULL-ts rows must land in exactly one append
    # (a bare ~cutoff drops them from BOTH halves while the oracle's
    # unfiltered aggregates still count them)
    t.append(ev.filter(~F.coalesce(cutoff, F.lit(False))))
    t.compact()
    feeds = []
    for info in t.history():
        feeds.append(
            t.read(info.version)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
            .select(
                F.lit(info.version).alias("version"),
                F.lit(info.operation).alias("operation"),
                "n_rows",
            )
        )
    out = feeds[0]
    for f in feeds[1:]:
        out = out.unionByName(f)
    return out
