"""Storage-layout queries: the oracle hash proves values; these pin the
layout MECHANISMS — that the partitioned read actually prunes (listing-
time, before footers), and that mergeSchema null-fills legacy files."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import QUERIES
from taxi_data_datapipeline_spark.queries_layout import _layout_dir

SF = "/root/testdata/sf0.001"


def test_partitioned_read_prunes_to_matching_days(spark):
    QUERIES["partitioned_scan_prune"](spark, SF).collect()  # materialize the write
    out = _layout_dir(SF, "events_by_day")
    pruned = spark.read.parquet(out).filter(
        (F.col("event_date") >= F.lit("2024-01-08"))
        & (F.col("event_date") <= F.lit("2024-01-14"))
    )
    # inputFiles() lists the relation BEFORE partition pruning; the files
    # actually opened are what input_file_name() reports on executed rows.
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files, "pruned scan read no files"
    days = {m.group(1) for f in files for m in [re.search(r"event_date=([0-9-]+)", f)] if m}
    assert days == {f"2024-01-{d:02d}" for d in range(8, 15)}
    # And the physical plan carries the predicate as a PartitionFilter,
    # not a post-scan Filter over all partitions.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:200]


def test_merge_schema_null_fills_legacy_rows(spark):
    df = QUERIES["schema_evolution_union"](spark, SF)
    rows = {r["channel"]: (r["n_orders"], r["revenue"]) for r in df.collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_legacy = orders.filter(F.col("o_orderkey") % 2 == 0).count()
    n_evolved = orders.filter(F.col("o_orderkey") % 2 == 1).count()
    assert rows["pre-migration"][0] == n_legacy
    assert sum(n for ch, (n, _) in rows.items() if ch != "pre-migration") == n_evolved
    # The merged frame's schema is the union: o_channel present, nullable.
    base = _layout_dir(SF, "orders_evolution")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/legacy", f"{base}/evolved"
    )
    assert "o_channel" in merged.columns
    n_null = merged.filter(F.col("o_channel").isNull()).count()
    assert n_null == n_legacy
