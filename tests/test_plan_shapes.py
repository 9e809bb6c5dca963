"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, pruning, broadcast, top-k) must be visible in
`.explain` output — a correct-but-badly-planned operator fails here.
"""

from __future__ import annotations

import pytest

from taxi_data_datapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def semantic_shuffles(plan: str) -> int:
    """Count key shuffles (hash/range/single-partition exchanges). The
    round-robin scan fan-out `load()` inserts over unsplittable local
    files is deliberately excluded: it carries no grouping semantics and
    disappears at production scale where inputs arrive pre-split."""
    import re

    # Formatted plans carry the distribution in the node's Arguments line;
    # only (shuffle) Exchange nodes have these three. BroadcastExchange
    # shows *BroadcastMode and the fan-out shows roundrobinpartitioning —
    # neither matches.
    return len(
        re.findall(
            r"Arguments: (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


def test_scan_prunes_columns_and_pushes_nullfilter(spark):
    plan = plan_of(spark, "hourly_pivot")
    assert "PushedFilters: [IsNotNull(ts)]" in plan
    # events has 6 columns; the scan must read only ts, user_id, event_type.
    # ts's physical type depends on how the driver generated the parquet
    # (TIMESTAMP(NANOS) reads as bigint under nanosAsLong, TIMESTAMP(MICROS)
    # as timestamp_ntz) — the pruning property is the column SET.
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"ts", "user_id", "event_type"}, cols
    assert "props" not in plan


def test_dim_join_broadcasts(spark):
    plan = plan_of(spark, "join_broadcast_dim")
    assert "BroadcastHashJoin" in plan


def test_topk_plans_as_take_ordered(spark):
    plan = plan_of(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_semi_and_anti_join_strategies(spark):
    assert "LeftSemi" in plan_of(spark, "semi_join")
    assert "LeftAnti" in plan_of(spark, "anti_join")


def test_pivot_is_single_shuffle_conditional_agg(spark):
    import re

    plan = plan_of(spark, "hourly_pivot")
    # Conditional aggregation over the explicit hour domain: ONE key
    # shuffle (a .pivot() formulation would regroup twice), with map-side
    # partials.
    assert semantic_shuffles(plan) == 1
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_filter_pushdown_on_projection_query(spark):
    plan = plan_of(spark, "normalize_project")
    assert "PushedFilters: [IsNotNull(ts)]" in plan


@pytest.mark.parametrize("name", ["q1_pricing_summary", "distinct_users_twophase"])
def test_aggregates_have_mapside_partials(spark, name):
    plan = plan_of(spark, name)
    assert "partial_" in plan


@pytest.mark.parametrize(
    "name",
    [
        "asof_purchase_view",
        "sessionize_events",
        "hourly_pivot",
        "cdc_log_compaction",
        "ohlc_bars",
        "kmeans_assign",
        "hopping_window_counts",
        "value_histogram",
    ],
)
def test_single_shuffle_operators(spark, name):
    """Operators that promise exactly ONE shuffle — the as-of join
    (union-marker), sessionization (shared window + groupBy key), the
    conditional-aggregate pivot, struct-max compaction/OHLC,
    literal-centroid k-means assignment, the sliding-window Expand, and
    histogram binning. A second KEY shuffle appearing here is a scale
    regression, not a style choice (the round-robin scan fan-out is not
    one — see semantic_shuffles)."""

    plan = plan_of(spark, name)
    assert semantic_shuffles(plan) == 1


def test_q19_disjunction_keeps_broadcast_join(spark):
    """The OR-of-ANDs predicate must not force a cartesian/BNL plan — part
    is hint-broadcast and the disjunction evaluates as a post-join filter."""
    plan = plan_of(spark, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scalar_threshold_stays_cluster_side(spark):
    """q11's global-total threshold is a broadcast 1-row join, not a
    driver-side collect baked into the plan as a literal."""
    plan = plan_of(spark, "q11_important_value")
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_q21_is_single_grouped_pass(spark):
    """The EXISTS/NOT-EXISTS pair collapses to one groupBy(l_orderkey):
    exactly one exchange keyed on l_orderkey before the tiny s_name agg."""
    import re

    plan = plan_of(spark, "q21_waiting_supplier")
    exchanges = re.findall(r"hashpartitioning\((\w+)", plan)
    assert exchanges.count("l_orderkey") <= 2  # join + agg reuse, no extra passes


def test_salted_join_shuffles_on_composite_key(spark):
    plan = plan_of(spark, "skew_join_salted")
    # The salt must defeat the broadcast path: a shuffled hash join whose
    # key includes the salt column, splitting hot keys across reducers.
    assert "ShuffledHashJoin" in plan
    assert "salt" in plan
    assert "BroadcastHashJoin" not in plan


def test_gapfill_has_no_driver_collect_and_broadcasts_calendar(spark):
    plan = plan_of(spark, "gapfill_locf")
    # Calendar explode comes from a 1-row aggregate broadcast against the
    # user dim — a nested-loop (cross) broadcast join, never a collect.
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A date-partitioned fact joined to a filtered dim must prune fact
    partitions at RUNTIME from the dim's build side (DPP) — at 100 TB
    this is the difference between scanning 3 days and 3 years."""
    from pyspark.sql import functions as F

    from taxi_data_datapipeline_spark.queries import load

    fact_dir = str(tmp_path / "events_by_day")
    ev = load(spark, SF, "events").withColumn("d", F.to_date("ts"))
    ev.write.partitionBy("d").mode("overwrite").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    dim = (
        fact.select("d").distinct()
        .withColumn("is_hot", F.dayofmonth("d") <= 3)
        .filter("is_hot")
    )
    joined = fact.join(dim, "d").groupBy("event_type").count()
    plan = spark._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower()
    joined.write.format("noop").mode("overwrite").save()


def test_no_unbounded_global_windows_anywhere(spark):
    """Scale-killer sweep over EVERY registered batch query: a Window with
    an empty partition spec pulls the entire input into ONE partition
    ("Moving all data to a single partition"), which is fatal at 100 TB.
    A global window is tolerated only when its input is provably bounded
    (a limit or a 1-row aggregate below it) — e.g. zipf_fit ranks a
    TakeOrderedAndProject(100) result. Regression lock for VERDICT r1
    finding #3."""
    from taxi_data_datapipeline_spark.plans.audit import unbounded_global_windows

    offenders = []
    for name, fn in QUERIES.items():
        if name.startswith("streaming_"):
            continue  # streaming plans have no batch Window ranking
        if unbounded_global_windows(fn(spark, SF)):
            offenders.append(name)
    assert not offenders, f"unbounded global windows in: {offenders}"


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime row-level filtering: a selective dim predicate must inject
    a bloom filter (built from the dim's join keys) into the fact scan's
    filter — the shuffle-join analog of DPP, cutting shuffle volume
    before it happens. Thresholds are lowered because sf0.001 is below
    the 10 GB production default; the REWRITE is what's under test."""
    from pyspark.sql import functions as F  # noqa: F401

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("l_returnflag").count()
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_welch_is_two_aggregate_stages_no_join(spark):
    """Welch reduces to sufficient statistics in one partial-merge
    aggregation plus a 2-row pick aggregation: two key shuffles, zero
    joins, pushdown of the event_type IN filter to the scan."""
    plan = plan_of(spark, "welch_t_test")
    assert semantic_shuffles(plan) == 2
    assert "Join" not in plan
    assert "PushedFilters" in plan and "In(event_type" in plan


def test_silhouette_broadcasts_centroid_table(spark):
    """The k x dims centroid table must broadcast against the exploded
    point-dim stream — a shuffle join here would move every point row
    twice at corpus scale."""
    plan = plan_of(spark, "silhouette_simplified")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_perplexity_count_tables_stay_joinable(spark):
    """Eval bigrams join the train count tables without any cartesian
    product (the only BNL join allowed is the broadcast 1-row vocab
    scalar). The count tables (bc/uc) are corpus-derived, so the round-12
    broadcast sweep pinned them shuffle_hash (SCALING.md rule: never let a
    statistics estimate choose broadcast when both sides scale with the
    corpus) — keyed joins must be HASH joins of either flavor, never a
    sort-merge fallback or a nested loop."""
    plan = plan_of(spark, "bigram_perplexity")
    assert "CartesianProduct" not in plan
    # the vocab scalar rides a broadcast nested loop; everything keyed
    # is hash-joined (shuffle_hash-pinned since the r12 broadcast sweep)
    assert "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
