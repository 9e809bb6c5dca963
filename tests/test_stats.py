"""Unit tests for the statistics tier's shared machinery: the bucketed
two-phase cumulation, BPE merge semantics, and known-value statistics."""

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import QUERIES  # registers all
from taxi_data_datapipeline_spark.queries_stats import _cumulative_counts

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_cumulative_counts_match_global_window(spark):
    """The bucketed two-phase cumulation must equal a plain global-window
    cumsum on every prefix — bucketing is a partitioning choice, not a
    semantic one."""
    import random

    rng = random.Random(7)
    rows = [
        (rng.uniform(-50.0, 50.0), rng.randint(0, 5), rng.randint(0, 5))
        for _ in range(500)
    ]
    # duplicate some values to exercise tie grouping
    rows += rows[:50]
    s = (
        spark.createDataFrame(rows, "value double, a long, b long")
        .groupBy("value")
        .agg(F.sum("a").alias("c1"), F.sum("b").alias("c2"))
    )
    got = {
        r["value"]: (r["f1"], r["f2"])
        for r in _cumulative_counts(s).collect()
    }
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    expect = {
        r["value"]: (r["f1"], r["f2"])
        for r in s.select(
            "value",
            F.sum("c1").over(w).alias("f1"),
            F.sum("c2").over(w).alias("f2"),
        ).collect()
    }
    assert got == expect


def test_cumulative_counts_constant_value(spark):
    """vmax == vmin must not divide by zero (single bucket)."""
    s = spark.createDataFrame(
        [(1.5, 2, 3), (1.5, 1, 1)], "value double, c1 long, c2 long"
    ).groupBy("value").agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
    rows = _cumulative_counts(s).collect()
    assert len(rows) == 1 and rows[0]["f1"] == 3 and rows[0]["f2"] == 4


def test_bpe_merge_semantics_greedy_overlap(spark):
    """'aaa' under merge (a,a) must become [aa, a] — greedy left-to-right,
    exactly what separator-guarded replace produces."""
    df = spark.createDataFrame([("aaa",), ("aabaa",)], "word string")
    rep = F.concat(F.lit("|"), F.regexp_replace(F.col("word"), "(.)", "$1|"))
    merged = df.select(
        F.expr(
            "replace({r}, '|a|a|', '|aa|')".format(r="concat('|', regexp_replace(word, '(.)', '$1|'))")
        ).alias("m")
    ).collect()
    assert merged[0].m == "|aa|a|"
    assert merged[1].m == "|aa|b|aa|"


def test_bpe_no_partial_symbol_merge(spark):
    """Pair (a, c) must NOT merge inside symbol 'ba' followed by 'c' —
    the separator guard makes partial-symbol matches impossible."""
    df = spark.createDataFrame([("x",)], "word string")
    out = df.select(
        F.expr("replace('|ba|c|', '|a|c|', '|ac|')").alias("m")
    ).collect()
    assert out[0].m == "|ba|c|"


def test_gini_known_values(spark, tmp_path):
    """Perfect equality -> 0; full concentration -> (n-1)/n."""
    import duckdb

    eq = duckdb.sql(
        """
    WITH rev(y) AS (SELECT 100 FROM range(10)),
    grp AS (SELECT y, COUNT(*) AS c FROM rev GROUP BY y),
    cum AS (SELECT y, c, CAST(SUM(c) OVER (ORDER BY y) AS BIGINT) AS f FROM grp),
    st AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(y*c) AS BIGINT) AS s FROM grp),
    t2 AS (SELECT CAST(SUM(y*c*(2*f - c + 1)) AS BIGINT) AS t2 FROM cum)
    SELECT ROUND(CAST(t2.t2 AS DOUBLE)/CAST(st.n*st.s AS DOUBLE)
                 - CAST(st.n+1 AS DOUBLE)/st.n, 6) FROM st CROSS JOIN t2
    """
    ).fetchone()[0]
    assert eq == 0.0
    conc = duckdb.sql(
        """
    WITH rev(y) AS (SELECT CASE WHEN i = 9 THEN 1000 ELSE 0 END FROM range(10) t(i)),
    grp AS (SELECT y, COUNT(*) AS c FROM rev GROUP BY y),
    cum AS (SELECT y, c, CAST(SUM(c) OVER (ORDER BY y) AS BIGINT) AS f FROM grp),
    st AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(y*c) AS BIGINT) AS s FROM grp),
    t2 AS (SELECT CAST(SUM(y*c*(2*f - c + 1)) AS BIGINT) AS t2 FROM cum)
    SELECT ROUND(CAST(t2.t2 AS DOUBLE)/CAST(st.n*st.s AS DOUBLE)
                 - CAST(st.n+1 AS DOUBLE)/st.n, 6) FROM st CROSS JOIN t2
    """
    ).fetchone()[0]
    assert conc == 0.9  # (n-1)/n for n=10


def test_ks_hand_computed(spark):
    """KS between {1,2} and {2,3}: ECDF diffs are 1/2 at v=1, 1/2 at v=2
    (F1=1, F2=1/2), 0 at v=3 -> D = 0.5."""
    from taxi_data_datapipeline_spark.queries_stats import _two_sample_counts  # noqa: F401

    rows = [("purchase", 1.0), ("purchase", 2.0), ("view", 2.0), ("view", 3.0)]
    s = (
        spark.createDataFrame(rows, "event_type string, value double")
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c2"),
        )
    )
    cum = _cumulative_counts(s)
    units = [
        (r["value"], abs(r["f1"] * 2 - r["f2"] * 2))
        for r in cum.collect()
    ]
    assert max(u for _, u in units) == 2  # D = 2/(2*2) = 0.5


def test_theil_sen_on_perfect_line(spark):
    """A perfectly linear series must yield exactly its slope."""
    pts = spark.createDataFrame(
        [(d, 5 * d + 100) for d in range(20)], "d long, y long"
    )
    a = pts.select(F.col("d").alias("d1"), F.col("y").alias("y1"))
    b = pts.select(F.col("d").alias("d2"), F.col("y").alias("y2"))
    pairs = a.join(b, F.col("d2") > F.col("d1")).select(
        (
            (F.col("y2") - F.col("y1")).cast("double")
            / (F.col("d2") - F.col("d1"))
        ).alias("slope")
    )
    grp = pairs.groupBy("slope").agg(F.count(F.lit(1)).alias("c"))
    rows = grp.collect()
    assert len(rows) == 1 and rows[0]["slope"] == 5.0


def test_grid_dbscan_runs_and_covers_core_points(spark):
    """Every core cell lands in exactly one cluster; cluster label is a
    member cell id (min-label invariant)."""
    out = QUERIES["grid_dbscan"](spark, SF).collect()
    total_cells = sum(r["n_cells"] for r in out)
    assert total_cells > 0
    assert all(r["n_locations"] >= r["n_cells"] for r in out)


def test_grouped_cumulative_counts_match_group_window(spark):
    """The per-group bucketed cumulation must equal a plain per-group
    window cumsum on every prefix, including single-value groups."""
    import random

    from taxi_data_datapipeline_spark.operators.cumulative import (
        grouped_cumulative_counts,
    )

    rng = random.Random(11)
    rows = [
        (f"g{rng.randint(0, 3)}", rng.uniform(-50.0, 50.0), rng.randint(1, 5))
        for _ in range(400)
    ] + [("solo", 3.25, 7)]
    s = (
        spark.createDataFrame(rows, "grp string, value double, a long")
        .groupBy("grp", "value")
        .agg(F.sum("a").alias("c1"))
    )
    got = {
        (r["grp"], r["value"]): r["f1"]
        for r in grouped_cumulative_counts(s).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expect = {
        (r["grp"], r["value"]): r["f1"]
        for r in s.select(
            "grp", "value", F.sum("c1").over(w).alias("f1")
        ).collect()
    }
    assert got == expect
