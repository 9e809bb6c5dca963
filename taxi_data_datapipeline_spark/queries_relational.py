"""Standard relational surface (SURVEY §7.2 step 4) — the operators the
reference lacks entirely (§2.5-§2.8): joins of every flavor, window
functions, grouping sets, set operations, top-k, distinct aggregation,
JSON/string/date scalars.

All plans are declarative DataFrame code: Catalyst picks broadcast vs
sort-merge joins (dims < autoBroadcastJoinThreshold broadcast automatically;
`F.broadcast` hints mark intent where the dim is provably small), pushes
filters into the parquet scans, and prunes columns.

Float-parity convention (see queries.py module doc): money aggregates are
DECIMAL sums cast back to DOUBLE — exact and order-independent, so shuffle
partitioning can't change the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import load, register


def _dec_sum(col, scale: int = 2, alias: str | None = None):
    """Exact decimal sum of a double expression, surfaced as DOUBLE."""
    out = F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


# --- aggregation ------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: multi-measure grouped aggregation.

    Partial aggregation is map-side (6 groups -> trivially small shuffle);
    at 100 TB this plan is scan-bound, which is optimal.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity"), 2, "sum_qty"),
            _dec_sum(F.col("l_extendedprice"), 2, "sum_base_price"),
            _dec_sum(disc_price, 4, "sum_disc_price"),
            _dec_sum(disc_price * (1 + F.col("l_tax")), 6, "sum_charge"),
            (_dec_sum(F.col("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "distinct_agg",
    """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent from the reference, §2.4 note)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )


@register("approx_distinct")  # HLL sketches differ across engines -> rows-only
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB way to count
    distincts without a giant exact-distinct shuffle. No oracle: sketch
    estimates are engine-specific by construction. rsd=2% quarters the
    HLL register arrays vs 1% (register count scales 1/rsd^2) at ample
    accuracy for routing/planning use."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


@register(
    "rollup_agg",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       GROUPING(l_returnflag)::INT AS g_flag,
       GROUPING(l_linestatus)::INT AS g_status
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() markers (hierarchical subtotals)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), 2, "sum_qty"),
        F.count("*").alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@register(
    "cube_agg",
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        _dec_sum(F.col("o_totalprice"), 2, "sum_price"),
        F.count("*").alias("n"),
    )


# --- joins ------------------------------------------------------------------


@register(
    "join_broadcast_dim",
    """
SELECT n.n_name AS nation, r.r_name AS region,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def q_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact x two tiny dims. Both dims broadcast (hinted — they
    are O(10..100) rows at any SF), so the fact table never shuffles for
    the join; the only exchange is the final small groupBy."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            _dec_sum(F.col("c_acctbal"), 2, "total_acctbal"),
        )
    )


@register(
    "q3_shipping_priority",
    """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact joins -> grouped revenue.

    The c_mktsegment filter prunes customer before the join (pushed to the
    scan); at scale the filtered customer side broadcasts or AQE converts
    the join after seeing runtime stats."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
    )


@register(
    "q5_local_supplier_volume",
    """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a compound join condition."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
    )


@register(
    "semi_join",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no RECENT orders (the
    no-orders-at-all form returns zero rows at every test SF — a check
    that can't fail is no check; the dated predicate keeps a non-trivial
    result at sf0.001/0.01/0.1: 65/615/6156 rows)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "outer_join_agg",
    """
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
)
def q_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + per-customer order stats (zero for orderless)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            ).cast("double").alias("total_spent"),
        )
    )


@register(
    "range_join",
    """
SELECT o.o_orderkey, COUNT(*) AS n_ship_within_30d
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderkey
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: equi-key + date-interval predicate. The equi key makes
    this a hash join with a residual range filter — no O(n*m) blowup."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAY"))
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count("*").alias("n_ship_within_30d"))


# --- windows ----------------------------------------------------------------


@register(
    "window_rank",
    """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderpriority) AS prio_rank
  FROM orders)
WHERE rn <= 3
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: top-3 orders per customer by price (unique-key tie
    break) + a rank with ties. One shuffle on the partition key."""
    o = load(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_price).alias("rn"),
            F.rank().over(w_prio).alias("prio_rank"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running",
    """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS prev_order,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS next_order
FROM orders
""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum + lag/lead over a deterministic order."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


# --- sorts / limits / set ops -------------------------------------------------


@register(
    "topk_orders",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans orderBy+limit as TakeOrderedAndProject (per-
    partition heaps + driver merge of k rows — no global sort at 100 TB)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "set_ops",
    """
SELECT c_nationkey AS nationkey, 'both' AS which
FROM customer
INTERSECT
SELECT s_nationkey, 'both' FROM supplier
UNION ALL
SELECT * FROM (
  SELECT c_nationkey, 'customer_only' FROM customer
  EXCEPT
  SELECT s_nationkey, 'customer_only' FROM supplier)
""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over nation keys."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = c.intersect(s).withColumn("which", F.lit("both"))
    only_c = c.subtract(s).withColumn("which", F.lit("customer_only"))
    return both.unionByName(only_c)


@register(
    "union_normalize",
    """
SELECT o_orderkey AS id, 'order' AS kind, o_totalprice AS amount FROM orders
UNION ALL
SELECT event_id, 'event', value FROM events
""",
)
def q_union_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all with schema alignment (reference U1/U2 generalized)."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.lit("order").alias("kind"),
        F.col("o_totalprice").alias("amount"),
    )
    e = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.lit("event").alias("kind"),
        F.col("value").alias("amount"),
    )
    return o.unionByName(e)


# --- scalar surface ----------------------------------------------------------


@register(
    "json_extract",
    """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE props IS NOT NULL
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props payload column."""
    e = load(spark, sf_dir, "events")
    return e.filter(F.col("props").isNotNull()).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "string_funcs",
    """
SELECT doc_id,
       LOWER(SUBSTR(text, 1, 20)) AS head,
       LENGTH(text) AS n_chars2,
       REPLACE(source, 'src', 'source_') AS src,
       CASE WHEN CONTAINS(text, 'spark') THEN 1 ELSE 0 END AS has_spark
FROM documents
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface over documents."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("head"),
        F.length("text").alias("n_chars2"),
        F.regexp_replace("source", "src", "source_").alias("src"),
        F.when(F.col("text").contains("spark"), 1).otherwise(0).alias("has_spark"),
    )


@register(
    "date_funcs",
    """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate)::INT AS y,
       EXTRACT(month FROM o_orderdate)::INT AS m,
       EXTRACT(day FROM o_orderdate)::INT AS d,
       ISODOW(o_orderdate)::INT AS iso_dow,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (reference F2-F4 generalized)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.expr("extract(dayofweek_iso FROM o_orderdate)").cast("int").alias("iso_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
    )


@register(
    "case_when_agg",
    """
SELECT EXTRACT(year FROM o_orderdate)::INT AS y,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O')) AS n_other,
       CAST(SUM(CAST(CASE WHEN o_totalprice > 150000 THEN o_totalprice ELSE 0 END
                AS DECIMAL(18,2))) AS DOUBLE) AS big_order_value
FROM orders
GROUP BY 1
""",
)
def q_case_when_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (reference A3 generalized to FILTER/CASE)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("y")).agg(
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(~F.col("o_orderstatus").isin("F", "O")).alias("n_other"),
        F.sum(
            F.when(F.col("o_totalprice") > 150000, F.col("o_totalprice"))
            .otherwise(0)
            .cast("decimal(18,2)")
        ).cast("double").alias("big_order_value"),
    )


# --- TPC-H-style additions ----------------------------------------------------


@register(
    "q4_order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: EXISTS decorrelates to a left-semi join — Catalyst
    plans it shuffle-hash/broadcast on o_orderkey with the date filter
    pushed into both scans."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: the pure scan-predicate query — every conjunct is
    parquet-pushable, so row groups outside the ship-date year never load."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q12_shipmode_priority",
    """
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_linestatus
""",
)
def q_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: fact-fact equi-join + conditional counts. Both
    sides shuffle on orderkey once; the priority CASE runs post-join."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.count_if(hi).alias("high_line_count"),
            F.count_if(~hi).alias("low_line_count"),
        )
    )


@register(
    "array_agg_nations",
    """
SELECT r_name, array_to_string(list_sort(list(n_name)), '|') AS nations,
       COUNT(*) AS n
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
""",
)
def q_array_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation surface: collect_list is order-nondeterministic
    under shuffle, so results are sort_array'd, then serialized to a
    delimited string at the query boundary — array-typed output columns
    are unhashable in pandas-based canonicalizers, and the sort makes the
    serialization loss-free across engines."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "variant_shred",
    """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
""",
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type:
    `parse_json` turns the raw JSON payload into a binary variant ONCE,
    then typed `variant_get` paths shred it — the open-format answer to
    repeated `get_json_object` string re-parsing (each call re-parses the
    whole JSON; variant parses once and navigates an offset-encoded
    tree). The aggregate is integer-only, so the oracle (DuckDB's native
    JSON extraction) is exact."""
    e = load(spark, sf_dir, "events")
    v = e.filter(F.col("props").isNotNull()).select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    # DuckDB SUM(BIGINT) widens to HUGEINT; cast BOTH engines to a concrete
    # bigint so the canonicalized values carry identical types.
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "topk_per_group",
    """
SELECT n_name, p_partkey, revenue FROM (
  SELECT n.n_name, l.l_partkey AS p_partkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS revenue,
         ROW_NUMBER() OVER (
           PARTITION BY n.n_name
           ORDER BY CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(18,4))) AS DOUBLE) DESC,
                    l.l_partkey) AS rn
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, l.l_partkey
) WHERE rn <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts PER supplier nation — the filtered
    top-k-per-group shape (rank + filter), distinct from global top-k
    (`topk_orders`, TakeOrderedAndProject) and from rank-as-output
    (`window_rank`). The window runs over the already-aggregated
    (nation, part) table, never raw lineitem; ties break on the unique
    part key so the hash is stable."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue").desc(), F.col("p_partkey")
    )
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "p_partkey", "revenue")
    )


@register(
    "skew_diagnostics",
    """
WITH k1 AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
k2 AS (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
k3 AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
s1 AS (
  SELECT 'lineitem.l_partkey' AS key_col, CAST(SUM(c) AS BIGINT) AS n_rows,
         COUNT(*) AS n_keys, CAST(MAX(c) AS BIGINT) AS top1_rows,
         ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top1_share,
         ROUND(quantile_cont(c, 0.99e0) / quantile_cont(c, 0.5e0), 6)
           AS p99_over_p50
  FROM k1),
s2 AS (
  SELECT 'lineitem.l_suppkey', CAST(SUM(c) AS BIGINT), COUNT(*),
         CAST(MAX(c) AS BIGINT),
         ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6),
         ROUND(quantile_cont(c, 0.99e0) / quantile_cont(c, 0.5e0), 6)
  FROM k2),
s3 AS (
  SELECT 'events.user_id', CAST(SUM(c) AS BIGINT), COUNT(*),
         CAST(MAX(c) AS BIGINT),
         ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6),
         ROUND(quantile_cont(c, 0.99e0) / quantile_cont(c, 0.5e0), 6)
  FROM k3)
SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
""",
)
def q_skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the pre-flight report a 100 TB join
    plan needs: per candidate key column, row/key counts, the hottest
    key's share, and the p99/p50 per-key-count ratio (the number that
    says 'salt this join' when it blows up). Each column costs one
    groupBy to the per-key count table plus a 1-row re-aggregate of that
    (already aggregate-sized) table; the three reports union. Shares and
    quantile ratios are single double divisions, rounded once.
    """
    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        counts = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        qs = F.percentile("c", F.array(F.lit(0.5), F.lit(0.99)))
        return counts.agg(
            F.lit(label).alias("key_col"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").cast("bigint").alias("top1_rows"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                "top1_share"
            ),
            F.round(
                F.element_at(qs, 2) / F.element_at(qs, 1), 6
            ).alias("p99_over_p50"),
        )

    li = load(spark, sf_dir, "lineitem")
    ev = load(spark, sf_dir, "events")
    return (
        profile(li, "l_partkey", "lineitem.l_partkey")
        .unionByName(profile(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionByName(profile(ev, "user_id", "events.user_id"))
    )
