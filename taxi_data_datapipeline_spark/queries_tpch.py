"""Deeper TPC-H-style relational coverage (SURVEY §7.2 step 4, continued).

The driver's synthetic schema is slimmer than real TPC-H (no partsupp, no
l_commitdate/l_receiptdate), so the classic queries whose *plan shapes*
matter — correlated scalar subqueries, disjunctive join predicates,
global-threshold HAVING, distribution-of-counts, min-cost lookup joins —
are re-expressed over the columns that exist. Each docstring names the
TPC-H query whose shape it exercises.

Parity conventions (see queries.py):
* money sums are DECIMAL casts -> DOUBLE (exact, order-independent);
* ratios / float outputs ROUND(.,6) with identical association order in
  Spark and the DuckDB oracle;
* scalar-subquery thresholds are computed from exact decimal sums so both
  engines compare against bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import load, register


def _dec_sum(col, scale: int = 2, alias: str | None = None):
    out = F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


_REV = lambda: F.col("l_extendedprice") * (1 - F.col("l_discount"))  # noqa: E731


@register(
    "q2_min_cost_source",
    """
WITH unit AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_price) AS best_price FROM unit GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
       ROUND(u.unit_price, 6) AS unit_price
FROM part p
JOIN best b ON p.p_partkey = b.l_partkey
JOIN unit u ON u.l_partkey = b.l_partkey AND u.unit_price = b.best_price
JOIN supplier s ON u.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_size < 10
""",
)
def q2_min_cost_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier, correlated MIN subquery) without
    partsupp: the cheapest observed unit price per part comes from lineitem.

    Decorrelates to agg -> agg -> join-back on (key, min) — two shuffles on
    l_partkey that AQE coalesces; the tiny supplier/nation dims broadcast.
    IEEE double division + MIN are bit-deterministic, so the equality join
    on the min value is exact in both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    unit = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("best_price"))
    p = load(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        p.join(best.hint("shuffle_hash"), p.p_partkey == best.l_partkey)
        .join(
            unit.alias("u"),
            (F.col("u.l_partkey") == best.l_partkey)
            & (F.col("u.unit_price") == F.col("best_price")),
        )
        .join(F.broadcast(s), F.col("u.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("u.unit_price"), 6).alias("unit_price"),
        )
    )


@register(
    "q7_volume_shipping",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l.l_shipdate)::INT AS y,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, y
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations.

    The disjunctive nation-pair predicate sits above two *broadcast* dim
    joins (supplier->nation, customer->nation), so the fact tables shuffle
    only for the lineitem-orders equi-join — one big exchange total.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("y"))
        .agg(_dec_sum(_REV(), 4, "revenue"))
    )


@register(
    "q8_market_share",
    """
WITH all_nations AS (
  SELECT EXTRACT(year FROM o.o_orderdate)::INT AS y,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT y,
       ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END
                           AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
FROM all_nations GROUP BY y
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional PROMO-part revenue per
    year. Share = conditional-decimal-sum / decimal-sum, assembled in double
    with identical association on both engines, then ROUND(.,6)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0).cast("decimal(18,4)")
    ).cast("double")
    share_den = F.sum(vol.cast("decimal(18,4)")).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(F.round(share_num / share_den, 6).alias("mkt_share"))
    )


@register(
    "q9_product_profit",
    """
SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate)::INT AS y,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - CAST(0.6 AS DOUBLE) * p.p_retailprice * l.l_quantity
                AS DECIMAL(18,4))) AS DOUBLE) AS profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, y
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit) with p_retailprice standing in
    for the missing ps_supplycost (cost proxy = 0.6 * retail). The LIKE
    filter prunes part before its broadcast; profit is an exact decimal sum
    of a per-row double expression with matched association order."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = _REV() - F.lit(0.6).cast("double") * F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("y"))
        .agg(_dec_sum(profit, 4, "profit"))
    )


@register(
    "q11_important_value",
    """
WITH pv AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM pv
WHERE part_value > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                           / COUNT(DISTINCT l_partkey) * CAST(1.2 AS DOUBLE)
                    FROM lineitem)
""",
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key value filtered by a *global* scalar
    threshold (1.2x the average per-part value — scale-invariant
    selectivity at any SF, unlike a fixed fraction of the total, which
    empties as the part domain grows). The scalar aggregate is a 1-row DataFrame
    cross-joined (broadcast) under the filter — no driver-side collect, so
    the plan stays lazy and cluster-side at any scale."""
    li = load(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(_dec_sum(F.col("l_extendedprice"), 2, "part_value"))
    total = li.agg(
        (
            _dec_sum(F.col("l_extendedprice"), 2)
            / F.countDistinct("l_partkey")
            * F.lit(1.2).cast("double")
        ).alias("threshold")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "q13_customer_distribution",
    """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust GROUP BY n_orders
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left join with an extra non-equi ON predicate, then
    a distribution-of-counts double aggregation. The second groupBy keys on
    n_orders (tiny domain) — a near-free exchange after the first."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1999-01-01' AND l_shipdate < DATE '1999-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue view joined against its own MAX
    (scalar subquery -> broadcast 1-row cross join). Revenue is an exact
    decimal sum, so the double equality against MAX is safe by construction."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1999-01-01") & (F.col("l_shipdate") < "1999-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(_dec_sum(_REV(), 4, "total_rev"))
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q18_large_volume",
    """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(b.qty AS DOUBLE) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via HAVING on a grouped decimal
    sum, joined back to orders + customer. The HAVING filter runs before
    the joins, so only ~1% of orderkeys reach the join exchanges."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 250)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    """
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate mixing both sides.
    Catalyst extracts the common p_brand IN (...) / size-range conjuncts it
    can infer and pushes them into the part scan; the residual disjunction
    evaluates post-join. part stays broadcast, so the disjunction never
    forces a cartesian plan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_dec_sum(_REV(), 4, "revenue"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q21_waiting_supplier",
    """
WITH per_order AS (
  SELECT l.l_orderkey,
         COUNT(DISTINCT l.l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                             THEN l.l_suppkey END) AS n_late,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN l.l_suppkey END) AS late_supp
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM per_order p JOIN supplier s ON p.late_supp = s.s_suppkey
WHERE p.n_supp > 1 AND p.n_late = 1
GROUP BY s.s_name
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept multi-supplier orders waiting)
    with l_shipdate > o_orderdate + 60d standing in for the missing
    receipt/commit dates. The EXISTS / NOT-EXISTS pair of the original
    collapses into one grouped pass: n_supp > 1 == "another supplier
    exists", n_late = 1 == "no *other* supplier was late" — same semantics,
    shuffles on l_orderkey instead of two correlated joins.

    The two distinct-counts are computed as a two-level aggregation
    (per (order, supplier) first, then per order) rather than two
    COUNT(DISTINCT ...) in one agg: multiple distinct aggregates make
    Catalyst insert an Expand that duplicates every fact row per distinct
    column — at 100 TB that doubles the shuffle. The two-level form keeps
    each row single and both shuffles are on prefixes of the same key."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("supp_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.count_if("supp_late").alias("n_late"),
        F.max(F.when(F.col("supp_late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    s = load(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    """
WITH active AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01'
), avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey % 10 AS cntry_grp, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM active a WHERE a.o_custkey = c.c_custkey)
GROUP BY cntry_grp
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, grouped by a synthetic country code (nationkey % 10). The AVG
    threshold is decimal-sum / count so both engines compare against the
    same double; NOT EXISTS is a left-anti join against the distinct
    recent-buyer set."""
    c = load(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((_dec_sum(F.col("c_acctbal"), 2) / F.count("*")).alias("ab"))
    )
    active = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(active.hint("shuffle_hash"), c.c_custkey == active.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntry_grp"))
        .agg(F.count("*").alias("numcust"), _dec_sum(F.col("c_acctbal"), 2, "totacctbal"))
    )


@register(
    "stats_moments",
    """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS corr_qty_price,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty
FROM s
""",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / regression slope / stddev) assembled
    from exact decimal moment sums instead of the built-in streaming
    kernels: built-in CORR/STDDEV accumulate floating partials in
    partition order, so two engines (or two shuffle layouts) disagree in
    the last bits. Moment sums are exact and order-independent — the
    assembled doubles are bit-identical everywhere, and the map-side
    partial aggregation is the same single shuffle the built-ins use."""
    li = load(spark, sf_dir, "lineitem", fan_out=True)
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")

    def dsum(col, alias):
        return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)

    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(qty, "sx"),
        dsum(price, "sy"),
        dsum(qty * price, "sxy"),
        dsum(qty * qty, "sxx"),
        dsum(price * price, "syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("slope"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
    )


@register(
    "window_distribution",
    """
SELECT o_orderkey, o_custkey,
       DENSE_RANK() OVER w AS dr,
       ROUND(CUME_DIST() OVER w, 6) AS cd,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: dense_rank + cume_dist on a unique-key
    order (deterministic ratios), nth_value over an explicit full frame —
    DuckDB's default frame stops at CURRENT ROW, so the frame is spelled
    out to pin identical semantics."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("dr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


@register(
    "q16_supplier_cnt",
    """
SELECT p.p_brand, p.p_size % 5 AS size_grp,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, size_grp
""",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers serve each part-attribute group, excluding a blacklist
    (negative-balance suppliers stand in for the original's
    complaint-comment NOT IN subquery).

    Plan: the blacklist is a tiny broadcast anti-join BEFORE the fact-dim
    join, so excluded rows never reach the shuffle; part broadcasts; the
    single COUNT(DISTINCT) becomes Catalyst's two-phase
    partial-distinct aggregate — no Expand, one shuffle on the group keys.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#1")
        .select("p_partkey", "p_brand", (F.col("p_size") % 5).alias("size_grp"))
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "size_grp")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_suppliers",
    """
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM sq GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name, s.s_nationkey
FROM supplier s
JOIN sq ON sq.l_suppkey = s.s_suppkey
JOIN tot ON tot.l_partkey = sq.l_partkey
JOIN part p ON p.p_partkey = sq.l_partkey
WHERE p.p_name LIKE 's%' AND sq.qty > 0.5 * tot.total_qty
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who shipped
    more than half of a forecast part's 1996 volume — the original's
    `ps_availqty > 0.5 * sum(l_quantity)` nested-aggregate semi-join,
    re-expressed without partsupp as share-of-part dominance.

    Plan: one filtered scan aggregates to (part, supplier); the per-part
    total is a window SUM over that small aggregate — no second scan, no
    self-join. The window does re-exchange on l_partkey, but that shuffle
    carries only aggregate-sized rows; the raw-row shuffle before it is
    map-side-combined to (part, supplier) partials. (Forcing a single
    shuffle by pre-repartitioning on l_partkey would ship RAW rows and
    lose the partial aggregate — strictly worse at scale.) Quantities sum as
    DECIMAL(18,2) so the 0.5 * total comparison is bit-identical in both
    engines; supplier + part dims broadcast; final DISTINCT dedups
    suppliers dominating several parts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        _dec_sum(F.col("l_quantity"), 2, "qty")
    )
    w = Window.partitionBy("l_partkey")
    sq = sq.withColumn(
        "total_qty",
        F.sum(F.col("qty").cast("decimal(18,2)")).over(w).cast("double"),
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("s"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        sq.filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(p), sq.l_partkey == p.p_partkey)
        .join(F.broadcast(s), sq.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "s_nationkey")
        .distinct()
    )


@register(
    "sql_shipping_priority",
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
def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 executed from pure SQL TEXT — the multi-table proof that
    the engine's SQL surface covers joins, not just single-table rollups
    (`sql_hourly_pivot`): the exact oracle string runs verbatim through
    `spark.sql` after three temp-view registrations. Catalyst plans the
    same broadcast-dim join tree as the DataFrame form
    (`q3_shipping_priority`). tests/test_sql_dialect.py extends the
    claim: ~60% of ALL oracle texts analyze unchanged on Spark SQL; the
    rest use DuckDB-only list/ASOF/quantile builtins."""
    from taxi_data_datapipeline_spark.queries import ORACLES

    for t in ["customer", "orders", "lineitem"]:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLES["sql_shipping_priority"])


@register(
    "sql_lateral_topk",
    """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
""",
)
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery from pure SQL TEXT: each customer's
    top-2 orders by price, expressed as the ANSI lateral-join idiom and
    run VERBATIM on both engines (Spark 4 plans the correlated
    ORDER BY ... LIMIT as a partitioned window top-k under the hood —
    the same physical shape as the `topk_per_group` DataFrame query, no
    per-customer re-execution)."""
    from taxi_data_datapipeline_spark.queries import ORACLES

    for t in ["customer", "orders"]:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ORACLES["sql_lateral_topk"])


@register(
    "sql_recursive_calendar",
    """
WITH RECURSIVE cal AS (
  SELECT DATE '1995-01-01' AS day
  UNION ALL
  SELECT day + 1 FROM cal WHERE day < DATE '1995-03-31'
),
rev AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY 1)
SELECT c.day, COALESCE(r.revenue, 0.0e0) AS revenue
FROM cal c LEFT JOIN rev r ON c.day = r.day
""",
)
def q_sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE from pure SQL TEXT (Spark 4.1 WITH RECURSIVE,
    UNION ALL + bounded predicate): generate a Q1'95 calendar
    recursively and left-join daily revenue with zero fill — the
    dense-calendar gap-fill expressed in the SQL-standard recursion
    idiom, VERBATIM on both engines (the DataFrame tier does the same
    with sequence()+explode in `gapfill_locf`). Recursion depth is
    bounded by the date predicate, so the plan is a fixed 90-step
    expansion, not an unbounded loop."""
    from taxi_data_datapipeline_spark.queries import ORACLES

    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(ORACLES["sql_recursive_calendar"])


@register(
    "sql_pivot_clause",
    """
SELECT event_type,
       COUNT(*) FILTER (WHERE dow = 1) AS d1,
       COUNT(*) FILTER (WHERE dow = 2) AS d2,
       COUNT(*) FILTER (WHERE dow = 3) AS d3,
       COUNT(*) FILTER (WHERE dow = 4) AS d4,
       COUNT(*) FILTER (WHERE dow = 5) AS d5,
       COUNT(*) FILTER (WHERE dow = 6) AS d6,
       COUNT(*) FILTER (WHERE dow = 7) AS d7
FROM (SELECT event_type, EXTRACT(dow FROM ts) + 1 AS dow
      FROM events WHERE ts IS NOT NULL)
GROUP BY event_type
""",
)
def q_sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard PIVOT *clause* from pure SQL TEXT (the engine's
    dialect surface beyond the conditional-aggregation formulation the
    flagship uses): day-of-week event counts pivoted to 7 columns with
    Spark's `FROM ... PIVOT (agg FOR col IN (...))` syntax. The DuckDB
    oracle is the equivalent conditional aggregation (its own PIVOT
    syntax differs, so the CLAUSE itself is the Spark-side artifact
    under test); COALESCE pins the absent-combination convention —
    PIVOT emits NULL where a filtered COUNT emits 0.

    Plan note (PLANS.md): the clause compiles to Spark's generic
    two-shuffle pivot (groupBy(keys, pivot col) pre-aggregate, then
    pivot-to-columns re-aggregate) — fine for this dialect-surface
    query, but measurably NOT what the flagship should use: the
    conditional-aggregate formulation is the single-shuffle plan and
    was 5.4x faster at 100 M rows (README: 3.1 -> 16.7 M rows/s). This
    query documents the trap as much as the syntax."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
        SELECT event_type,
               COALESCE(d1, 0) AS d1, COALESCE(d2, 0) AS d2,
               COALESCE(d3, 0) AS d3, COALESCE(d4, 0) AS d4,
               COALESCE(d5, 0) AS d5, COALESCE(d6, 0) AS d6,
               COALESCE(d7, 0) AS d7
        FROM (
          SELECT * FROM (
            SELECT event_type, dayofweek(ts) AS dow
            FROM events WHERE ts IS NOT NULL
          ) PIVOT (
            COUNT(*) FOR dow IN (1 AS d1, 2 AS d2, 3 AS d3, 4 AS d4,
                                 5 AS d5, 6 AS d6, 7 AS d7)
          )
        )
    """)
