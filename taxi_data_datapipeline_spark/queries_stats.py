"""Statistical / diagnostic analytics tier: autocorrelation, smoothing,
independence testing, latest-record dedup, graph neighborhood similarity,
BPE pair statistics, and curation rule funnels.

Everything here follows the engine's exactness conventions (queries.py
module docstring): integer/fixed-point arithmetic end-to-end with ONE
final double division or a floor-scaled unit sum, so Spark and DuckDB
emit bit-identical values regardless of partitioning or evaluation
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.functions.text import (
    bpe_ish_tokens,
    quality_features,
)
from taxi_data_datapipeline_spark.queries import load, register

# Same tokenizer contracts as queries_advanced / queries_data.
_SQL_SUBTOKS = (
    r"list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), t -> t != '')"
)
_SQL_WS_TOKS = r"list_filter(string_split_regex(text, '\s+'), t -> t != '')"


# --- autocorrelation ----------------------------------------------------------


_ACF_MAX_LAG = 7


@register(
    "acf_daily_counts",
    f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x FROM events GROUP BY 1),
st AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s FROM daily),
dev AS (SELECT day, n * x - s AS d FROM daily CROSS JOIN st),
den AS (SELECT CAST(SUM(d * d) AS BIGINT) AS den FROM dev),
lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
num AS (
  SELECT l.lag, COUNT(*) AS n_pairs, CAST(SUM(d1.d * d2.d) AS BIGINT) AS num
  FROM lags l
  JOIN dev d1 ON true
  JOIN dev d2 ON d2.day = d1.day + CAST(l.lag AS INTEGER)
  GROUP BY l.lag)
SELECT num.lag, num.n_pairs,
       ROUND(CAST(num.num AS DOUBLE) / den.den, 6) AS acf
FROM num CROSS JOIN den
""",
)
def q_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the global daily event-count series at lags
    1..7 (the weekly-seasonality diagnostic an event pipeline runs before
    picking a forecast model).

    Exactness: with n days and sum s, the deviation is scaled to the
    integer ``n*x - s`` (= n * (x - mean)); numerator and denominator are
    then EXACT bigint sums and the ACF is one double division, rounded
    once — identical in both engines. The daily series is aggregate-sized
    (one row per day), so the lag self-join and the scalar broadcasts are
    free at any corpus scale; the only data-sized shuffle is the first
    day rollup. At 100 TB the bigint products stay far inside int64 for
    any realistic day count; a DECIMAL(38) widening is the guard if daily
    volumes ever exceed ~3e9 x 3e9 products."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    st = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    dev = daily.crossJoin(F.broadcast(st)).select(
        "day", (F.col("n") * F.col("x") - F.col("s")).alias("d")
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("den"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    d1 = dev.crossJoin(F.broadcast(lags))
    d2 = dev.select(F.col("day").alias("day2"), F.col("d").alias("d2"))
    num = (
        d1.join(
            F.broadcast(d2),
            F.col("day2") == F.expr("date_add(day, lag)"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("d") * F.col("d2")).alias("num"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.round(F.col("num").cast("double") / F.col("den"), 6).alias("acf"),
    )


# --- dyadic-weight EWMA -------------------------------------------------------


_EWMA_TAPS = 8  # weights 2^7 .. 2^0 over the trailing 8 observations


@register(
    "ewma_event_types",
    f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, day, n,
         {", ".join(
             f"LAG(n, {k}) OVER (PARTITION BY event_type ORDER BY day) AS x{k}"
             for k in range(_EWMA_TAPS)
         )}
  FROM daily)
SELECT event_type, day, n,
       ROUND(CAST({" + ".join(
           f"COALESCE(x{k}, 0) * {2 ** (_EWMA_TAPS - 1 - k)}"
           for k in range(_EWMA_TAPS)
       )} AS DOUBLE)
             / ({" + ".join(
                 f"CASE WHEN x{k} IS NULL THEN 0 ELSE {2 ** (_EWMA_TAPS - 1 - k)} END"
                 for k in range(_EWMA_TAPS)
             )}), 6) AS ewma
FROM l
""",
)
def q_ewma_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event counts per
    type, with DYADIC weights 2^7..2^0 over the trailing 8 observations.
    Powers of two keep every weighted term an exact integer — the whole
    smoother is integer arithmetic with one final double division, so
    both engines agree bit-for-bit (a float alpha^k ladder would not).
    Early rows renormalize over the taps actually present instead of
    padding with zeros. One shuffle (daily rollup); the window is
    partitioned by event_type — no global sort anywhere."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    xs = [F.lag("n", k).over(w) for k in range(_EWMA_TAPS)]
    weights = [2 ** (_EWMA_TAPS - 1 - k) for k in range(_EWMA_TAPS)]
    num = sum(
        (F.coalesce(x, F.lit(0)) * F.lit(wt) for x, wt in zip(xs, weights)),
        start=F.lit(0),
    )
    den = sum(
        (F.when(x.isNull(), 0).otherwise(wt) for x, wt in zip(xs, weights)),
        start=F.lit(0),
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(num.cast("double") / den, 6).alias("ewma"),
    )


# --- chi-square independence test ---------------------------------------------


@register(
    "chi2_type_dow",
    """
WITH o AS (
  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dw, COUNT(*) AS o
  FROM events GROUP BY 1, 2),
rs AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rs FROM o GROUP BY 1),
cs AS (SELECT dw, CAST(SUM(o) AS BIGINT) AS cs FROM o GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM o),
cells AS (
  SELECT CAST(FLOOR(
           (CAST(o.o * t.total - rs.rs * cs.cs AS DOUBLE)
            * CAST(o.o * t.total - rs.rs * cs.cs AS DOUBLE)
            / (CAST(rs.rs AS DOUBLE) * cs.cs * t.total))
           * 1000000000.0) AS BIGINT) AS cell_units
  FROM o JOIN rs USING (event_type) JOIN cs USING (dw) CROSS JOIN t),
dims AS (
  SELECT COUNT(DISTINCT event_type) AS n_types, COUNT(DISTINCT dw) AS n_dows
  FROM o)
SELECT dims.n_types, dims.n_dows,
       (dims.n_types - 1) * (dims.n_dows - 1) AS dof,
       ROUND(CAST(SUM(cells.cell_units) AS BIGINT) / 1000000000.0, 6) AS chi2
FROM cells CROSS JOIN dims
GROUP BY dims.n_types, dims.n_dows
""",
)
def q_chi2_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for event_type x day-of-week
    independence — the standard drift/independence screen over a
    contingency table.

    Exactness: each cell's (o - e)^2 / e is rewritten over integers as
    (o*total - rs*cs)^2 / (rs*cs*total); the squared term is computed in
    double FROM THE SAME exact integer in both engines, floor-scaled to
    1e-9 units, and summed as exact bigints — the usual double-sum
    order-dependence never arises. The contingency table is
    aggregate-sized (types x 7), so everything above the first rollup is
    broadcast work."""
    ev = load(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type", F.dayofweek(F.col("ts").cast("date")).alias("dw")
    ).agg(F.count(F.lit(1)).alias("o"))
    rs = o.groupBy("event_type").agg(F.sum("o").alias("rs"))
    cs = o.groupBy("dw").agg(F.sum("o").alias("cs"))
    t = o.agg(F.sum("o").alias("total"))
    num = (F.col("o") * F.col("total") - F.col("rs") * F.col("cs")).cast(
        "double"
    )
    cell = F.floor(
        (num * num / (F.col("rs").cast("double") * F.col("cs") * F.col("total")))
        * F.lit(1000000000.0)
    ).cast("bigint")
    cells = (
        o.join(F.broadcast(rs), "event_type")
        .join(F.broadcast(cs), "dw")
        .crossJoin(F.broadcast(t))
        .select(cell.alias("cell_units"))
    )
    dims = o.agg(
        F.count_distinct("event_type").alias("n_types"),
        F.count_distinct("dw").alias("n_dows"),
    )
    return (
        cells.crossJoin(F.broadcast(dims))
        .groupBy("n_types", "n_dows")
        .agg(
            ((F.col("n_types") - 1) * (F.col("n_dows") - 1)).alias("dof"),
            F.round(F.sum("cell_units") / F.lit(1000000000.0), 6).alias("chi2"),
        )
        .select("n_types", "n_dows", "dof", "chi2")
    )


# --- latest-record dedup (QUALIFY pattern) ------------------------------------


@register(
    "qualify_latest_event",
    """
SELECT user_id, event_id, ts AS last_ts, event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
)
def q_qualify_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the QUALIFY / row_number()=1 idiom every
    warehouse uses for current-state extraction from an append-only log.
    Tie-broken by event_id for a deterministic total order. One shuffle
    on user_id; at scale this is the textbook candidate for pre-bucketed
    storage on the same key, which would remove the exchange entirely."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("last_ts"),
            "event_type",
            "value",
        )
    )


# --- neighborhood similarity on the co-purchase graph -------------------------


@register(
    "neighbor_jaccard",
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM li x JOIN li y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, COUNT(*) AS d FROM sym GROUP BY u),
common AS (
  SELECT e.a, e.b, COUNT(*) AS c
  FROM e
  JOIN sym sa ON sa.u = e.a
  JOIN sym sb ON sb.u = e.b AND sb.v = sa.v
  GROUP BY e.a, e.b)
SELECT e.a, e.b, COALESCE(c.c, 0) AS common_neighbors,
       da.d + db.d - COALESCE(c.c, 0) AS union_neighbors,
       ROUND(CAST(COALESCE(c.c, 0) AS DOUBLE)
             / (da.d + db.d - COALESCE(c.c, 0)), 6) AS jaccard
FROM e
JOIN deg da ON e.a = da.u
JOIN deg db ON e.b = db.u
LEFT JOIN common c ON e.a = c.a AND e.b = c.b
ORDER BY jaccard DESC, e.a, e.b
LIMIT 50
""",
)
def q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-purchase edges by neighborhood Jaccard similarity
    (|N(a) n N(b)| / |N(a) u N(b)|) — the link-prediction / taxonomy
    feature computed from the shared memoized pair-count table.

    The common-neighbor count is the wedge join sa.u=a, sb.u=b matched on
    the far endpoint — the same work profile as the triangle census
    (operators/graphs.py): bounded by sum-of-degree-squared, and the
    degree-orientation trick applies verbatim if a hub node ever
    dominates. Jaccard is one double division of exact integers; ordering
    is on the rounded value with an (a, b) tiebreak, so the limit cut is
    engine-independent. ``TakeOrderedAndProject`` keeps the top-50 a
    per-partition heap, not a global sort."""
    from taxi_data_datapipeline_spark.queries_advanced import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    sa = sym.select(F.col("u").alias("sa_u"), F.col("v").alias("sa_v"))
    sb = sym.select(F.col("u").alias("sb_u"), F.col("v").alias("sb_v"))
    common = (
        e.join(sa, F.col("sa_u") == F.col("a"))
        .join(sb, (F.col("sb_u") == F.col("b")) & (F.col("sb_v") == F.col("sa_v")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c = F.coalesce(F.col("c"), F.lit(0))
    return (
        e.join(
            F.broadcast(deg.select(F.col("u").alias("a"), F.col("d").alias("da"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("u").alias("b"), F.col("d").alias("db"))),
            "b",
        )
        .join(common, ["a", "b"], "left")
        .select(
            "a",
            "b",
            c.alias("common_neighbors"),
            (F.col("da") + F.col("db") - c).alias("union_neighbors"),
            F.round(
                c.cast("double") / (F.col("da") + F.col("db") - c), 6
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "a", "b")
        .limit(50)
    )


# --- BPE merge statistics -----------------------------------------------------


@register(
    "bpe_pair_counts",
    f"""
WITH toks AS (SELECT unnest({_SQL_SUBTOKS}) AS word FROM documents),
words AS (SELECT word, COUNT(*) AS wc FROM toks GROUP BY word),
pairs AS (
  SELECT substr(w.word, CAST(i.i AS INTEGER), 2) AS pair, w.wc
  FROM words w,
       LATERAL unnest(generate_series(1, length(w.word) - 1)) AS i(i)
  WHERE length(w.word) >= 2)
SELECT pair, CAST(SUM(wc) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT 50
""",
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-weighted adjacent-character-pair frequencies — the first
    merge-candidate table of a BPE tokenizer build (Sennrich et al.,
    ACL 2016). The corpus collapses to its VOCABULARY before any pair
    work: explode tokens -> word counts (one corpus-sized shuffle), then
    pair generation runs over the aggregate-sized word table with
    per-word multiplicity carried as a weight. Intra-word repeats
    ("aaa" -> "aa" twice) are counted by position, matching the
    reference algorithm. Top-50 via ``TakeOrderedAndProject``."""
    docs = load(spark, sf_dir, "documents", fan_out=True)
    words = (
        docs.select(F.explode(bpe_ish_tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(50)
    )


# --- curation rule funnel -----------------------------------------------------


@register(
    "quality_rule_funnel",
    rf"""
WITH f AS (
  SELECT source,
         len({_SQL_WS_TOKS}) AS n_tokens,
         ROUND(CAST(length(text) - len({_SQL_WS_TOKS}) + 1 AS DOUBLE)
               / len({_SQL_WS_TOKS}), 6) AS avg_word_len,
         ROUND(CAST(length(regexp_replace(text, '[^\.,;:!\?]', '', 'g')) AS DOUBLE)
               / length(text), 6) AS punct_ratio,
         ROUND(CAST(len(list_filter({_SQL_WS_TOKS},
                    t -> lower(t) IN ('the','and','of','to','a','in','is','it'))) AS DOUBLE)
               / len({_SQL_WS_TOKS}), 6) AS stopword_ratio
  FROM documents)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0 ELSE 1 END) AS BIGINT) AS fail_length,
       CAST(SUM(CASE WHEN avg_word_len BETWEEN 2.0 AND 12.0 THEN 0 ELSE 1 END) AS BIGINT) AS fail_word_len,
       CAST(SUM(CASE WHEN stopword_ratio >= 0.01 THEN 0 ELSE 1 END) AS BIGINT) AS fail_stopword,
       CAST(SUM(CASE WHEN punct_ratio <= 0.2 THEN 0 ELSE 1 END) AS BIGINT) AS fail_punct,
       CAST(SUM(CASE WHEN n_tokens BETWEEN 10 AND 100000
                      AND avg_word_len BETWEEN 2.0 AND 12.0
                      AND stopword_ratio >= 0.01
                      AND punct_ratio <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
FROM f GROUP BY source
""",
)
def q_quality_rule_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style curation rule funnel (Rae et al. 2021 §A1.1 approach):
    per source, how many documents each heuristic rule rejects and how
    many survive all of them — the report a data-curation run publishes
    before committing a filter config. Reuses the exact quality_features
    expressions (functions/text.py) so the funnel and the per-document
    quality_scores query can never disagree. Single corpus scan, one
    source-keyed rollup."""
    d = load(spark, sf_dir, "documents", fan_out=True)
    feats = quality_features(F.col("text"))
    flags = d.select(
        "source",
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_word_len"].alias("avg_word_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )
    ok_len = F.col("n_tokens").between(10, 100000)
    ok_wl = F.col("avg_word_len").between(2.0, 12.0)
    ok_stop = F.col("stopword_ratio") >= 0.01
    ok_punct = F.col("punct_ratio") <= 0.2
    as_fail = lambda ok: F.sum(F.when(ok, 0).otherwise(1))  # noqa: E731
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        as_fail(ok_len).alias("fail_length"),
        as_fail(ok_wl).alias("fail_word_len"),
        as_fail(ok_stop).alias("fail_stopword"),
        as_fail(ok_punct).alias("fail_punct"),
        F.sum(
            F.when(ok_len & ok_wl & ok_stop & ok_punct, 1).otherwise(0)
        ).alias("pass_all"),
    )
