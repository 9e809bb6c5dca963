"""Model & data evaluation family (round-8 adds): the statistical tests
and ML-evaluation metrics a training-data pipeline runs on itself —
comparing samples (Welch, Wilcoxon), scoring rankers (PR-AUC), comparing
predictors (McNemar), scoring language models (held-out perplexity),
and scoring clusterings (adjusted Rand, simplified silhouette), plus
PPMI association mining for embedding preprocessing.

Parity conventions (ROUND_NOTES): money/values as exact cents bigints;
sufficient statistics as exact integer/DECIMAL(38,0) aggregates; any
per-row float term is rounded to 9 decimals and summed as DECIMAL (or
floor-scaled to integer units) so shuffle order can never move a hash;
closed-form double arithmetic only on exact-integer inputs with the
SAME expression shape in both engines.

No counterpart exists in the reference (reference/pivot_utils.py has no
statistics beyond counts); this extends the engine surface the way the
rest of queries_stats.py does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.queries import load, register

_CENTS = 'CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)'


# --- Welch's unequal-variance t-test ------------------------------------------


@register(
    "welch_t_test",
    f"""
WITH v AS (
  SELECT event_type, {_CENTS} AS c
  FROM events WHERE event_type IN ('purchase', 'view')),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS ss
  FROM v GROUP BY event_type),
w AS (
  SELECT MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
         MAX(CASE WHEN event_type = 'purchase' THEN s END) AS s1,
         MAX(CASE WHEN event_type = 'purchase' THEN ss END) AS ss1,
         MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
         MAX(CASE WHEN event_type = 'view' THEN s END) AS s2,
         MAX(CASE WHEN event_type = 'view' THEN ss END) AS ss2
  FROM g),
d AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
         (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1
           AS vn1,
         (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / n2
           AS vn2
  FROM w)
SELECT n1, n2,
       ROUND((m1 - m2) / SQRT(vn1 + vn2), 6) AS t_stat,
       ROUND((vn1 + vn2) * (vn1 + vn2)
             / (vn1 * vn1 / (n1 - 1) + vn2 * vn2 / (n2 - 1)), 6) AS df
FROM d
""",
)
def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the purchase and view
    value samples: t statistic plus the Welch-Satterthwaite effective
    degrees of freedom — the default two-sample mean test when variances
    differ (Welch 1947). Sufficient statistics (n, sum, sum-of-squares
    over exact cents, DECIMAL(38,0)) reduce in ONE partial-merge
    aggregation; everything after is closed-form double arithmetic on
    exact integers with the identical expression shape in both engines
    (the anova_oneway convention), so no float fold ever crosses a
    shuffle. Two aggregate-sized stages, no window."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    v = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("c"),
    )
    g = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )

    def pick(col: str, et: str):
        return F.max(F.when(F.col("event_type") == et, F.col(col)))

    w = g.agg(
        pick("n", "purchase").alias("n1"), pick("s", "purchase").alias("s1"),
        pick("ss", "purchase").alias("ss1"),
        pick("n", "view").alias("n2"), pick("s", "view").alias("s2"),
        pick("ss", "view").alias("ss2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    vn1 = (
        (F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1) / F.col("n1")
    )
    vn2 = (
        (F.col("ss2").cast("double") - F.col("s2").cast("double") * F.col("s2") / F.col("n2"))
        / (F.col("n2") - 1) / F.col("n2")
    )
    return w.select(
        "n1",
        "n2",
        F.round((m1 - m2) / F.sqrt(vn1 + vn2), 6).alias("t_stat"),
        F.round(
            (vn1 + vn2) * (vn1 + vn2)
            / (vn1 * vn1 / (F.col("n1") - 1) + vn2 * vn2 / (F.col("n2") - 1)),
            6,
        ).alias("df"),
    )


# --- Wilcoxon signed-rank test (paired daily counts) ---------------------------


@register(
    "wilcoxon_signed_rank",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           - COUNT(*) FILTER (WHERE event_type = 'view') AS d
  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1),
nz AS (SELECT d, ABS(d) AS absd FROM daily WHERE d <> 0),
grp AS (
  SELECT absd, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(COUNT(*) FILTER (WHERE d > 0) AS BIGINT) AS pos_c
  FROM nz GROUP BY absd),
cum AS (
  SELECT absd, c, pos_c,
         CAST(SUM(c) OVER (ORDER BY absd) - c AS BIGINT) AS f_below
  FROM grp),
t AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(pos_c * (2 * f_below + c + 1)) AS BIGINT) AS w2,
         CAST(SUM(c * c * c - c) AS BIGINT) AS ties
  FROM cum)
SELECT n, w2 AS w_plus_x2,
       ROUND((w2 - CAST(n AS DOUBLE) * (n + 1) / 2)
             / SQRT((2.0 * n * (n + 1) * (2 * n + 1) - ties) / 12.0), 6)
         AS z_stat
FROM t
""",
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on paired daily (purchase - view) event
    counts: W+ in exact doubled units plus the tie-corrected normal
    approximation z. Pairs collapse to one integer difference per DAY
    first (calendar-bounded), zeros drop (Wilcoxon convention), and
    average ranks over ties come from the cumulative-below trick on the
    grouped |d| table: 2*avg_rank = 2*f_below + c + 1 is an exact
    integer, so W+ accumulates as a bigint — no float ranks anywhere.
    The tie correction sum(t^3 - t) stays integer too; z is one
    closed-form double at the end. The |d| table is tiny (distinct
    daily-difference magnitudes), so the ordered window is
    aggregate-sized, never row-sized."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        (
            F.count(F.when(F.col("event_type") == "purchase", 1))
            - F.count(F.when(F.col("event_type") == "view", 1))
        ).alias("d")
    )
    from taxi_data_datapipeline_spark.operators.cumulative import (
        cumulative_counts,
    )

    nz = daily.filter(F.col("d") != 0).select("d", F.abs("d").alias("absd"))
    grp = nz.groupBy(F.col("absd").alias("value")).agg(
        F.count(F.lit(1)).alias("c1"),
        F.count(F.when(F.col("d") > 0, 1)).alias("c2"),
    )
    # bucketed two-phase cumulation (no global window even on the tiny
    # grouped |d| table — the plan-audit rule is absolute)
    cum = cumulative_counts(grp).select(
        F.col("c1").alias("c"),
        F.col("c2").alias("pos_c"),
        (F.col("f1") - F.col("c1")).alias("f_below"),
    )
    t = cum.agg(
        F.sum("c").alias("n"),
        F.sum(
            F.col("pos_c") * (F.lit(2) * F.col("f_below") + F.col("c") + 1)
        ).alias("w2"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
    )
    n = F.col("n")
    return t.select(
        "n",
        F.col("w2").alias("w_plus_x2"),
        F.round(
            (F.col("w2") - n.cast("double") * (n + 1) / 2)
            / F.sqrt(
                (F.lit(2.0) * n * (n + 1) * (2 * n + 1) - F.col("ties")) / 12.0
            ),
            6,
        ).alias("z_stat"),
    )


# --- precision-recall AUC (average precision) ----------------------------------


@register(
    "pr_auc",
    """
WITH s AS (
  SELECT value,
         CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS c1,
         CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS c2
  FROM events WHERE event_type IN ('purchase', 'view') GROUP BY value),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS p FROM s),
cum AS (
  SELECT value, c1, c2,
         CAST(SUM(c1) OVER (ORDER BY value DESC) AS BIGINT) AS cp,
         CAST(SUM(c1 + c2) OVER (ORDER BY value DESC) AS BIGINT) AS ct
  FROM s),
terms AS (
  SELECT CAST(ROUND(CAST(c1 AS DOUBLE) / n.p * cp / ct, 9)
              AS DECIMAL(28,12)) AS ap_term
  FROM cum CROSS JOIN n WHERE c1 > 0)
SELECT (SELECT p FROM n) AS n_pos,
       CAST(COUNT(*) AS BIGINT) AS n_thresholds,
       ROUND(CAST(SUM(ap_term) AS DOUBLE), 6) AS average_precision
FROM terms
""",
)
def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall AUC (average precision, step interpolation) of
    the `value` column as a ranker for purchase-vs-view: AP = sum over
    score thresholds of delta-recall * precision — the imbalanced-class
    companion to the Mann-Whitney ROC-AUC. Events collapse to per-
    distinct-value (pos, neg) counts first (one shuffle on the high-
    cardinality key), then the descending cumulative reuses the bucketed
    two-phase cumulation (operators/cumulative.py) FLIPPED from the
    ascending totals — no row-sized global window. Each threshold's
    term (c1/P)*(cp/ct) is a rational of exact integers evaluated
    identically in both engines, rounded to 9 decimals and summed as
    DECIMAL (the bigram_surprisal convention)."""
    from taxi_data_datapipeline_spark.operators.cumulative import (
        cumulative_counts,
    )

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    s = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c2"),
    )
    cum = cumulative_counts(s)  # ascending inclusive f1, f2 per value
    tot = s.agg(
        F.sum("c1").alias("p"), F.sum(F.col("c1") + F.col("c2")).alias("t")
    )
    # descending-inclusive cumulative = total - ascending-exclusive
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("c1") > 0)
        .select(
            "c1",
            (F.col("p") - (F.col("f1") - F.col("c1"))).alias("cp"),
            (
                F.col("t")
                - ((F.col("f1") + F.col("f2")) - (F.col("c1") + F.col("c2")))
            ).alias("ct"),
            "p",
        )
    )
    terms = scored.select(
        "p",
        F.round(
            F.col("c1").cast("double") / F.col("p") * F.col("cp") / F.col("ct"),
            9,
        )
        .cast("decimal(28,12)")
        .alias("ap_term"),
    )
    return terms.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_thresholds"),
        F.round(F.sum("ap_term").cast("double"), 6).alias("average_precision"),
    ).select(
        F.col("p").alias("n_pos"), "n_thresholds", "average_precision"
    )


# --- McNemar's test: lag-1 vs lag-7 direction predictors ------------------------


@register(
    "mcnemar_naive_forecasts",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, day, n,
         LAG(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS n1,
         LAG(n, 2) OVER (PARTITION BY event_type ORDER BY day) AS n2,
         LAG(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS n7,
         LAG(n, 8) OVER (PARTITION BY event_type ORDER BY day) AS n8
  FROM daily),
j AS (
  SELECT event_type,
         (n > n1) AS actual_up,
         (n1 > n2) AS pred_a_up,
         (n7 > n8) AS pred_b_up
  FROM l WHERE n8 IS NOT NULL),
c AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(COUNT(*) FILTER (WHERE (pred_a_up = actual_up)
                                 AND (pred_b_up <> actual_up)) AS BIGINT) AS b,
         CAST(COUNT(*) FILTER (WHERE (pred_a_up <> actual_up)
                                 AND (pred_b_up = actual_up)) AS BIGINT) AS c
  FROM j GROUP BY event_type)
SELECT event_type, n_days, b, c,
       CASE WHEN b + c = 0 THEN 0.0
            ELSE ROUND((ABS(CAST(b AS DOUBLE) - c) - 1)
                       * (ABS(CAST(b AS DOUBLE) - c) - 1) / (b + c), 6)
       END AS mcnemar_stat
FROM c
""",
)
def q_mcnemar_naive_forecasts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test comparing two naive direction predictors of
    daily event counts per type — momentum (yesterday's direction) vs
    weekly momentum (the lag-7 direction) — on the SAME days: only the
    discordant counts b (A right, B wrong) and c (A wrong, B right)
    matter, and the continuity-corrected statistic (|b-c|-1)^2/(b+c) is
    exact-integer arithmetic with one double division. This is the
    correct test for "is predictor A better than B?" on paired
    outcomes (comparing two accuracies with an unpaired test ignores
    the correlation). Day-level windows are per-type partitioned and
    calendar-bounded (the forecast_eval_naive shape)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = daily.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("n1"),
        F.lag("n", 2).over(w).alias("n2"),
        F.lag("n", 7).over(w).alias("n7"),
        F.lag("n", 8).over(w).alias("n8"),
    ).filter(F.col("n8").isNotNull())
    j = lagd.select(
        "event_type",
        (F.col("n") > F.col("n1")).alias("actual_up"),
        (F.col("n1") > F.col("n2")).alias("pred_a_up"),
        (F.col("n7") > F.col("n8")).alias("pred_b_up"),
    )
    c = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.count(
            F.when(
                (F.col("pred_a_up") == F.col("actual_up"))
                & (F.col("pred_b_up") != F.col("actual_up")),
                1,
            )
        ).alias("b"),
        F.count(
            F.when(
                (F.col("pred_a_up") != F.col("actual_up"))
                & (F.col("pred_b_up") == F.col("actual_up")),
                1,
            )
        ).alias("c"),
    )
    diff = F.abs(F.col("b").cast("double") - F.col("c"))
    return c.select(
        "event_type",
        "n_days",
        "b",
        "c",
        F.when(F.col("b") + F.col("c") == 0, F.lit(0.0))
        .otherwise(
            F.round((diff - 1) * (diff - 1) / (F.col("b") + F.col("c")), 6)
        )
        .alias("mcnemar_stat"),
    )


# --- held-out bigram LM perplexity ---------------------------------------------


@register(
    "bigram_perplexity",
    r"""
WITH d AS (
  SELECT doc_id, text,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10 AS bucket
  FROM documents),
toks AS (
  SELECT doc_id, bucket, t.i AS pos, lower(tok[t.i]) AS w
  FROM (SELECT doc_id, bucket,
               list_filter(string_split_regex(text, '\s+'), x -> x != '') AS tok
        FROM d) dd,
       UNNEST(range(1, len(tok) + 1)) AS t(i)),
bigrams AS (
  SELECT a.bucket, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
      FROM toks WHERE bucket < 8),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
       FROM bigrams WHERE bucket < 8 GROUP BY 1, 2),
uc AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c
       FROM bigrams WHERE bucket < 8 GROUP BY 1),
ev AS (
  SELECT CAST(ROUND(-ln((COALESCE(bc.c, 0) + 1.0)
                        / (COALESCE(uc.c, 0) + v.vocab)), 9)
              AS DECIMAL(28,12)) AS s
  FROM (SELECT w1, w2 FROM bigrams WHERE bucket >= 8) e
  LEFT JOIN bc ON e.w1 = bc.w1 AND e.w2 = bc.w2
  LEFT JOIN uc ON e.w1 = uc.w1
  CROSS JOIN v)
SELECT (SELECT vocab FROM v) AS vocab,
       CAST(COUNT(*) AS BIGINT) AS n_eval_bigrams,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS cross_entropy
FROM ev
""",
)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out language-model evaluation — the metric every training-
    data curation choice is ultimately scored by: documents hash-split
    80/20 (md5 mod 10, the train_val_split convention), an add-1-
    smoothed bigram LM is fit on the train shard, and the eval shard's
    per-token surprisal -ln((c(w1,w2)+1)/(c(w1)+V)) averages into the
    corpus cross-entropy. Count tables are vocabulary-sized and
    broadcast against the eval bigram stream; per-term logs round to 9
    decimals and sum as DECIMAL (bigram_surprisal convention), so the
    result is engine-exact. Unseen-history bigrams fall back to 1/V via
    the COALESCE(0) path — no row is dropped."""
    docs = load(spark, sf_dir, "documents", fan_out=True)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 10
    toks = F.transform(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""),
        lambda t: F.lower(t),
    )
    base = docs.select(bucket.alias("bucket"), toks.alias("toks"))
    m = F.greatest(F.lit(0), F.size("toks") - 1)
    pairs = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bigrams = base.select("bucket", F.explode(pairs).alias("p")).select(
        "bucket", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    train_toks = base.filter(F.col("bucket") < 8).select(
        F.explode("toks").alias("w")
    )
    v = train_toks.agg(F.count_distinct("w").alias("vocab"))
    train = bigrams.filter(F.col("bucket") < 8)
    # The (w1, w2) train count table subsumes the unigram-history table
    # (uc = its per-w1 count sum) — one train tokenize pass, not two.
    bc = (
        train.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("bc"))
        .localCheckpoint(eager=True)
    )
    uc = bc.groupBy("w1").agg(F.sum("bc").alias("uc"))
    evalb = (
        bigrams.filter(F.col("bucket") >= 8)
        .join(bc.hint("shuffle_hash"), ["w1", "w2"], "left")
        .join(uc.hint("shuffle_hash"), ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "vocab",
            F.round(
                -F.log(
                    (F.coalesce(F.col("bc"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("uc"), F.lit(0)) + F.col("vocab"))
                ),
                9,
            )
            .cast("decimal(28,12)")
            .alias("s"),
        )
    )
    return evalb.groupBy("vocab").agg(
        F.count(F.lit(1)).alias("n_eval_bigrams"),
        F.round(
            F.sum("s").cast("double") / F.count(F.lit(1)), 6
        ).alias("cross_entropy"),
    )


# --- adjusted Rand index: hash-free clustering vs ground-truth labels -----------


@register(
    "adjusted_rand_index",
    """
WITH pts AS (
  SELECT label,
         4 * CAST(embedding[1] > 0 AS INT)
           + 2 * CAST(embedding[2] > 0 AS INT)
           + CAST(embedding[3] > 0 AS INT) AS cluster
  FROM embeddings),
cont AS (SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS nij
         FROM pts GROUP BY 1, 2),
a AS (SELECT cluster, CAST(SUM(nij) AS BIGINT) AS ai FROM cont GROUP BY 1),
b AS (SELECT label, CAST(SUM(nij) AS BIGINT) AS bj FROM cont GROUP BY 1),
t AS (
  SELECT (SELECT CAST(SUM(nij * (nij - 1) / 2) AS BIGINT) FROM cont) AS sij,
         (SELECT CAST(SUM(ai * (ai - 1) / 2) AS BIGINT) FROM a) AS sa,
         (SELECT CAST(SUM(bj * (bj - 1) / 2) AS BIGINT) FROM b) AS sb,
         (SELECT CAST(SUM(nij) * (SUM(nij) - 1) / 2 AS BIGINT) FROM cont) AS cn2)
SELECT sij, sa, sb,
       ROUND((sij - CAST(sa AS DOUBLE) * sb / cn2)
             / ((CAST(sa AS DOUBLE) + sb) / 2
                - CAST(sa AS DOUBLE) * sb / cn2), 6) AS ari
FROM t
""",
)
def q_adjusted_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand index between a deterministic sign-pattern
    clustering of the first three embedding dimensions (8 buckets — the
    cheapest possible projection clustering) and the ground-truth label
    column: the chance-corrected pair-counting agreement score
    (Hubert & Arabie 1985) every clustering-quality pipeline reports.
    The contingency table is k x labels (<= 80 rows), so everything
    after the one groupBy shuffle is exact bigint combinatorics on
    aggregate-sized tables; the final ARI is closed-form double
    arithmetic on exact integers. Sign comparisons on float32 values
    are exact in both engines — no rounding boundary exists."""
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "label",
        (
            F.lit(4) * (F.element_at("embedding", 1) > 0).cast("int")
            + F.lit(2) * (F.element_at("embedding", 2) > 0).cast("int")
            + (F.element_at("embedding", 3) > 0).cast("int")
        ).alias("cluster"),
    )
    cont = pts.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("nij"))
    sij_df = cont.agg(
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2).cast("bigint").alias("sij"),
        F.sum("nij").alias("n"),
    )
    a = cont.groupBy("cluster").agg(F.sum("nij").alias("ai"))
    b = cont.groupBy("label").agg(F.sum("nij").alias("bj"))
    sa_df = a.agg(
        F.sum(F.col("ai") * (F.col("ai") - 1) / 2).cast("bigint").alias("sa")
    )
    sb_df = b.agg(
        F.sum(F.col("bj") * (F.col("bj") - 1) / 2).cast("bigint").alias("sb")
    )
    t = (
        sij_df.crossJoin(F.broadcast(sa_df))
        .crossJoin(F.broadcast(sb_df))
        .withColumn(
            "cn2", (F.col("n") * (F.col("n") - 1) / 2).cast("bigint")
        )
    )
    exp = F.col("sa").cast("double") * F.col("sb") / F.col("cn2")
    return t.select(
        "sij",
        "sa",
        "sb",
        F.round(
            (F.col("sij") - exp)
            / ((F.col("sa").cast("double") + F.col("sb")) / 2 - exp),
            6,
        ).alias("ari"),
    )


# --- simplified silhouette (squared-distance variant) ---------------------------


@register(
    "silhouette_simplified",
    """
WITH pd AS (
  SELECT vec_id, label, u.i AS dim,
         CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
cent AS (
  SELECT label AS c, dim, CAST(SUM(q) AS BIGINT) AS s
  FROM pd GROUP BY label, dim),
cn AS (SELECT label AS c, CAST(COUNT(*) AS BIGINT) AS n
       FROM embeddings GROUP BY label),
d2 AS (
  SELECT pd.vec_id, pd.label, cent.c,
         CAST(SUM(CAST(cn.n * pd.q - cent.s AS DECIMAL(38,0))
                  * (cn.n * pd.q - cent.s)) AS DECIMAL(38,0)) AS units,
         MAX(cn.n) AS n
  FROM pd JOIN cent ON pd.dim = cent.dim
          JOIN cn ON cent.c = cn.c
  GROUP BY pd.vec_id, pd.label, cent.c),
ab AS (
  SELECT vec_id, label,
         MAX(CASE WHEN c = label
                  THEN CAST(units AS DOUBLE) / n / n END) AS a,
         MIN(CASE WHEN c <> label
                  THEN CAST(units AS DOUBLE) / n / n END) AS b
  FROM d2 GROUP BY vec_id, label),
s AS (
  SELECT label,
         CAST(ROUND(CASE WHEN GREATEST(a, b) = 0 THEN 0.0
                         ELSE (b - a) / GREATEST(a, b) END, 9)
              AS DECIMAL(28,12)) AS sil
  FROM ab)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(CAST(SUM(sil) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
FROM s GROUP BY label
""",
)
def q_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette of the ground-truth label clustering over
    the embedding table, squared-distance variant: per point, a = d^2 to
    its own label centroid, b = min d^2 to any other centroid, s =
    (b-a)/max(a,b) — the O(n*k) silhouette every clustering-quality
    report uses at scale (the classic O(n^2) form is infeasible; the
    centroid form is the standard surrogate, Hruschka 2004). Exactness:
    embeddings quantize to 2^-20 fixed-point, centroid means stay
    RATIONAL (sum s_ck, count n_c), and d^2 = sum_k (n_c*q_k - s_ck)^2 /
    n_c^2 has an exact DECIMAL(38,0) numerator — the only doubles are
    the final per-(point, centroid) divisions, identical in both
    engines, and the min over k-1 candidate doubles is order-free.
    Per-point silhouettes round to 9 decimals and sum as DECIMAL.
    Centroids are a k x dims table (640 rows) broadcast against the
    exploded point-dim stream; one explode, two aggregate passes, no
    window — linear in points at any corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    pd_ = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "e"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("e").cast("double") * 1048576.0).cast("bigint").alias("q"),
    )
    cent = pd_.groupBy(F.col("label").alias("c"), "dim").agg(
        F.sum("q").alias("s")
    )
    cn = emb.groupBy(F.col("label").alias("c")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cent_n = cent.join(cn, "c")  # k x dims, broadcast below
    d2 = (
        pd_.join(F.broadcast(cent_n), "dim")
        .groupBy("vec_id", "label", "c")
        .agg(
            F.sum(
                (F.col("n") * F.col("q") - F.col("s")).cast("decimal(38,0)")
                * (F.col("n") * F.col("q") - F.col("s"))
            )
            .cast("decimal(38,0)")
            .alias("units"),
            F.max("n").alias("n"),
        )
    )
    dist = F.col("units").cast("double") / F.col("n") / F.col("n")
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("c") == F.col("label"), dist)).alias("a"),
        F.min(F.when(F.col("c") != F.col("label"), dist)).alias("b"),
    )
    sil = ab.select(
        "label",
        F.round(
            F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
                (F.col("b") - F.col("a")) / F.greatest("a", "b")
            ),
            9,
        )
        .cast("decimal(28,12)")
        .alias("sil"),
    )
    return sil.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum("sil").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_silhouette"),
    )


# --- PPMI association mining (embedding preprocessing) --------------------------


@register(
    "ppmi_topk",
    r"""
WITH toks AS (
  SELECT doc_id, t.i AS pos, lower(tok[t.i]) AS w
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x != '') AS tok
        FROM documents) d,
       UNNEST(range(1, len(tok) + 1)) AS t(i)),
bigrams AS (
  SELECT a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM bigrams),
cl AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams GROUP BY 1),
cr AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams GROUP BY 1),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
       FROM bigrams GROUP BY 1, 2 HAVING COUNT(*) >= 3),
scored AS (
  SELECT bc.w1, bc.w2, bc.c,
         ROUND(ln(CAST(bc.c AS DOUBLE) * n.nn / (cl.c * CAST(cr.c AS DOUBLE))), 9)
           AS pmi
  FROM bc JOIN cl ON bc.w1 = cl.w1
          JOIN cr ON bc.w2 = cr.w2
          CROSS JOIN n),
ranked AS (
  SELECT w1, w2, c, pmi,
         ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY pmi DESC, w2) AS rnk
  FROM scored WHERE pmi > 0)
SELECT w1, w2, c AS pair_count, rnk, ROUND(pmi, 6) AS ppmi
FROM ranked WHERE rnk <= 3
""",
)
def q_ppmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positive pointwise mutual information over adjacent token pairs,
    top-3 collocates per left token — the classic count-based embedding
    preprocessing step (PPMI matrices are what SVD word vectors factor;
    Levy & Goldberg 2014). Marginal tables are vocabulary-sized and
    broadcast against the pair table; pairs below support 3 drop before
    scoring (the standard noise floor, and what bounds the per-w1 rank
    window). PMI = ln(c12 * N / (c1 * c2)) is a log of a rational of
    exact integers — identical doubles in both engines — rounded to 9
    decimals BEFORE the (pmi, w2) ordering so the rank tie-break is
    engine-stable."""
    docs = load(spark, sf_dir, "documents", fan_out=True)
    toks = F.transform(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""),
        lambda t: F.lower(t),
    )
    base = docs.select(toks.alias("toks"))
    m = F.greatest(F.lit(0), F.size("toks") - 1)
    pairs = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bigrams = base.select(F.explode(pairs).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # The full (w1, w2) count table subsumes every other aggregate: N is
    # its count sum, both marginals are per-side count sums, and the
    # support-3 pair table is a filter — ONE tokenize+explode pass and
    # one shuffle instead of four (8 scans / 16 Exchanges in one plan
    # before). Identical integers by definition.
    bcfull = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    n = bcfull.agg(F.sum("c").alias("nn"))
    cl = bcfull.groupBy("w1").agg(F.sum("c").alias("c1"))
    cr = bcfull.groupBy("w2").agg(F.sum("c").alias("c2"))
    bc = bcfull.filter(F.col("c") >= 3)
    scored = (
        bc.join(cl.hint("shuffle_hash"), "w1")
        .join(cr.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c",
            F.round(
                F.log(
                    F.col("c").cast("double")
                    * F.col("nn")
                    / (F.col("c1") * F.col("c2").cast("double"))
                ),
                9,
            ).alias("pmi"),
        )
        .filter(F.col("pmi") > 0)
    )
    w = Window.partitionBy("w1").orderBy(F.col("pmi").desc(), "w2")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "w1", "w2", F.col("c").alias("pair_count"), "rnk",
            F.round("pmi", 6).alias("ppmi"),
        )
    )


# --- V-measure: entropy-based clustering agreement ------------------------------


@register(
    "v_measure",
    """
WITH pts AS (
  SELECT label,
         4 * CAST(embedding[1] > 0 AS INT)
           + 2 * CAST(embedding[2] > 0 AS INT)
           + CAST(embedding[3] > 0 AS INT) AS cluster
  FROM embeddings),
cont AS (SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS nij
         FROM pts GROUP BY 1, 2),
n AS (SELECT CAST(SUM(nij) AS BIGINT) AS nn FROM cont),
ks AS (SELECT cluster, CAST(SUM(nij) AS BIGINT) AS nk FROM cont GROUP BY 1),
cs AS (SELECT label, CAST(SUM(nij) AS BIGINT) AS nc FROM cont GROUP BY 1),
hck AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(nij AS DOUBLE) / n.nn)
                             * ln(CAST(nij AS DOUBLE) / ks.nk), 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS v
  FROM cont JOIN ks USING (cluster) CROSS JOIN n),
hkc AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(nij AS DOUBLE) / n.nn)
                             * ln(CAST(nij AS DOUBLE) / cs.nc), 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS v
  FROM cont JOIN cs USING (label) CROSS JOIN n),
hc AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(nc AS DOUBLE) / n.nn)
                             * ln(CAST(nc AS DOUBLE) / n.nn), 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS v
  FROM cs CROSS JOIN n),
hk AS (
  SELECT CAST(SUM(CAST(ROUND(-(CAST(nk AS DOUBLE) / n.nn)
                             * ln(CAST(nk AS DOUBLE) / n.nn), 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS v
  FROM ks CROSS JOIN n),
hv AS (
  SELECT 1 - hck.v / hc.v AS h, 1 - hkc.v / hk.v AS c
  FROM hck CROSS JOIN hkc CROSS JOIN hc CROSS JOIN hk)
SELECT ROUND(h, 6) AS homogeneity, ROUND(c, 6) AS completeness,
       ROUND(2 * h * c / (h + c), 6) AS v_measure
FROM hv
""",
)
def q_v_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-measure (Rosenberg & Hirschberg 2007): the entropy-based
    homogeneity / completeness / harmonic-mean triple for the same
    sign-pattern clustering ARI scores — the two standard external
    clustering metrics disagree exactly when a clustering trades purity
    for coverage, so evaluation pipelines report both. All entropies are
    sums over the k x labels contingency (<= 80 rows): each term is a
    log of a rational of exact integers, rounded to 9 decimals and
    summed as DECIMAL; h, c, v are closed-form doubles at the end. The
    only shuffle is the contingency groupBy."""
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "label",
        (
            F.lit(4) * (F.element_at("embedding", 1) > 0).cast("int")
            + F.lit(2) * (F.element_at("embedding", 2) > 0).cast("int")
            + (F.element_at("embedding", 3) > 0).cast("int")
        ).alias("cluster"),
    )
    # <= 80-row contingency, FIVE consumers (n, ks, cs, hck, hkc) — each
    # re-ran the embeddings scan + groupBy before (20 scans/62 Exchanges).
    cont = (
        pts.groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("nij"))
        .localCheckpoint(eager=True)
    )
    n = cont.agg(F.sum("nij").alias("nn"))
    ks = cont.groupBy("cluster").agg(F.sum("nij").alias("nk"))
    cs = cont.groupBy("label").agg(F.sum("nij").alias("nc"))

    def ent_sum(df: DataFrame, num: str, den: str) -> DataFrame:
        term = F.round(
            -(F.col(num).cast("double") / F.col("nn"))
            * F.log(F.col(num).cast("double") / F.col(den)),
            9,
        ).cast("decimal(28,12)")
        return df.agg(F.sum(term).cast("double").alias("v"))

    hck = ent_sum(cont.join(F.broadcast(ks), "cluster").crossJoin(F.broadcast(n)), "nij", "nk")
    hkc = ent_sum(cont.join(F.broadcast(cs), "label").crossJoin(F.broadcast(n)), "nij", "nc")
    hc = ent_sum(cs.crossJoin(F.broadcast(n)).withColumn("nn2", F.col("nn")), "nc", "nn")
    hk = ent_sum(ks.crossJoin(F.broadcast(n)).withColumn("nn2", F.col("nn")), "nk", "nn")
    hv = (
        hck.select(F.col("v").alias("hck"))
        .crossJoin(F.broadcast(hkc.select(F.col("v").alias("hkc"))))
        .crossJoin(F.broadcast(hc.select(F.col("v").alias("hc"))))
        .crossJoin(F.broadcast(hk.select(F.col("v").alias("hk"))))
        .select(
            (F.lit(1) - F.col("hck") / F.col("hc")).alias("h"),
            (F.lit(1) - F.col("hkc") / F.col("hk")).alias("c"),
        )
    )
    return hv.select(
        F.round("h", 6).alias("homogeneity"),
        F.round("c", 6).alias("completeness"),
        F.round(
            F.lit(2) * F.col("h") * F.col("c") / (F.col("h") + F.col("c")), 6
        ).alias("v_measure"),
    )


# --- Brier score Murphy decomposition -------------------------------------------


@register(
    "brier_decomposition",
    """
WITH ev AS (
  SELECT CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10 AS bucket,
         dayofweek(ts) AS dow,
         CAST(event_type = 'purchase' AS INT) AS y
  FROM events WHERE event_type IN ('purchase', 'view')),
tr AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_tr,
         CAST(SUM(y) AS BIGINT) AS y_tr
  FROM ev WHERE bucket < 8 GROUP BY dow),
te AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_te,
         CAST(SUM(y) AS BIGINT) AS y_te
  FROM ev WHERE bucket >= 8 GROUP BY dow),
tot AS (
  SELECT CAST(SUM(n_te) AS BIGINT) AS nn, CAST(SUM(y_te) AS BIGINT) AS yy
  FROM te),
bins AS (
  SELECT te.dow, te.n_te, te.y_te, tr.n_tr, tr.y_tr, tot.nn, tot.yy,
         CAST(ROUND(CAST(te.n_te AS DOUBLE) / tot.nn
              * (CAST(tr.y_tr AS DOUBLE) / tr.n_tr
                 - CAST(te.y_te AS DOUBLE) / te.n_te)
              * (CAST(tr.y_tr AS DOUBLE) / tr.n_tr
                 - CAST(te.y_te AS DOUBLE) / te.n_te), 9)
              AS DECIMAL(28,12)) AS rel_term,
         CAST(ROUND(CAST(te.n_te AS DOUBLE) / tot.nn
              * (CAST(te.y_te AS DOUBLE) / te.n_te
                 - CAST(tot.yy AS DOUBLE) / tot.nn)
              * (CAST(te.y_te AS DOUBLE) / te.n_te
                 - CAST(tot.yy AS DOUBLE) / tot.nn), 9)
              AS DECIMAL(28,12)) AS res_term
  FROM te JOIN tr USING (dow) CROSS JOIN tot)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       (SELECT nn FROM tot) AS n_eval,
       ROUND(CAST(SUM(rel_term) AS DOUBLE), 6) AS reliability,
       ROUND(CAST(SUM(res_term) AS DOUBLE), 6) AS resolution,
       ROUND((SELECT CAST(yy AS DOUBLE) / nn * (1 - CAST(yy AS DOUBLE) / nn)
              FROM tot), 6) AS uncertainty
FROM bins
""",
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (reliability - resolution
    + uncertainty) for a day-of-week base-rate forecaster of purchase
    probability, fit on the md5 80% shard and scored on the held-out
    20%: the standard diagnostic separating calibration error from
    discrimination for ANY probabilistic prediction. Forecast bins are
    the 7 day-of-week cells, so after the one groupBy everything is
    closed-form rationals of exact counts: per-bin terms are identical
    doubles in both engines, rounded to 9 decimals and decimal-summed.
    This is forecast EVALUATION (is the predictor calibrated? does it
    discriminate?) complementing logistic_calibration's reliability
    table with the quantitative partition."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % 10
            ).alias("bucket"),
            F.dayofweek("ts").alias("dow"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
    )
    tr = ev.filter(F.col("bucket") < 8).groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_tr"), F.sum("y").alias("y_tr")
    )
    te = ev.filter(F.col("bucket") >= 8).groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_te"), F.sum("y").alias("y_te")
    )
    tot = te.agg(F.sum("n_te").alias("nn"), F.sum("y_te").alias("yy"))
    p_tr = F.col("y_tr").cast("double") / F.col("n_tr")
    o_te = F.col("y_te").cast("double") / F.col("n_te")
    obar = F.col("yy").cast("double") / F.col("nn")
    wt = F.col("n_te").cast("double") / F.col("nn")
    bins = (
        te.join(tr, "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(wt * (p_tr - o_te) * (p_tr - o_te), 9)
            .cast("decimal(28,12)")
            .alias("rel_term"),
            F.round(wt * (o_te - obar) * (o_te - obar), 9)
            .cast("decimal(28,12)")
            .alias("res_term"),
            "nn",
            "yy",
        )
    )
    return bins.groupBy("nn", "yy").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.sum("rel_term").cast("double"), 6).alias("reliability"),
        F.round(F.sum("res_term").cast("double"), 6).alias("resolution"),
    ).select(
        "n_bins",
        F.col("nn").alias("n_eval"),
        "reliability",
        "resolution",
        F.round(obar * (1 - obar), 6).alias("uncertainty"),
    )
