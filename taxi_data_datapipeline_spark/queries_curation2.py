"""Round-12 curation breadth (VERDICT r11 next-round #5): corpus-health
reporting (per-source dedup rates, tokenizer fertility), smoothed n-gram
LM upgrades over the add-1 ``bigram_perplexity`` (Good-Turing
count-of-counts, interpolated Kneser-Ney), contamination-adjacent n-gram
novelty scoring, and an LSH banding S-curve calibration table pairing
``minhash_estimate_error`` with the band/row design choice.

Every query follows the engine's cross-engine conventions (module
docstring of ``queries.py``): identical aliases on both sides, exact
integer arithmetic until the final divisions, ROUND(.,6) on derived
doubles, ROUND(.,9)->DECIMAL(28,12) on float folds so sums are
fold-order-free, unique-key tie-breaks on every top-k, and SHUFFLE_HASH
pins on every join where BOTH sides are corpus-derived (the SCALING.md
round-11 rule — never let a statistics estimate pick broadcast there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.functions.text import (
    bpe_ish_tokens,
    fingerprint,
    ngram_shingles,
    tokens,
)
from taxi_data_datapipeline_spark.queries import load, register
from taxi_data_datapipeline_spark.queries_data import (
    _SQL_GRAMS,
    _SQL_JACCARD,
    _SQL_TOKS,
)

# Normalized-text fingerprint, shared with dedup_exact's oracle.
_SQL_FP = r"md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))"


# --- per-source dedup health -------------------------------------------------


@register(
    "dedup_rate_by_domain",
    rf"""
WITH fp AS (
  SELECT source, {_SQL_FP} AS fingerprint FROM documents),
tot AS (
  SELECT source, fingerprint,
         COUNT(*) AS c,
         SUM(COUNT(*)) OVER (PARTITION BY fingerprint) AS cluster_sz
  FROM fp GROUP BY source, fingerprint)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cluster_sz > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs,
       CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       ROUND(CAST(SUM(CASE WHEN cluster_sz > 1 THEN c ELSE 0 END) AS DOUBLE)
             / SUM(c), 6) AS dup_rate
FROM tot GROUP BY source
""",
)
def q_dedup_rate_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate-rate rollup — the first table a curation run
    reports: how much of each source is exact-duplicate mass (including
    CROSS-source copies: a doc counts as dup when its normalized
    fingerprint appears anywhere else in the corpus, which is why the
    cluster size is a window over fingerprint, not a per-source count).

    Scale shape: one shuffle to (source, fingerprint) counts, one
    hash-partitioned window over fingerprint for the global cluster
    size (no join back to the corpus — the window replaces the
    corpus-vs-counts join that would otherwise need a shuffle_hash
    pin), one final per-source rollup over an aggregate-sized input."""
    d = load(spark, sf_dir, "documents", fan_out=True)
    fs = (
        d.select("source", fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("source", "fingerprint")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    clustered = fs.withColumn(
        "cluster_sz", F.sum("c").over(Window.partitionBy("fingerprint"))
    )
    dup_c = F.when(F.col("cluster_sz") > 1, F.col("c")).otherwise(F.lit(0))
    return clustered.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(dup_c).cast("long").alias("dup_docs"),
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.round(
            F.sum(dup_c).cast("double") / F.sum("c"), 6
        ).alias("dup_rate"),
    )


# --- tokenizer fertility -----------------------------------------------------


@register(
    "tokenizer_fertility",
    rf"""
WITH base AS (
  SELECT lang, source,
         len({_SQL_TOKS}) AS n_words,
         len(list_filter(string_split_regex(lower(text), '[^\p{{L}}\p{{N}}]+'),
                         t -> t != '')) AS n_subtoks,
         length(text) AS n_chars
  FROM documents)
SELECT lang, source,
       CAST(SUM(n_words) AS BIGINT) AS words,
       CAST(SUM(n_subtoks) AS BIGINT) AS subtokens,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       ROUND(CAST(SUM(n_subtoks) AS DOUBLE) / SUM(n_words), 6) AS fertility,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_subtoks), 6) AS chars_per_subtoken
FROM base GROUP BY lang, source
""",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by (lang, source) — the compression-rate table
    every tokenizer change is judged by: sub-tokens per whitespace word
    (fertility; higher = the tokenizer fragments this slice more) and
    characters per sub-token. A language whose fertility is 2x the
    corpus mean pays 2x the sequence length for the same text — the
    standard argument for rebalancing tokenizer training data.

    The sub-tokenizer is the engine's BPE-precursor regex
    (functions/text.py:bpe_ish_tokens); counts are per-row integers that
    fold in one map-side-combined groupBy — a single shuffle at any
    scale."""
    d = load(spark, sf_dir, "documents", fan_out=True)
    base = d.select(
        "lang",
        "source",
        F.size(tokens(F.col("text"))).alias("n_words"),
        F.size(bpe_ish_tokens(F.col("text"))).alias("n_subtoks"),
        F.length("text").alias("n_chars"),
    )
    return base.groupBy("lang", "source").agg(
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_subtoks").cast("long").alias("subtokens"),
        F.sum("n_chars").cast("long").alias("chars"),
        F.round(
            F.sum("n_subtoks").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_subtoks"), 6
        ).alias("chars_per_subtoken"),
    )


# --- Good-Turing count-of-counts smoothing -----------------------------------


@register(
    "good_turing_smoothing",
    rf"""
WITH toks AS (
  SELECT lower(t.t) AS w
  FROM (SELECT {_SQL_TOKS} AS tok FROM documents) d,
       UNNEST(d.tok) AS t(t)),
wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w),
cc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_types FROM wc GROUP BY c),
head AS (SELECT c, n_types FROM cc ORDER BY c ASC LIMIT 32),
nbr AS (
  SELECT c, n_types,
         COALESCE(LAG(c) OVER (ORDER BY c), 0) AS prev_c,
         LEAD(c) OVER (ORDER BY c) AS next_c
  FROM head),
z AS (
  SELECT c, n_types,
         ROUND(CAST(2 * n_types AS DOUBLE) / (next_c - prev_c), 6) AS z
  FROM nbr WHERE next_c IS NOT NULL),
pts AS (
  SELECT c, n_types, z,
         CAST(ROUND(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(28,12)) AS x,
         CAST(ROUND(ln(z), 9) AS DECIMAL(28,12)) AS y
  FROM z),
s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
                       AS DECIMAL(28,12))) AS DOUBLE) AS sxx
  FROM pts)
SELECT p.c, p.n_types, p.z,
       ROUND((s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx), 6)
         AS loglog_slope
FROM pts p CROSS JOIN s
""",
)
def q_good_turing_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple Good-Turing (Gale & Sampson) smoothing inputs over the
    corpus unigram frequency spectrum: the count-of-counts table N_c for
    the 32 SMALLEST counts present, gap-corrected into Gale's
    Z-transform Z_c = 2 N_c / (next_c - prev_c) (classic GT's
    N_{{c+1}}/N_c needs ADJACENT integer counts, which real — and this
    synthetic — corpora don't have once counts thin out; the Z-value is
    the standard fix), plus the log-log regression slope ln Z ~ ln c
    whose smoothed line replaces raw N_c in the LGT estimator. The
    slope < -1 check is the usual sanity gate before applying SGT.

    Scale shape: corpus -> word counts (one shuffle) -> count-of-counts
    (second shuffle over a vocabulary-sized input). The 32-count head is
    a TakeOrderedAndProject (per-partition heaps, no global sort), and
    every window after it runs over that LIMIT-bounded input — the
    zipf_fit idiom, no unbounded single-partition stage. The regression
    is the exact-decimal moment-sum pattern; ln() terms round to 9
    before summing."""
    d = load(spark, sf_dir, "documents", fan_out=True)
    wc = (
        d.select(F.explode(tokens(F.col("text"))).alias("t"))
        .select(F.lower("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cc = wc.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    head = cc.orderBy(F.col("c").asc()).limit(32)
    w = Window.partitionBy(F.lit(0)).orderBy("c")
    z = (
        head.withColumn("prev_c", F.coalesce(F.lag("c").over(w), F.lit(0)))
        .withColumn("next_c", F.lead("c").over(w))
        .filter(F.col("next_c").isNotNull())
        .select(
            "c",
            "n_types",
            F.round(
                (2 * F.col("n_types")).cast("double")
                / (F.col("next_c") - F.col("prev_c")),
                6,
            ).alias("z"),
        )
    )
    pts = z.select(
        "c",
        "n_types",
        "z",
        F.round(F.log(F.col("c").cast("double")), 9)
        .cast("decimal(28,12)")
        .alias("x"),
        F.round(F.log("z"), 9).cast("decimal(28,12)").alias("y"),
    )
    xd, yd = F.col("x").cast("double"), F.col("y").cast("double")
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.round(xd * yd, 9).cast("decimal(28,12)")).cast("double").alias("sxy"),
        F.sum(F.round(xd * xd, 9).cast("decimal(28,12)")).cast("double").alias("sxx"),
    )
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
        6,
    )
    return pts.crossJoin(F.broadcast(s)).select(
        "c", "n_types", "z", slope.alias("loglog_slope")
    )


# --- n-gram novelty against the train shard ----------------------------------


@register(
    "ngram_novelty_score",
    rf"""
WITH d AS (
  SELECT doc_id, text,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10 AS bucket
  FROM documents),
shingled AS (SELECT doc_id, bucket, {_SQL_GRAMS} AS grams FROM d),
train_g AS (
  SELECT DISTINCT g.g AS gram
  FROM shingled, UNNEST(grams) AS g(g) WHERE bucket < 8),
eval_g AS (
  SELECT doc_id, g.g AS gram
  FROM shingled, UNNEST(grams) AS g(g) WHERE bucket >= 8)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN t.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN t.gram IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM eval_g e LEFT JOIN train_g t ON e.gram = t.gram
GROUP BY e.doc_id
""",
)
def q_ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty against the train shard — the
    document-level memorization/contamination signal: documents hash-
    split 80/20 (the bigram_perplexity convention), and each eval doc
    reports what fraction of its distinct 3-gram shingles never occur in
    ANY train document. novelty ~ 0 means the eval doc is (near-)covered
    by training text — a leaked or boilerplate document; novelty ~ 1
    means genuinely held-out content. The same statistic aggregated over
    an external benchmark is the standard decontamination audit.

    Scale shape: both the eval gram stream and the distinct train-gram
    table scale with the corpus, so the membership probe is a
    SHUFFLE_HASH left join pinned per the SCALING.md round-11 rule
    (a statistics estimate must never pick broadcast here), followed by
    a per-doc rollup."""
    d = load(spark, sf_dir, "documents", fan_out=True)
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 10
    shingled = d.select(
        "doc_id",
        bucket.alias("bucket"),
        ngram_shingles(F.col("text")).alias("grams"),
    )
    train_g = (
        shingled.filter(F.col("bucket") < 8)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    eval_g = shingled.filter(F.col("bucket") >= 8).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    joined = eval_g.join(train_g.hint("shuffle_hash"), "gram", "left")
    novel = F.when(F.col("hit").isNull(), 1).otherwise(0)
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(novel).cast("long").alias("n_novel"),
        F.round(F.sum(novel).cast("double") / F.count(F.lit(1)), 6).alias(
            "novelty"
        ),
    )


# --- interpolated Kneser-Ney bigram LM ---------------------------------------


@register(
    "kneser_ney_bigram",
    rf"""
WITH toks AS (
  SELECT doc_id, t.i AS pos, lower(tok[t.i]) AS w
  FROM (SELECT doc_id, {_SQL_TOKS} AS tok FROM documents) dd,
       UNNEST(range(1, len(tok) + 1)) AS t(i)),
bg AS (
  SELECT a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
h AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n_after
      FROM c12 GROUP BY w1),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_before FROM c12 GROUP BY w2),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM c12)
SELECT c12.w1, c12.w2, c12.c AS c_bigram,
       ROUND((0.75 * h.n_after) / h.c1, 6) AS lambda_w1,
       ROUND(CAST(cont.n_before AS DOUBLE) / t.tt, 6) AS p_cont,
       ROUND(((CAST(c12.c AS DOUBLE) - 0.75) / h.c1)
             + (((0.75 * h.n_after) / h.c1)
                * (CAST(cont.n_before AS DOUBLE) / t.tt)), 6) AS kn_prob
FROM c12 JOIN h ON c12.w1 = h.w1
         JOIN cont ON c12.w2 = cont.w2
         CROSS JOIN t
ORDER BY kn_prob DESC, c12.w1, c12.w2
LIMIT 30
""",
)
def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the smoothing that
    add-1 (`bigram_perplexity`) and Good-Turing both approximate from
    below: absolute discount D = 0.75 off every observed bigram count,
    redistributed via the CONTINUATION probability (how many distinct
    histories precede w2, not how often w2 occurs — the "San Francisco"
    correction). kn_prob = (c-D)/c(w1) + lambda(w1) * P_cont(w2); the
    top-30 bigrams by smoothed probability ship with both interpolation
    components. D = 0.75 is exactly binary-representable, every input to
    the double divisions is an exact integer, and both engines evaluate
    the identically-parenthesized IEEE chain, so the rounded values are
    engine-exact.

    Scale shape: the bigram count table and both marginal tables are
    vocabulary-squared / vocabulary-sized — all corpus-derived, so both
    probability joins are SHUFFLE_HASH-pinned per the SCALING.md rule;
    the 1-row type total broadcasts; the top-30 is TakeOrderedAndProject
    (per-partition heaps), never a global sort."""
    d = load(spark, sf_dir, "documents", fan_out=True)
    toks = F.transform(tokens(F.col("text")), lambda t: F.lower(t))
    base = d.select("doc_id", toks.alias("toks"))
    m = F.greatest(F.lit(0), F.size("toks") - 1)
    pairs = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bg = base.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    h = c12.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n_after"),
    )
    cont = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    t = c12.agg(F.count(F.lit(1)).cast("long").alias("tt"))
    lam = (F.lit(0.75) * F.col("n_after")) / F.col("c1")
    p_cont = F.col("n_before").cast("double") / F.col("tt")
    kn = ((F.col("c").cast("double") - F.lit(0.75)) / F.col("c1")) + (
        lam * p_cont
    )
    return (
        c12.join(h.hint("shuffle_hash"), "w1")
        .join(cont.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "w1",
            "w2",
            F.col("c").alias("c_bigram"),
            F.round(lam, 6).alias("lambda_w1"),
            F.round(p_cont, 6).alias("p_cont"),
            F.round(kn, 6).alias("kn_prob"),
        )
        .orderBy(F.col("kn_prob").desc(), "w1", "w2")
        .limit(30)
    )


# --- MinHash-LSH banding S-curve calibration ---------------------------------

# (bands, rows-per-band) designs for a 24-permutation signature; the
# S-curve p(s) = 1 - (1 - s^r)^b is what the banding choice actually
# trades off (steepness vs threshold location), and this table scores
# every design against the corpus's OWN observed similarity distribution.
_SCURVE_CONFIGS = [(24, 1), (12, 2), (8, 3), (6, 4), (4, 6), (2, 12)]


def _chain_sql(term: str, n: int) -> str:
    """Left-associated n-fold product — the same IEEE evaluation order the
    Column chain below uses, so both engines compute bit-identical
    doubles (pow() implementations may differ; a multiply chain can't)."""
    out = term
    for _ in range(n - 1):
        out = f"({out} * {term})"
    return out


def _scurve_sql() -> str:
    aggs, selects = [], []
    for b, r in _SCURVE_CONFIGS:
        sr = _chain_sql("jaccard", r)
        p = f"(1.0 - {_chain_sql(f'(1.0 - {sr})', b)})"
        key = f"{b}_{r}"
        aggs.append(
            f"CAST(SUM(CAST(ROUND({p}, 9) AS DECIMAL(28,12))) AS DOUBLE)"
            f" AS e_all_{key},\n"
            f"  CAST(SUM(CASE WHEN jaccard >= 0.5 THEN CAST(ROUND({p}, 9)"
            f" AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END)"
            f" AS DOUBLE) AS e_hi_{key},\n"
            f"  CAST(SUM(CASE WHEN jaccard < 0.5 THEN CAST(ROUND({p}, 9)"
            f" AS DECIMAL(28,12)) ELSE CAST(0 AS DECIMAL(28,12)) END)"
            f" AS DOUBLE) AS e_lo_{key}"
        )
        selects.append(
            f"SELECT {b} AS bands, {r} AS rows_per_band, n_pairs, n_hi,\n"
            f"       ROUND(e_all_{key}, 6) AS exp_detected,\n"
            f"       ROUND(e_hi_{key} / n_hi, 6) AS hi_recall,\n"
            f"       ROUND(e_lo_{key}, 6) AS lo_fp_mass\n"
            f"FROM agg"
        )
    agg_cols = ",\n  ".join(aggs)
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH g AS (SELECT doc_id, lang, n_chars // 100 AS lenb, {_SQL_GRAMS} AS grams
           FROM documents),
pairs AS (
  SELECT jaccard FROM (
    SELECT {_SQL_JACCARD} AS jaccard
    FROM g a JOIN g b
      ON a.lang = b.lang AND a.lenb = b.lenb AND a.doc_id < b.doc_id)
  WHERE jaccard >= 0.05),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(CASE WHEN jaccard >= 0.5 THEN 1 END) AS BIGINT) AS n_hi,
  {agg_cols}
  FROM pairs)
{union}
"""


@register("lsh_s_curve", _scurve_sql())
def q_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding-design calibration: for each (bands, rows-per-band)
    split of a 24-permutation MinHash signature, the S-curve detection
    probability p(s) = 1 - (1 - s^r)^b evaluated against the corpus's
    OWN observed pair-similarity distribution (the exact blocked 3-gram
    Jaccard pairs of `ngram_jaccard_blocked`, threshold 0.05). Per
    design: expected detected pairs overall, expected recall among true
    near-dups (s >= 0.5), and the expected false-positive candidate
    mass from sub-threshold pairs — the table that picks b x r before a
    production LSH run, pairing `minhash_estimate_error` (signature
    accuracy) with the banding choice itself.

    Cross-engine exactness: s is the already-rounded exact Jaccard;
    s^r and (1-s^r)^b are LEFT-ASSOCIATED multiply chains emitted from
    the same generator on both sides (pow() may differ between libms —
    a fixed multiply chain cannot); per-pair probabilities round to 9
    and sum as DECIMAL, so the fold is order-free.

    Scale shape: ONE pass over the pair table computes all 6 designs'
    moments in a single map-side-combined aggregate (no per-config
    re-scan); the 6 output rows unpivot from the 1-row aggregate. Pair
    generation itself is the bounded-quadratic blocked join, already
    audited in ngram_jaccard_blocked."""
    from taxi_data_datapipeline_spark.operators.dedup import (
        blocked_jaccard_pairs,
    )

    docs = load(spark, sf_dir, "documents", fan_out=True).withColumn(
        "lenb", F.expr("n_chars DIV 100")
    )
    pairs = blocked_jaccard_pairs(
        docs, block_cols=["lang", "lenb"], threshold=0.05
    ).select("jaccard")

    def chain(col, n):
        out = col
        for _ in range(n - 1):
            out = out * col
        return out

    s = F.col("jaccard")
    dec0 = F.lit(0).cast("decimal(28,12)")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.count(F.when(s >= 0.5, 1)).cast("long").alias("n_hi"),
    ]
    for b, r in _SCURVE_CONFIGS:
        p = F.lit(1.0) - chain(F.lit(1.0) - chain(s, r), b)
        pd = F.round(p, 9).cast("decimal(28,12)")
        key = f"{b}_{r}"
        aggs += [
            F.sum(pd).cast("double").alias(f"e_all_{key}"),
            F.sum(F.when(s >= 0.5, pd).otherwise(dec0))
            .cast("double")
            .alias(f"e_hi_{key}"),
            F.sum(F.when(s < 0.5, pd).otherwise(dec0))
            .cast("double")
            .alias(f"e_lo_{key}"),
        ]
    agg = pairs.agg(*aggs)
    rows = None
    for b, r in _SCURVE_CONFIGS:
        key = f"{b}_{r}"
        row = agg.select(
            F.lit(b).alias("bands"),
            F.lit(r).alias("rows_per_band"),
            "n_pairs",
            "n_hi",
            F.round(F.col(f"e_all_{key}"), 6).alias("exp_detected"),
            F.round(F.col(f"e_hi_{key}") / F.col("n_hi"), 6).alias(
                "hi_recall"
            ),
            F.round(F.col(f"e_lo_{key}"), 6).alias("lo_fp_mass"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows
