"""Dedup-ladder scale probe: synthesize a corpus Spark-side (no I/O bias),
inject exact duplicates and one hot template cluster, and time the MinHash
LSH near-dup pipeline with the hot-bucket fanout cap.

The probe answers the 100 TB design questions directly:
* does candidate generation stay O(corpus + candidates) as docs grow?
* does the fanout cap keep a boilerplate mega-cluster from emitting a
  quadratic pair set out of a single reduce task?

Usage: python tools/scale_probe.py [--docs 200000] [--hot 2000] [--fanout 8]
Prints one JSON line with wall times and docs/s.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.session import get_spark
from taxi_data_datapipeline_spark.operators.dedup import exact_dedup, minhash_lsh_pairs


def synth_corpus(
    spark, n_docs: int, hot: int, dup_frac: float = 0.2, near_frac: float = 0.0
):
    """n_docs synthetic docs: 40-token texts drawn from a 5000-word vocab by
    seeded hash (deterministic, no RNG state); the last dup_frac of ids
    repeat earlier texts (exact dups); the first ``hot`` ids share one
    template (the LSH hot bucket).

    ``near_frac`` > 0 additionally makes that fraction of the UNIQUE id
    range NEAR-duplicates: ids [hot, hot + near_n) form groups of 3
    variants that share a group-seeded 40-token text except positions
    {2v, 2v+1} (variant-specific tokens) — within-group Jaccard ~
    36/44 = 0.82, above the 0.5 LSH threshold with detection probability
    ~0.99 at 32 perms / 8x4 bands. This makes the LSH verification,
    connected-components and cluster-survivorship tiers do real
    corpus-proportional work (the default corpus's near-dup tier
    collapses to 2 docs after exact dedup). Variants derive from ``eff``
    so the exact-dup tail reproduces them bit-identically."""
    n_eff = int(n_docs * (1 - dup_frac))
    near_n = int(n_eff * near_frac)
    eff = (F.col("id") % n_eff).alias("eff")
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda j: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("eff"), j), F.lit(5000))),
    )
    group = (F.col("eff") - hot) / F.lit(3)
    grp = F.floor(group).cast("long")
    var = F.pmod(F.col("eff") - hot, F.lit(3))
    near_words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda j: F.when(
            (j == var * 2) | (j == var * 2 + 1),
            F.concat(F.lit("n"), F.pmod(F.xxhash64(F.col("eff"), j), F.lit(100000))),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(F.xxhash64(grp, j, F.lit(7)), F.lit(5000)))
        ),
    )
    text = F.when(
        F.col("doc_id") < hot,
        F.concat(
            F.lit("template header all pages share this exact boilerplate text body "),
            F.concat_ws(" ", F.lit("page"), F.pmod(F.col("doc_id"), F.lit(2)).cast("string")),
        ),
    )
    if near_n > 0:
        text = text.when(
            (F.col("eff") >= hot) & (F.col("eff") < hot + near_n),
            F.concat_ws(" ", near_words),
        )
    text = text.otherwise(F.concat_ws(" ", words))
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), eff)
        .withColumn("text", text)
        .drop("eff")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--hot", type=int, default=2_000)
    ap.add_argument("--fanout", type=int, default=8)
    args = ap.parse_args()

    load0 = os.getloadavg()[0]  # host-noise audit (bench.py convention)
    spark = get_spark("scale_probe")
    docs = synth_corpus(spark, args.docs, args.hot)
    docs.persist().count()  # materialize corpus outside the timed region

    t0 = time.time()
    n_groups = exact_dedup(docs).filter(F.col("n_copies") > 1).count()
    t_exact = time.time() - t0

    t0 = time.time()
    n_pairs = minhash_lsh_pairs(
        docs, jaccard_threshold=0.5, max_bucket_fanout=args.fanout
    ).count()
    t_minhash = time.time() - t0

    # Round-4 tiers: 4-block pigeonhole SimHash (guaranteed recall at
    # hamming<=3) and cross-doc span dedup (the C4 line-dedup shape).
    from pyspark.sql import Window

    from taxi_data_datapipeline_spark.operators.dedup import simhash_dedup

    t0 = time.time()
    n_simhash = simhash_dedup(
        docs, max_hamming=3, max_bucket_fanout=args.fanout
    ).count()
    t_simhash = time.time() - t0

    t0 = time.time()
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    n_spans = F.ceil(F.size(F.col("tok")) / F.lit(8.0)).cast("int")
    span = lambda k: F.slice(F.col("tok"), k * 8 + 1, 8)  # noqa: E731
    spans = (
        docs.select("doc_id", toks.alias("tok"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_spans - 1),
                    lambda k: F.struct(
                        k.alias("i"), F.md5(F.concat_ws(" ", span(k))).alias("fp")
                    ),
                )
            ).alias("s"),
        )
    )
    w = Window.partitionBy("s.fp").orderBy("doc_id", "s.i")
    n_span_removed = (
        spans.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .count()
    )
    t_span = time.time() - t0

    out = {
        "metric": "dedup_scale_probe",
        "loadavg_at_start": round(load0, 1),
        "loadavg_at_end": round(os.getloadavg()[0], 1),
        "docs": args.docs,
        "hot_cluster": args.hot,
        "fanout": args.fanout,
        "exact_dup_groups": n_groups,
        "exact_sec": round(t_exact, 2),
        "exact_docs_per_sec": round(args.docs / t_exact),
        "minhash_pairs": n_pairs,
        "minhash_sec": round(t_minhash, 2),
        "minhash_docs_per_sec": round(args.docs / t_minhash),
        "simhash_pairs": n_simhash,
        "simhash_sec": round(t_simhash, 2),
        "simhash_docs_per_sec": round(args.docs / t_simhash),
        "span_dedup_removed": n_span_removed,
        "span_dedup_sec": round(t_span, 2),
        "span_dedup_docs_per_sec": round(args.docs / t_span),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
