"""Deduplication operators for document corpora.

Four tiers, each a pure DataFrame plan:

* **exact**: md5-of-normalized-text grouping — one shuffle on the hash.
* **MinHash + LSH banding**: shingle -> P minhash values -> B band keys ->
  bucket self-pairing -> exact-Jaccard verification of candidates only.
  The scale path: cost is O(corpus) + O(candidate pairs), never O(n^2).
* **SimHash**: 64-bit sign-of-weighted-bit-sums fingerprint; near-dups =
  small Hamming distance within LSH-style prefix buckets.
* **blocked exact Jaccard**: O(block^2) pairwise verification inside cheap
  blocking keys — the oracle-checkable ground truth for the tiers above.

Everything is built from Spark array/hash expressions (xxhash64, transform,
aggregate) — no Python UDFs anywhere, so the whole feature extraction stays
in whole-stage codegen.

Algorithms are the standard public constructions: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
SEQUENCES 1997), banding-based LSH candidate generation (Leskovec/
Rajaraman/Ullman, Mining of Massive Datasets ch. 3), and SimHash rounding
(Charikar, "Similarity estimation techniques from rounding algorithms",
STOC 2002).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.functions.text import fingerprint, ngram_shingles


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalized: bool = True
) -> DataFrame:
    """Exact duplicate groups: fingerprint -> (representative id, n_copies).

    Representative = min id (deterministic). One shuffle on the 128-bit
    fingerprint — uniform keys, no skew at any corpus size.
    """
    fp = fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signature(text: Column, num_perm: int = 32, ngram: int = 3) -> Column:
    """Array of ``num_perm`` minhash values over distinct word n-grams.

    Permutation i is xxhash64(shingle, i) — a seeded 64-bit hash per
    shingle; the min over shingles approximates a random permutation's
    first element (standard MinHash construction).
    """
    grams = ngram_shingles(text, ngram)
    return F.array(
        *[F.array_min(F.transform(grams, lambda g: F.xxhash64(g, F.lit(i)))) for i in range(num_perm)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    ngram: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_fanout: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH banding + exact verification.

    Plan shape (scale analysis in module doc):
      1. signature: map-only, codegen'd array math over each document;
      2. explode to (band_id, band_hash) -> groupBy bucket: one shuffle of
         B rows per doc (B small);
      3. buckets with >1 doc emit candidate pairs (combinations inside the
         collected bucket — buckets are tiny by construction; a hot bucket
         means near-identical docs, which ARE the answer);
      4. exact Jaccard on candidates only, via a join back to shingle sets.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.

    ``max_bucket_fanout`` is the hot-bucket (skew) guard for corpus scale:
    a bucket of k near-identical documents (boilerplate pages, license
    headers) otherwise emits k(k-1)/2 pairs — one 10M-doc template cluster
    would emit 5*10^13 pairs from a single reduce task. With a fanout cap
    F, each member pairs only with the F lowest-id members, bounding the
    bucket to O(k*F) edges. Buckets with k <= F are untouched (the cap
    degenerates to the full pair set), so small-bucket semantics — the
    design point of LSH banding — are exact; mega-clusters stay connected
    through their low-id representatives, which is what downstream
    connected-components grouping needs. None = no cap (exact everywhere).
    """
    rows = num_perm // bands
    # The corpus-wide gram frame is NEVER materialized: caching 10^6+
    # Java string arrays (≈3 KB/doc deserialized) hit a GC cliff between
    # 1.6 M and 3.2 M docs (LSH stage 19 s -> 200 s at 2x the data in the
    # curation probe). Shingling runs as a streaming map inside the
    # signature aggregation — one pass over the corpus, nothing cached —
    # and the verification join below re-shingles ONLY the candidate
    # documents (a semi-join-pruned, candidate-sized set).
    grams = df.select(
        F.col(id_col).alias("_gid"),
        ngram_shingles(F.col(text_col), ngram).alias("grams"),
    )
    # Explode-then-aggregate minhash: the num_perm seeded mins run as
    # codegen'd hash-aggregate columns with map-side partial aggregation —
    # vs. num_perm interpreted array traversals (each re-deriving the
    # shingle array) in the naive array_min(transform(...)) formulation.
    exploded = grams.select(
        F.col("_gid").alias("_id"), F.explode("grams").alias("gram")
    )
    sig = exploded.groupBy("_id").agg(
        *[F.min(F.xxhash64("gram", F.lit(i))).alias(f"m{i}") for i in range(num_perm)]
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("_id", F.explode(F.array(*band_cols)).alias("bk"))
    pairs = (
        _pairs_expr(F.col("ids"))
        if max_bucket_fanout is None
        else _capped_pairs_expr(F.col("ids"), max_bucket_fanout)
    )
    # Candidates are the SMALL frame (bounded by banding collisions +
    # the fanout cap): checkpoint them, then re-shingle just the docs
    # they mention. The semi join prunes BEFORE shingling, so the extra
    # shingle pass costs O(candidate docs), not O(corpus) — and the only
    # cached state is candidate-sized. localCheckpoint (not persist):
    # block cleanup is reference-tracked (the r3 ADVICE leak class).
    cands = (
        buckets.groupBy("bk")
        .agg(F.collect_set("_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_ids = cands.select(
        F.explode(F.array("doc_a", "doc_b")).alias("_gid")
    ).distinct()
    cand_grams = (
        df.join(cand_ids, F.col(id_col) == F.col("_gid"), "left_semi")
        .select(
            F.col(id_col).alias("_gid"),
            ngram_shingles(F.col(text_col), ngram).alias("grams"),
        )
        .localCheckpoint(eager=True)
    )
    ga, gb = cand_grams.alias("ga"), cand_grams.alias("gb")
    verified = (
        cands.join(ga, F.col("doc_a") == F.col("ga._gid"))
        .join(gb, F.col("doc_b") == F.col("gb._gid"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ga.grams", "gb.grams")).cast("double")
                / F.size(F.array_union("ga.grams", "gb.grams")),
                6,
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= jaccard_threshold)


def _capped_pairs_expr(ids: Column, fanout: int) -> Column:
    """(a,b) pairs with a<b where a is one of the ``fanout`` smallest ids.

    Equal to the full pair set when the bucket has <= fanout+1 members;
    otherwise each member connects to the low-id representatives only —
    O(k*fanout) edges instead of O(k^2).
    """
    sorted_ids = F.array_sort(ids)
    reps = F.slice(sorted_ids, 1, fanout)
    return F.filter(
        F.flatten(
            F.transform(
                sorted_ids,
                lambda m: F.transform(
                    reps, lambda r: F.struct(r.alias("a"), m.alias("b"))
                ),
            )
        ),
        lambda p: p["a"] < p["b"],
    )


def _pairs_expr(ids: Column) -> Column:
    """All (a,b) combinations with a<b from an array column, as structs."""
    sorted_ids = F.array_sort(ids)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size(sorted_ids) - 2),
            lambda i: F.transform(
                F.slice(sorted_ids, (i + 2).cast("int"), F.size(sorted_ids)),
                lambda x: F.struct(
                    F.element_at(sorted_ids, (i + 1).cast("int")).alias("a"), x.alias("b")
                ),
            ),
        )
    )


def blocked_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard inside blocking keys.

    Semantics: every same-block pair with jaccard >= threshold (threshold
    must be > 0). Instead of the naive O(block^2) self-join with per-pair
    array_intersect/array_union (quadratic in BOTH pair count and gram-set
    size), this is the classic exploded similarity join:

      1. explode distinct shingles -> (block, gram, id): one pass;
      2. self equi-join on (block, gram): only pairs that SHARE a gram ever
         materialize, and the join is a plain shuffled hash join on a
         fine-grained key — |intersection| = the per-pair match count;
      3. jaccard = inter / (|A| + |B| - inter) via two cheap joins to the
         per-doc gram counts.

    Zero-intersection pairs never appear, which is exactly right for any
    threshold > 0. Cost scales with sum over grams of df(gram)^2 within a
    block — bounded by the blocking, not by block^2 full-array scans.
    """
    # The gram ARRAYS are never cached (the corpus-wide deserialized
    # string-array cache is the GC cliff fixed in minhash_lsh_pairs);
    # shingling streams ONCE into the exploded inverted index, which
    # carries each doc's gram-set size per row (+4 B next to the gram
    # string) — the containment_pairs convention. That kills the second
    # full tokenize+shingle pass the separate per-doc size frame paid,
    # its checkpoint job, and the two size joins after the aggregate
    # (sz is functionally dependent on the doc id, so grouping by it
    # yields identical groups).
    g = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        ngram_shingles(F.col(text_col), ngram).alias("grams"),
    )
    # Flat (block, id, sz, gram) rows consumed by BOTH self-join sides —
    # materialize so the shingle regex + explode runs once, not once per
    # side (this is NOT the corpus-wide gram-ARRAY cache the note above
    # forbids: rows are flat strings, MEMORY_AND_DISK spills).
    ex = g.select(
        *block_cols, "_id", F.size("grams").alias("sz"),
        F.explode("grams").alias("gram"),
    ).localCheckpoint(eager=True)
    a, b = ex.alias("a"), ex.alias("b")
    # Gram-exploded self-join: both sides are the corpus-sized inverted
    # index (a Generate above the scan, whose output size Catalyst
    # under-estimates) -- pin shuffle_hash so a statistics estimate can
    # never choose broadcast (SCALING.md round-11 rule).
    inter = (
        a.join(b.hint("shuffle_hash"), [*block_cols, "gram"])
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(text: Column, ngram: int = 1, bits: int = 64) -> Column:
    """SimHash fingerprint: per-feature xxhash64, sum +/-1 per bit over all
    features, sign -> bit. Returns a signed 64-bit fingerprint.

    Pure array math: for each bit position, count features with that bit
    set vs total; bit set in output iff count*2 > total.
    """
    feats = ngram_shingles(text, ngram)
    hashes = F.transform(feats, lambda g: F.xxhash64(g))
    n = F.size(hashes)
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    # Single fold: accumulate per-bit set-counts in one array accumulator
    # (one pass over features instead of `bits` separate array traversals).
    bit_counts = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.getbit(h, b).cast("long"),
            ),
            lambda a, x: a + x,
        ),
    )
    # Packing touches the 64-slot counts array, not the features — cheap.
    out = F.lit(0).cast("long")
    for b in range(bits):
        c = F.element_at(bit_counts, b + 1)
        out = out.bitwiseOR(
            F.when(c * 2 > n, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return out


def _feature_hash(col: Column, hash_fn: str) -> tuple[Column, int]:
    """Per-feature 64/60-bit hash. ``xxhash64`` is the production path
    (one JVM intrinsic per shingle); ``md5_60`` (first 15 hex chars of
    md5 as a bigint) is slower but PORTABLE — any engine with md5 can
    reproduce the fingerprints bit-for-bit, enabling full cross-engine
    verification of the simhash pipeline."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col), 64
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"), 60
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash) via explode + hash-aggregate — the codegen-friendly
    formulation: higher-order array functions are interpreted in Spark, so
    folding 64 bits per feature inside `aggregate()` is CPU-bound on the
    expression interpreter; exploding shingles and summing 64 `getbit`
    columns keeps the whole pipeline in whole-stage codegen with map-side
    partial aggregation (shuffle = 65 longs per doc per partition)."""
    h, bits = _feature_hash(F.col("gram"), hash_fn)
    feats = df.select(
        F.col(id_col).alias("_id"),
        F.explode(ngram_shingles(F.col(text_col), ngram)).alias("gram"),
    ).select("_id", h.alias("h"))
    aggs = [F.sum(F.getbit("h", F.lit(b))).alias(f"c{b}") for b in range(bits)] + [
        F.count("*").alias("n")
    ]
    counts = feats.groupBy("_id").agg(*aggs)
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out.bitwiseOR(
            F.when(F.col(f"c{b}") * 2 > F.col("n"), F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return counts.select("_id", out.alias("sh"))


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    num_tables: int | None = None,
    max_bucket_fanout: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash with GUARANTEED recall: the fingerprint
    is split into ``num_tables`` (default ``max_hamming + 1``) disjoint
    bit-blocks, each block is an LSH table, and candidates are the union
    of per-block bucket self-joins; Hamming distance <= max_hamming
    verifies inside buckets.

    Pigeonhole recall proof (the Manku/Jain/Sarma WWW'07 construction):
    a pair with at most ``max_hamming`` differing bits cannot touch all
    ``max_hamming + 1`` blocks, so the two fingerprints agree EXACTLY on
    at least one block and the pair is generated by that table — 100%
    recall at the stated radius, unlike a single prefix bucket (the
    rounds-1-3 demo formulation, which missed pairs whose differing bits
    fell in the prefix). Cost: each doc appears in num_tables buckets
    (explode factor 4 for hamming 3) — the standard production trade.

    ``max_bucket_fanout`` is the hot-bucket skew guard (same contract as
    ``minhash_lsh_pairs``): a template cluster of k near-identical docs
    puts all k in the same block bucket of every table, emitting
    O(k^2) hamming-0 pairs — the 200k-doc scale probe measured 1.04M
    pairs from ONE 2000-doc cluster uncapped. With a cap each member
    pairs only with the F lowest-id members per bucket (O(k*F) edges);
    buckets with k <= F keep exact semantics, and the guaranteed-recall
    property holds for every pair not inside a capped mega-bucket.
    None (default) = exact everywhere — what the oracle-checked queries
    use.
    """
    _, bits = _feature_hash(F.lit(""), hash_fn)
    nt = num_tables if num_tables is not None else max_hamming + 1
    block_bits = bits // nt
    mask = (1 << block_bits) - 1
    # One fingerprint row per doc, consumed by BOTH self-join sides —
    # materialize so the shingle explode + 60-bit vote aggregate runs
    # once, not once per side.
    s = simhash_table(
        df, text_col=text_col, id_col=id_col, ngram=3, hash_fn=hash_fn
    ).localCheckpoint(eager=True)
    blocks = F.array(
        *[
            F.struct(
                F.lit(r).alias("t"),
                F.shiftright("sh", r * block_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for r in range(nt)
        ]
    )
    keyed = s.select("_id", "sh", F.explode(blocks).alias("bk"))
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    if max_bucket_fanout is None:
        a, b = keyed.alias("a"), keyed.alias("b")
        # Banded self-join over the corpus-sized signature table (post-
        # aggregate build side) -- shuffle_hash pin per the SCALING.md
        # round-11 rule; the band value is the shuffle key.
        cands = a.join(
            b.hint("shuffle_hash"),
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a._id") < F.col("b._id")),
        ).select(F.col("a._id").alias("doc_a"), F.col("a.sh").alias("sh_a"),
                 F.col("b._id").alias("doc_b"), F.col("b.sh").alias("sh_b"))
    else:
        # sort_array on (id, sh) structs orders by id; each member pairs
        # with the max_bucket_fanout lowest-id members of its bucket.
        members = F.array_sort(
            F.collect_set(F.struct(F.col("_id"), F.col("sh")))
        )
        per_bucket = keyed.groupBy("bk").agg(members.alias("ms"))
        reps = F.slice(F.col("ms"), 1, max_bucket_fanout)
        pair_structs = F.filter(
            F.flatten(
                F.transform(
                    F.col("ms"),
                    lambda m: F.transform(
                        reps, lambda r: F.struct(r.alias("a"), m.alias("b"))
                    ),
                )
            ),
            lambda p: p["a"]["_id"] < p["b"]["_id"],
        )
        cands = per_bucket.select(F.explode(pair_structs).alias("p")).select(
            F.col("p.a._id").alias("doc_a"), F.col("p.a.sh").alias("sh_a"),
            F.col("p.b._id").alias("doc_b"), F.col("p.b.sh").alias("sh_b"),
        )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        # a pair agreeing on k blocks surfaces k times — one row per pair
        .distinct()
    )


def minhash_lsh_incremental(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    ngram: int = 3,
    jaccard_threshold: float = 0.5,
    max_old_per_bucket: int = 8,
    observation=None,
) -> DataFrame:
    """Incremental near-dup screen: candidates only BETWEEN a new batch
    and the existing corpus — the daily-ingest shape, where re-running
    the full self-join (minhash_lsh_pairs) would redo O(corpus) pair
    work to answer an O(batch) question.

    Same banding machinery as the self-join variant; the difference is
    candidate generation: per bucket, each NEW document pairs with at
    most ``max_old_per_bucket`` lowest-id OLD documents (the hot-bucket
    fanout cap, one-sided — a boilerplate bucket holding 10M old docs
    must not multiply the batch). The cap silently trades recall for
    bounded fanout, so the loss is made VISIBLE: pass a
    ``pyspark.sql.Observation`` as ``observation`` and after the first
    action its metrics report ``capped_buckets`` (buckets whose old side
    was truncated AND that contain at least one new document — a capped
    bucket with no new docs produces no candidates, so its truncation
    cannot cost batch-vs-corpus recall and must not trip the signal)
    and ``buckets`` (total candidate buckets) — zero capped buckets
    proves the screen was exhaustive.

    In production the old side's signatures/buckets would be a persisted
    table refreshed per ingest; here both sides derive in one job for
    oracle-checkability. Only candidate-sized frames are ever
    materialized (localCheckpoint — block cleanup is reference-tracked,
    unlike persist()): the corpus-wide shingle table streams through the
    signature aggregation uncached, and verification re-shingles just
    the candidate documents behind a semi join (the GC-cliff fix shared
    with minhash_lsh_pairs).

    Output: (new_doc, old_doc, jaccard >= threshold).
    """
    rows = num_perm // bands
    tagged = old.select(
        F.col(id_col).alias("_gid"), F.col(text_col).alias("_text"), F.lit(0).alias("_new")
    ).unionByName(
        new.select(
            F.col(id_col).alias("_gid"),
            F.col(text_col).alias("_text"),
            F.lit(1).alias("_new"),
        )
    )
    # As in minhash_lsh_pairs: the corpus-wide gram frame is never
    # materialized (the deserialized string arrays hit a GC cliff past
    # ~2M docs); shingling streams through the signature aggregation, and
    # verification re-shingles only candidate docs behind a semi join.
    grams = tagged.select(
        "_gid", "_new", ngram_shingles(F.col("_text"), ngram).alias("grams")
    )
    exploded = grams.select("_gid", "_new", F.explode("grams").alias("gram"))
    sig = exploded.groupBy("_gid", "_new").agg(
        *[F.min(F.xxhash64("gram", F.lit(i))).alias(f"m{i}") for i in range(num_perm)]
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        "_gid", "_new", F.explode(F.array(*band_cols)).alias("bk")
    )
    # Per bucket: sorted old ids (capped) x new ids -> cross candidates.
    per_bucket = buckets.groupBy("bk").agg(
        F.sort_array(
            F.collect_set(F.when(F.col("_new") == 0, F.col("_gid")))
        ).alias("all_olds"),
        F.collect_set(F.when(F.col("_new") == 1, F.col("_gid"))).alias("news"),
    ).select(
        F.slice("all_olds", 1, max_old_per_bucket).alias("olds"),
        "news",
        (F.size("all_olds") > max_old_per_bucket).cast("long").alias("capped"),
    )
    if observation is not None:
        # Count a truncated bucket only when it could actually cost
        # batch-vs-corpus recall: a capped bucket with ZERO new documents
        # produces no candidates, so its truncation is harmless and must not
        # poison the "zero capped buckets => screen was exhaustive" signal.
        per_bucket = per_bucket.observe(
            observation,
            F.sum(
                F.col("capped") * (F.size("news") > 0).cast("long")
            ).alias("capped_buckets"),
            F.count(F.lit(1)).alias("buckets"),
        )
    cands = (
        per_bucket.filter((F.size("olds") > 0) & (F.size("news") > 0))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(news, n ->"
                    " transform(olds, o -> struct(n AS new_doc, o AS old_doc))))"
                )
            ).alias("p")
        )
        .select("p.new_doc", "p.old_doc")
        .distinct()
        # Eager: also forces the observe() metrics above to populate on
        # the checkpoint action itself.
        .localCheckpoint(eager=True)
    )
    cand_ids = cands.select(
        F.explode(F.array("new_doc", "old_doc")).alias("_cid")
    ).distinct()
    cand_grams = (
        tagged.join(cand_ids, F.col("_gid") == F.col("_cid"), "left_semi")
        .select("_gid", ngram_shingles(F.col("_text"), ngram).alias("grams"))
        .localCheckpoint(eager=True)
    )
    ga = cand_grams.select(
        F.col("_gid").alias("old_doc"), F.col("grams").alias("og")
    )
    gb = cand_grams.select(
        F.col("_gid").alias("new_doc"), F.col("grams").alias("ng")
    )
    return (
        cands.join(ga, "old_doc")
        .join(gb, "new_doc")
        .select(
            "new_doc",
            "old_doc",
            F.round(
                F.size(F.array_intersect("ng", "og")).cast("double")
                / F.size(F.array_union("ng", "og")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def ranked_gram_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """(_id, sz, gram, rn) for every document's distinct shingles, ranked
    by the GLOBAL rarity order (corpus document frequency, ties by gram
    string) — the shared substrate of every prefix-filter join. Flat
    narrow rows (never gram ARRAYS — the GC-cliff rule), so callers may
    localCheckpoint it and serve several joins from one shingling pass."""
    from pyspark.sql.window import Window

    g = df.select(
        F.col(id_col).alias("_id"),
        ngram_shingles(F.col(text_col), ngram).alias("grams"),
    )
    ex = g.select(
        "_id", F.size("grams").alias("sz"), F.explode("grams").alias("gram")
    )
    dfreq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    # Both sides corpus-scaled (exploded grams vs gram-df aggregate) and
    # the build side is a post-aggregate whose row estimate Catalyst
    # guesses optimistically -- never let statistics pick broadcast here
    # (SCALING.md round-11 rule; the substring_dup_spans sf3 failure
    # class). shuffle_hash keeps the join shuffled at every scale.
    return ex.join(dfreq.hint("shuffle_hash"), "gram").withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("_id").orderBy("df", "gram")),
    ).select("_id", "sz", "gram", "rn")


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Global (blocking-free) exact-Jaccard similarity self-join via
    PREFIX FILTERING — the AllPairs/PPJoin candidate generator
    (Bayardo/Ma/Srikant WWW'07, Xiao et al. WWW'08).

    For Jaccard >= t, any qualifying pair (x, y) has
    |x ∩ y| >= t·|x ∪ y| >= t·max(|x|,|y|), so each side's overlap is at
    least α(x) = ceil(t·|x|). Order every document's shingles by a GLOBAL
    rarity order (corpus document frequency, ties by the gram string);
    if the first |x| - α(x) + 1 grams of x (its *prefix*) missed the
    intersection entirely, the intersection would fit inside the
    remaining α(x) - 1 grams — contradiction. Hence every qualifying
    pair shares a PREFIX gram, and the candidate join runs on the
    prefix-exploded index only: cost Σ_gram df_prefix(gram)^2 — driven by
    RARE grams — instead of the full-index Σ df(gram)^2 or the O(n^2)
    all-pairs scan. A length filter (min >= t·max, same overlap bound)
    drops cross-size candidates before verification.

    The threshold is a RATIONAL t = threshold_num/threshold_den so that
    α(x) = ceil(t·|x|) is computed in exact integer arithmetic
    ((num·sz + den - 1) DIV den) on every engine — a float t·sz can land
    on a representation boundary and shorten the prefix below the
    completeness bound.

    Candidate collisions then pass PPJoin's POSITION filter before any
    verification: at a qualifying pair's FIRST common gram (first in the
    global order, hence first in both documents' prefixes — found with
    two plain MINs), the overlap can be at most
    1 + min(|x| - rank_x, |y| - rank_y), which must reach the pair bound
    α(x,y) = ceil(t/(1+t)·(|x|+|y|)). Survivors are verified with exact
    array intersections over RE-SHINGLED candidate documents (a semi
    join; the corpus-wide gram-array frame is never materialized — the
    cache/checkpoint of that frame is the GC cliff documented in
    minhash_lsh_pairs). Output: (doc_a, doc_b, jaccard >= t), jaccard
    rounded to 6 for cross-engine parity.
    """
    t = threshold_num / threshold_den
    if ranked is None:
        ranked = ranked_gram_index(df, text_col, id_col, ngram)
    alpha = F.expr(
        f"({threshold_num} * sz + {threshold_den - 1}) DIV {threshold_den}"
    )
    pref = ranked.filter(F.col("rn") <= F.col("sz") - alpha + 1).select(
        "_id", "sz", "gram", "rn"
    )
    a = pref.select(
        F.col("_id").alias("doc_a"),
        F.col("sz").alias("sz_a"),
        F.col("rn").alias("ra"),
        "gram",
    )
    b = pref.select(
        F.col("_id").alias("doc_b"),
        F.col("sz").alias("sz_b"),
        F.col("rn").alias("rb"),
        "gram",
    )
    # First common gram per pair: the global order is shared, so the
    # min-rank collision in a IS the min-rank collision in b — two MINs
    # inside the same aggregation that replaces the naive DISTINCT.
    first = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("sz_a", "sz_b") * F.lit(threshold_den)
            >= F.greatest("sz_a", "sz_b") * F.lit(threshold_num)
        )
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.min("ra").alias("ra"), F.min("rb").alias("rb"))
    )
    alpha_pair = F.expr(
        f"({threshold_num} * (sz_a + sz_b) + {threshold_num + threshold_den - 1})"
        f" DIV {threshold_num + threshold_den}"
    )
    cands = first.filter(
        1 + F.least(F.col("sz_a") - F.col("ra"), F.col("sz_b") - F.col("rb"))
        >= alpha_pair
    ).select("doc_a", "doc_b")
    # Verification re-shingles only documents that SURVIVE the filters
    # (left-semi join), instead of checkpointing every document's grams.
    ids = cands.select(
        F.explode(F.array("doc_a", "doc_b")).alias("_id")
    ).distinct()
    # ids is a density-scaled distinct aggregate (optimistic estimate);
    # keep the semi-join shuffled.
    gsub = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .join(ids.hint("shuffle_hash"), "_id", "left_semi")  # filter raw docs BEFORE shingling
        .select("_id", ngram_shingles(F.col("_text"), ngram).alias("grams"))
    )
    ga = gsub.select(F.col("_id").alias("doc_a"), F.col("grams").alias("_ga"))
    gb = gsub.select(F.col("_id").alias("doc_b"), F.col("grams").alias("_gb"))
    # Candidate pairs (post-aggregate) vs re-shingled survivors (semi-
    # joined corpus subset): both density-scaled -- keep shuffled.
    return (
        cands.join(ga.hint("shuffle_hash"), "doc_a")
        .join(gb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("_ga", "_gb")).cast("double")
                / F.size(F.array_union("_ga", "_gb")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(t))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Directed CONTAINMENT similarity join: ordered pairs (a, b), a != b,
    with |grams(a) ∩ grams(b)| / |grams(a)| >= t — Broder's containment
    coefficient, the asymmetric cousin of Jaccard that catches a short
    document embedded inside a longer one (quoted posts, boilerplate
    wrappers, partial copies), which symmetric Jaccard misses because the
    big document's size dominates the union.

    Candidate generation is the one-sided prefix filter: containment >= t
    forces overlap >= ceil(t·|a|), so a's |a| - ceil(t·|a|) + 1 rarest
    grams (global df order, exact integer-rational threshold) must hit
    the intersection — join a-prefixes against the OTHER side's full
    inverted index. Two lossless pre-verification prunes then apply
    per pair: the size bound |b| >= ceil(t·|a|) (the intersection fits
    inside b), and the POSITION filter at the first common gram (first
    in the global order; since a common gram earlier in a's order would
    also be in b's full index, the min-rank collision IS the first
    common gram): overlap <= 1 + min(|a| - rank_a, |b| - rank_b) must
    reach ceil(t·|a|). At sf0.1 this cuts candidates 921k -> the
    verified set's neighborhood, which is what bounds the array-
    intersect verification stage. Verification re-shingles only
    surviving documents behind semi joins (never a corpus-wide
    gram-array cache)."""
    t = threshold_num / threshold_den
    if ranked is None:
        ranked = ranked_gram_index(df, text_col, id_col, ngram)
    alpha = F.expr(
        f"({threshold_num} * sz + {threshold_den - 1}) DIV {threshold_den}"
    )
    pref = ranked.filter(F.col("rn") <= F.col("sz") - alpha + 1).select(
        F.col("_id").alias("doc_a"),
        F.col("sz").alias("sz_a"),
        F.col("rn").alias("ra"),
        "gram",
    )
    full = ranked.select(
        F.col("_id").alias("doc_b"),
        F.col("sz").alias("sz_b"),
        F.col("rn").alias("rb"),
        "gram",
    )
    alpha_a = F.expr(
        f"({threshold_num} * sz_a + {threshold_den - 1}) DIV {threshold_den}"
    )
    # Prefix table vs full inverted index: both corpus-scaled windowed
    # frames -- shuffle_hash pin (SCALING.md round-11 rule).
    first = (
        pref.join(full.hint("shuffle_hash"), "gram")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .filter(F.col("sz_b") * F.lit(threshold_den) >= F.col("sz_a") * F.lit(threshold_num))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.min("ra").alias("ra"), F.min("rb").alias("rb"))
    )
    cands = first.filter(
        1 + F.least(F.col("sz_a") - F.col("ra"), F.col("sz_b") - F.col("rb"))
        >= alpha_a
    ).select("doc_a", "doc_b")
    ids = cands.select(
        F.explode(F.array("doc_a", "doc_b")).alias("_id")
    ).distinct()
    # ids is a density-scaled distinct aggregate (optimistic estimate);
    # keep the semi-join shuffled.
    gsub = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .join(ids.hint("shuffle_hash"), "_id", "left_semi")
        .select("_id", ngram_shingles(F.col("_text"), ngram).alias("grams"))
    )
    ga = gsub.select(F.col("_id").alias("doc_a"), F.col("grams").alias("_ga"))
    gb = gsub.select(F.col("_id").alias("doc_b"), F.col("grams").alias("_gb"))
    # Candidate pairs (post-aggregate) vs re-shingled survivors (semi-
    # joined corpus subset): both density-scaled -- keep shuffled.
    return (
        cands.join(ga.hint("shuffle_hash"), "doc_a")
        .join(gb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("_ga", "_gb")).cast("double")
                / F.size("_ga"),
                6,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= F.lit(t))
    )
