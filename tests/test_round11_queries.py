"""Property pins for the round-11 curation batch (queries_curation.py).

The DuckDB oracle gate proves cross-engine value equality; these tests pin
the SEMANTICS the oracle can't distinguish from a consistent mistake —
canonicalization rules on crafted URLs, exact substring-run lengths on a
constructed corpus, and the mixture-weight invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from taxi_data_datapipeline_spark.functions.urls import (
    canonicalize_url,
    registered_domain,
    url_host,
)
from taxi_data_datapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _canon(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(canonicalize_url(F.lit(url)).alias("c"))
        .first()["c"]
    )


class TestUrlCanonicalizer:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            # case + www + fragment + tracking + unsorted params
            (
                "https://WWW.Shop.Example.com/a/B?utm_source=x&b=2&a=1#frag",
                "https://shop.example.com/a/B?a=1&b=2",
            ),
            # default https port + trailing slash
            ("https://example.com:443/x/", "https://example.com/x"),
            # default http port strips only for http
            ("http://example.com:80/x", "http://example.com/x"),
            # NON-default port survives
            ("https://example.com:8443/x", "https://example.com:8443/x"),
            # :80 on https is NOT a default port — survives
            ("https://example.com:80/x", "https://example.com:80/x"),
            # all params tracking -> no '?' at all
            ("https://e.com/p?utm_campaign=c&ref=home&gclid=1", "https://e.com/p"),
            # path case preserved (only scheme+host fold)
            ("HTTPS://E.COM/CaseKept", "https://e.com/CaseKept"),
            # root trailing slash collapses to bare authority
            ("https://e.com/", "https://e.com"),
            # ref as a VALUE is kept; ref as a KEY is dropped
            ("https://e.com/p?q=ref&ref=q", "https://e.com/p?q=ref"),
            # '?' whose first occurrence is INSIDE the fragment is fragment
            # text, not a query string (ADVICE r11 #1: strip '#...' first)
            ("https://e.com/p#sec?x=1", "https://e.com/p"),
            # real query + a fragment that also contains '?'
            ("https://e.com/p?b=2&a=1#sec?x=9", "https://e.com/p?a=1&b=2"),
        ],
    )
    def test_rules(self, spark, raw, expected):
        assert _canon(spark, raw) == expected

    def test_idempotent(self, spark):
        once = _canon(spark, "https://WWW.A.B.com:443/x/?b=2&utm_x=1&a=1#f")
        assert _canon(spark, once) == once

    def test_host_and_domain(self, spark):
        row = (
            spark.range(1)
            .select(
                url_host(F.lit("https://WWW.Sub.Shop.Example.com:443/x")).alias("h")
            )
            .select("h", registered_domain(F.col("h")).alias("d"))
            .first()
        )
        assert row["h"] == "sub.shop.example.com"
        assert row["d"] == "example.com"


class TestSubstringDupSpans:
    def test_exact_run_length_on_constructed_corpus(self, spark, tmp_path):
        # doc 0 and doc 1 share EXACTLY one 40-char substring; doc 2
        # shares nothing >= 24 chars with either.
        shared = "X" * 10 + "ABCDEFGHIJKLMNOPQRST" + "Y" * 10
        assert len(shared) == 40
        docs = [
            (0, "aaaa" + shared + "bbbbbbbbbbbbbbbbbbbbbbbbbbbb"),
            (1, "cccccccc" + shared + "dddddddddddddddddddddddd"),
            (2, "z" * 80),
        ]
        sf = str(tmp_path)
        spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
            f"{sf}/documents.parquet"
        )
        rows = {
            (r["doc_a"], r["doc_b"]): r
            for r in QUERIES["substring_dup_spans"](spark, sf).collect()
        }
        assert set(rows) == {(0, 1)}
        r = rows[(0, 1)]
        # longest shared run detectable at K=24 is the full 40 chars:
        # max island = 40 - 24 + 1 = 17 positions -> 17 + 23 = 40.
        assert r["max_run_chars"] == 40
        assert r["n_matches"] == 17

    def test_stop_gram_cap_drops_boilerplate(self, spark, tmp_path):
        # the same 30-char string in 25 docs (> df cap 20) must produce
        # ZERO pairs — boilerplate, not duplication.
        import string

        common = "W" * 30
        # pre/suffix chars are unique PER DOC so no gram spanning the
        # boundary is shared — only the pure-W grams are, in all 25 docs.
        docs = [
            (i, string.ascii_lowercase[i] * 10 + common + string.ascii_lowercase[i] * 10)
            for i in range(25)
        ]
        sf = str(tmp_path)
        spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
            f"{sf}/documents.parquet"
        )
        assert QUERIES["substring_dup_spans"](spark, sf).count() == 0


class TestMixtureInvariants:
    def test_doremi_weights_are_a_distribution(self, spark):
        rows = QUERIES["doremi_domain_weights"](spark, SF).collect()
        total = sum(r["doremi_weight"] for r in rows)
        assert abs(total - 1.0) < 1e-4  # rounded per-source to 6 decimals
        k = len(rows)
        assert all(r["doremi_weight"] >= 0.1 / k - 1e-9 for r in rows), (
            "uniform smoothing floor violated"
        )

    def test_quality_terciles_partition_each_lang(self, spark):
        rows = QUERIES["quality_tercile_split"](spark, SF).collect()
        by_lang: dict[str, dict[int, int]] = {}
        for r in rows:
            by_lang.setdefault(r["lang"], {})[r["tercile"]] = r["n_docs"]
        for lang, cells in by_lang.items():
            assert set(cells) <= {1, 2, 3}
            n = sum(cells.values())
            # exact interpolated thresholds put each tercile within one
            # doc of n/3 unless ties collapse a boundary
            assert max(cells.values()) <= n, lang


class TestPqRecall:
    def test_recall_bounds_and_monotone_hits(self, spark):
        rows = {r["k"]: r for r in QUERIES["pq_recall_at_k"](spark, SF).collect()}
        assert set(rows) == {5, 10, 20}
        for k, r in rows.items():
            assert 0 <= r["n_hits"] <= k
            assert r["recall"] == pytest.approx(r["n_hits"] / k, abs=1e-6)
        assert rows[5]["n_hits"] <= rows[10]["n_hits"] <= rows[20]["n_hits"]
