"""Pinned fixture for BPE merge semantics on repeated-symbol runs.

Reference BPE (Sennrich et al. 2016) merges greedily left-to-right over
the SYMBOL SEQUENCE: 'aaaa' with merge (a,a) -> ['aa','aa'], 'aaa' ->
['aa','a']. A '|x|y|'->'|xy|' string replace silently under-merges runs
(consecutive matches share the boundary '|'), so both engines run the
merge as a fold; this test pins the run cases against hand-computed
expectations, on Spark and on the DuckDB oracle construction.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

CASES = [
    ("|a|a|a|a|", "|aa|aa|"),
    ("|a|a|a|", "|aa|a|"),
    ("|a|a|a|a|a|a|", "|aa|aa|aa|"),
    ("|b|a|a|c|", "|b|aa|c|"),
    ("|a|b|a|a|", "|a|b|aa|"),
    ("|a|", "|a|"),
]

SPARK_MERGE = (
    "aggregate("
    " filter(split(rep, '\\\\|'), t -> t != ''),"
    " '|',"
    " (acc, s) -> CASE WHEN s = y AND endswith(acc, concat('|', x, '|'))"
    "  THEN concat(substring(acc, 1, length(acc) - length(x) - 1), x, y, '|')"
    "  ELSE concat(acc, s, '|') END"
    ")"
)

DUCK_MERGE = (
    "list_reduce("
    " list_prepend('|', list_filter(string_split(rep, '|'), t -> t != '')),"
    " (acc, s) -> CASE WHEN s = y AND ends_with(acc, '|' || x || '|')"
    "  THEN substr(acc, 1, len(acc) - len(x) - 1) || x || y || '|'"
    "  ELSE acc || s || '|' END"
    ")"
)


def test_spark_merge_fold_is_greedy_bpe(spark):
    df = spark.createDataFrame(
        [(rep,) for rep, _ in CASES], ["rep"]
    ).select("rep", F.lit("a").alias("x"), F.lit("a").alias("y"))
    got = [r[0] for r in df.select(F.expr(SPARK_MERGE)).collect()]
    assert got == [want for _, want in CASES]


def test_duckdb_merge_fold_is_greedy_bpe():
    con = duckdb.connect()
    vals = ", ".join(f"('{rep}')" for rep, _ in CASES)
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {DUCK_MERGE} FROM (VALUES {vals}) t(rep)"
            " CROSS JOIN (SELECT 'a' AS x, 'a' AS y) b"
        ).fetchall()
    ]
    assert got == [want for _, want in CASES]


def test_multichar_symbol_merge(spark):
    # later rounds merge multi-char symbols; the tail-rewrite must remove
    # exactly the last SYMBOL, not the last character
    df = spark.createDataFrame([("|ab|ab|ab|",)], ["rep"]).select(
        "rep", F.lit("ab").alias("x"), F.lit("ab").alias("y")
    )
    got = df.select(F.expr(SPARK_MERGE)).collect()[0][0]
    # greedy left-to-right: first pair merges, lone third symbol stays
    assert got == "|abab|ab|"
    con = duckdb.connect()
    dgot = con.execute(
        f"SELECT {DUCK_MERGE} FROM (VALUES ('|ab|ab|ab|')) t(rep)"
        " CROSS JOIN (SELECT 'ab' AS x, 'ab' AS y) b"
    ).fetchall()[0][0]
    assert dgot == got


def _reference_greedy_merge(syms, x, y):
    """Plain-Python reference BPE merge: scan left-to-right, merge (x,y)
    pairs non-overlapping."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_fold_matches_reference_merge_property(spark):
    """Differential property test: the engine's fold merge must equal
    the textbook scan merge on random symbol strings (incl. repeated
    runs and multi-char symbols)."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(7)
    alphabet = ["a", "b", "ab", "ba", "aa"]
    cases = []
    for _ in range(60):
        syms = [rnd.choice(alphabet) for _ in range(rnd.randrange(0, 10))]
        x, y = rnd.choice(alphabet), rnd.choice(alphabet)
        rep = "|" + "".join(s + "|" for s in syms) if syms else "|"
        want = "|" + "".join(
            s + "|" for s in _reference_greedy_merge(syms, x, y)
        ) if syms else "|"
        cases.append((rep, x, y, want))
    df = spark.createDataFrame(cases, "rep string, x string, y string, want string")
    got = df.select(F.expr(SPARK_MERGE).alias("got"), "want", "rep", "x", "y").collect()
    for r in got:
        assert r.got == r.want, (r.rep, r.x, r.y, r.got, r.want)
