"""Python UDTF surface (Spark 4): a table function chunker must produce
exactly the relation the built-in chunk_split query computes.

The UDTF is the extensibility escape hatch (real BPE tokenizers, model
scoring); the built-in form stays the engine's hot path — this test pins
the two to the same semantics so swapping one for the other is safe.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from taxi_data_datapipeline_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@udtf(returnType="chunk_idx: int, chunk_text: string, n_tokens: long")
class ChunkSplit:
    def eval(self, text: str):  # noqa: D102
        toks = [t for t in (text or "").split() if t]
        for k in range(0, (len(toks) + 63) // 64):
            piece = toks[k * 64 : k * 64 + 64]
            yield k, " ".join(piece), len(piece)


def test_udtf_chunker_matches_builtin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spark.udtf.register("chunk_split_udtf", ChunkSplit)
    docs.createOrReplaceTempView("docs_udtf_src")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, d.source, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM docs_udtf_src d, LATERAL chunk_split_udtf(d.text) c
        """
    )
    builtin = QUERIES["chunk_split"](spark, SF)
    cols = ["doc_id", "source", "chunk_idx", "chunk_text", "n_tokens"]
    a = sorted(tuple(r) for r in via_udtf.select(*cols).collect())
    b = sorted(tuple(r) for r in builtin.select(*cols).collect())
    assert a == b and len(a) > 0
