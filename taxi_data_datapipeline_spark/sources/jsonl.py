"""JSON-lines source with bad-record quarantine.

Crawl/event feeds arrive as JSONL with a long tail of malformed lines.
The reference's bad-record posture (coerce -> count -> keep going,
``pivot_all_files.py:145-150``) maps to Spark's PERMISSIVE parse mode:
schema-conforming fields parse, malformed lines land whole in a corrupt
column, and the pipeline decides — quarantine, count, or fail.

The declared schema is mandatory: schema inference over 100 TB of JSONL
is a full extra pass AND makes the result depend on whichever files the
sampler saw. Declared schema + corrupt-capture is both faster and
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL at ``path`` with ``schema``; malformed lines are captured
    whole in ``_corrupt_record`` (PERMISSIVE) or dropped (DROPMALFORMED)."""
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantined_raw_lines).

    Spark refuses to filter on ONLY the corrupt column of a lazy JSON scan
    (the parser would need re-running with different required columns), so
    the split goes through a cached projection — one parse, both outputs.
    """
    cached = df.cache()
    good = cached.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = cached.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
