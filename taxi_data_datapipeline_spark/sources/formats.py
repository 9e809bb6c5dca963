"""CSV / ORC / raw-text sources and sinks with the engine's bad-record
posture.

The reference reads parquet only; a complete engine also meets feeds
where they arrive. Conventions shared with the JSONL source
(sources/jsonl.py):

* **Declared schema, never inference** — schema inference over 100 TB is
  an extra full pass whose result depends on which files the sampler
  read. Every reader here takes an explicit ``StructType``.
* **PERMISSIVE + corrupt capture** — malformed lines land whole in
  ``_corrupt_record`` so the pipeline can quarantine and count instead
  of dying mid-scan (reference bad-record posture,
  ``pivot_all_files.py:145-150``).
* **Splittability is the scale lever** — uncompressed / bzip2 / zstd
  (seekable) CSV splits by byte range; a single gzip member does NOT
  (one task per file, the unsplittable-input hazard the round-robin
  fan-out in queries.py exists for). ORC and parquet split at stripe /
  row-group granularity regardless of compression — preferred at rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    mode: str = "PERMISSIVE",
    **options: str,
) -> DataFrame:
    """CSV scan with declared schema and corrupt-line capture. Extra
    reader options (sep, quote, timestampFormat, ...) pass through."""
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    reader = (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, compression: str = "none"
) -> None:
    """CSV sink. ``compression='gzip'`` produces UNSPLITTABLE files —
    acceptable for export, wrong for re-ingestion at scale (use 'none'
    or write ORC/parquet instead).

    Spark's CSV WRITER trims leading/trailing whitespace by default
    (``ignoreLeadingWhiteSpace``/``ignoreTrailingWhiteSpace`` default
    true on write, unlike read) — silent data corruption for padded
    strings. Both are pinned false here so the sink is value-faithful
    (tests/test_formats.py::test_csv_roundtrip_hostile_strings)."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("compression", compression)
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC scan (schema comes from file metadata, like parquet; stripe-
    granular splits, predicate pushdown and column pruning apply)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zlib") -> None:
    """ORC sink.

    Known fidelity hole in the underlying Spark/ORC writer (pinned by
    ``tests/test_formats.py::test_orc_pre_epoch_boundary_microsecond``):
    timestamps in the LAST SECOND BEFORE THE EPOCH — (1969-12-31
    23:59:59.000000, 1970-01-01 00:00:00) exclusive of the whole second
    — come back shifted +1 s (the writer truncates seconds toward zero,
    so the -1 s borrow for the fractional part is lost exactly when the
    truncated value is 0). Every other pre-epoch fractional timestamp
    round-trips correctly, and parquet is unaffected — route pre-1970
    sub-second data through parquet."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .orc(path)
    )


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Raw line source (column ``value: string``) — the substrate for
    custom parsers. ``whole=True`` yields one row per FILE, which is the
    unsplittable mode: only for small sidecar files, never the corpus."""
    return spark.read.text(path, wholetext=whole)


def read_xml(
    spark: SparkSession, path: str, schema: StructType, row_tag: str, **options: str
) -> DataFrame:
    """XML scan (Spark 4 built-in datasource) with a DECLARED schema —
    same posture as read_csv: schema inference over XML is an extra
    full pass AND type-guessy (everything is text in XML; only the
    declared schema says '42' is a bigint, not a string). Row elements
    are matched by ``row_tag``; files split at row boundaries, so large
    documents scan in parallel like any text format."""
    reader = spark.read.format("xml").schema(schema).option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str, **options: str) -> None:
    """XML sink. Nulls are written as ABSENT elements (the reader's
    declared schema restores them as NULL); special characters are
    entity-escaped by the writer, so text round-trips losslessly."""
    writer = df.write.mode("overwrite").format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
