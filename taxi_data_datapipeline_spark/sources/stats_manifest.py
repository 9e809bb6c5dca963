"""File-level statistics manifest + data-skipping scans.

Parquet's own row-group min/max pruning only engages AFTER a file's
footer is opened; at 100 TB with millions of files the expensive part is
opening footers at all. Lakehouse formats (Delta, Iceberg, Hudi) solve
this with a file-stats manifest consulted BEFORE the scan — this module
is that layer for plain parquet directories:

* ``build_stats_manifest`` reads every file's footer ONCE — distributed
  (the file list is parallelized and footers are read executor-side with
  pyarrow, so building the manifest for a million files is itself a
  Spark job, not a driver loop) — and emits one row per (file, column)
  with row counts and min/max/null-count aggregated across row groups.
* ``prune_files`` evaluates a [lo, hi] range predicate against the
  manifest and returns only the files whose stats overlap — the same
  conservative overlap test Delta uses (a file with missing stats for
  the column is kept, never silently skipped).
* ``scan_pruned`` ties it together: manifest -> overlapping files ->
  ``spark.read.parquet(*files)``, so Catalyst still applies row-group
  pruning and predicate pushdown WITHIN the surviving files.

The manifest is an ordinary DataFrame: persist it as parquet next to
the dataset and refresh incrementally on ingest (append new files'
rows), exactly like a lakehouse transaction log's stats section.

Stats are stored as strings with a type tag (parquet logical types
vary per file) and compared after casting both sides, so one manifest
schema serves every column type; comparisons for unsupported/absent
stats fall back to "keep the file" (conservative).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "file string, n_rows long, n_row_groups int, column string,"
    " dtype string, min_val string, max_val string, null_count long"
)


def _footer_stats(paths: pd.Series, columns: list[str] | None) -> pd.DataFrame:
    import pyarrow.parquet as pq

    recs: list[tuple] = []
    for path in paths:
        pf = pq.ParquetFile(path)
        md = pf.metadata
        schema = pf.schema_arrow
        want = columns if columns is not None else [f.name for f in schema]
        per_col: dict[str, dict] = {
            c: {"min": None, "max": None, "nulls": 0, "ok": True} for c in want
        }
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in per_col:
                    continue
                acc = per_col[name]
                st = col.statistics
                if st is None or not st.has_min_max:
                    acc["ok"] = False
                    continue
                acc["nulls"] += st.null_count or 0
                if acc["min"] is None or st.min < acc["min"]:
                    acc["min"] = st.min
                if acc["max"] is None or st.max > acc["max"]:
                    acc["max"] = st.max
        for name, acc in per_col.items():
            try:
                dtype = str(schema.field(name).type)
            except KeyError:
                continue
            ok = acc["ok"] and acc["min"] is not None
            # Only stats whose str() round-trips through a SQL CAST are
            # trustworthy (numbers, strings, dates/timestamps, bools).
            # bytes and other exotic stats stringify as repr garbage —
            # record them as ABSENT so pruning conservatively keeps the
            # file instead of comparing a mangled literal (which could
            # WRONGLY skip it).
            if ok and not isinstance(
                acc["min"], (int, float, str, bool)
            ) and not type(acc["min"]).__module__ == "datetime":
                ok = False
            recs.append(
                (
                    path,
                    md.num_rows,
                    md.num_row_groups,
                    name,
                    dtype,
                    str(acc["min"]) if ok else None,
                    str(acc["max"]) if ok else None,
                    int(acc["nulls"]) if ok else None,
                )
            )
    return pd.DataFrame(
        recs,
        columns=[
            "file", "n_rows", "n_row_groups", "column",
            "dtype", "min_val", "max_val", "null_count",
        ],
    )


def build_stats_manifest(
    spark: SparkSession, files: list[str], columns: list[str] | None = None
) -> DataFrame:
    """One manifest row per (file, column): n_rows, row groups, min/max/
    null-count folded across row groups. Footer reads run executor-side
    (mapInPandas over the parallelized file list) — the manifest build
    scales with the cluster, not the driver."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _footer_stats(pdf["file"], columns)

    paths = spark.createDataFrame([(f,) for f in files], "file string")
    n_part = min(len(files), spark.sparkContext.defaultParallelism) or 1
    return paths.repartition(n_part).mapInPandas(fn, MANIFEST_SCHEMA)


def refresh_stats_manifest(
    spark: SparkSession,
    manifest: DataFrame,
    files: list[str],
    columns: list[str] | None = None,
) -> DataFrame:
    """Incremental ingest refresh: footer-read ONLY the files not already
    in the manifest and union their rows in; rows for files that
    disappeared from ``files`` are dropped (compaction/vacuum). The
    common case — N new files against a million-row manifest — costs N
    footer reads and an anti-join, never a rescan, which is exactly the
    property that makes a stats manifest viable at ingest frequency."""
    current = set(files)
    known = {
        r["file"] for r in manifest.select("file").distinct().collect()
    }
    fresh = sorted(current - known)
    # Semi-join against the current file list instead of a giant isin()
    # expression — at 10^6 files an IN-list blows the expression tree;
    # a broadcast-able one-column join does not.
    cur_df = manifest.sparkSession.createDataFrame(
        [(f,) for f in sorted(current)], "file string"
    )
    kept = manifest.join(F.broadcast(cur_df), "file", "left_semi")
    if not fresh:
        return kept
    return kept.unionByName(build_stats_manifest(spark, fresh, columns))


def prune_files(
    manifest: DataFrame, column: str, lo=None, hi=None, cast: str = "string"
) -> list[str]:
    """Files whose [min, max] for ``column`` overlaps [lo, hi] (either
    bound may be None = unbounded). Files with missing stats for the
    column are KEPT — skipping is only ever an optimization, never a
    correctness decision. ``cast`` is the comparison type (e.g. 'bigint',
    'date', 'timestamp', 'double'); stats and bounds are both cast so
    string-encoded stats compare in the column's own order."""
    m = manifest.filter(F.col("column") == column)
    mn = F.col("min_val").cast(cast)
    mx = F.col("max_val").cast(cast)
    keep = F.col("min_val").isNull() | F.col("max_val").isNull()
    overlap = F.lit(True)
    if lo is not None:
        overlap = overlap & (mx >= F.lit(lo).cast(cast))
    if hi is not None:
        overlap = overlap & (mn <= F.lit(hi).cast(cast))
    kept = m.filter(keep | overlap).select("file").distinct()
    return [r["file"] for r in kept.collect()]


def scan_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    column: str,
    lo=None,
    hi=None,
    cast: str = "string",
) -> DataFrame:
    """Read only the files the manifest says can contain rows with
    ``column`` in [lo, hi]. Returns an empty DataFrame with the full
    schema (derived from one kept-or-any file) when nothing overlaps.
    Catalyst's row-group pruning still applies inside surviving files —
    this layer only removes the footer-open cost of files that cannot
    match."""
    kept = prune_files(manifest, column, lo, hi, cast)
    if kept:
        return spark.read.parquet(*kept)
    all_files = [r["file"] for r in manifest.select("file").distinct().collect()]
    return spark.read.parquet(all_files[0]).limit(0)
