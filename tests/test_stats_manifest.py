"""File-stats manifest + data-skipping: the manifest's min/max per file
is exact, pruning keeps exactly the overlapping files, and a pruned scan
returns the same rows as a full-scan filter (skipping is a pure
optimization)."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.sources.stats_manifest import (
    build_stats_manifest,
    prune_files,
    scan_pruned,
)


@pytest.fixture(scope="module")
def ranged_dir(spark, tmp_path_factory):
    """orders split into 8 key-ranged files (repartitionByRange + sortWithinPartitions
    => tight per-file o_orderkey min/max bands)."""
    out = str(tmp_path_factory.mktemp("ranged") / "orders")
    (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def _files(d):
    return sorted(glob.glob(os.path.join(d, "*.parquet")))


def test_manifest_minmax_exact(spark, ranged_dir):
    files = _files(ranged_dir)
    m = build_stats_manifest(spark, files, columns=["o_orderkey"]).cache()
    rows = {r["file"]: r for r in m.collect()}
    assert set(rows) == set(files)
    total = 0
    for f in files:
        got = rows[f]
        df = spark.read.parquet(f)
        lo, hi, n = df.agg(
            F.min("o_orderkey"), F.max("o_orderkey"), F.count(F.lit(1))
        ).first()
        assert int(got["min_val"]) == lo and int(got["max_val"]) == hi
        assert got["n_rows"] == n and got["null_count"] == 0
        total += n
    assert total == spark.read.parquet(ranged_dir).count()


def test_prune_keeps_exactly_overlapping_files(spark, ranged_dir):
    files = _files(ranged_dir)
    m = build_stats_manifest(spark, files, columns=["o_orderkey"]).cache()
    stats = {
        r["file"]: (int(r["min_val"]), int(r["max_val"])) for r in m.collect()
    }
    lo, hi = 100, 400
    kept = set(prune_files(m, "o_orderkey", lo, hi, cast="bigint"))
    expect = {f for f, (mn, mx) in stats.items() if mx >= lo and mn <= hi}
    assert kept == expect
    assert 0 < len(kept) < len(files)  # the test band must actually skip


def test_scan_pruned_equals_full_scan_filter(spark, ranged_dir):
    files = _files(ranged_dir)
    m = build_stats_manifest(spark, files, columns=["o_orderkey"]).cache()
    lo, hi = 100, 400
    pruned = (
        scan_pruned(spark, m, "o_orderkey", lo, hi, cast="bigint")
        .filter(F.col("o_orderkey").between(lo, hi))
    )
    full = spark.read.parquet(ranged_dir).filter(
        F.col("o_orderkey").between(lo, hi)
    )
    assert sorted(r["o_orderkey"] for r in pruned.collect()) == sorted(
        r["o_orderkey"] for r in full.collect()
    )
    # Disjoint band -> schema-stable empty result.
    empty = scan_pruned(spark, m, "o_orderkey", 10**12, None, cast="bigint")
    assert empty.count() == 0
    assert empty.schema == full.schema


def test_missing_stats_files_are_kept(spark, ranged_dir):
    files = _files(ranged_dir)
    m = build_stats_manifest(spark, files, columns=["o_orderkey"])
    # Simulate a stats-less file (e.g. written by an engine that skips
    # statistics): null min/max must be KEPT by pruning.
    m_nulled = m.withColumn(
        "min_val",
        F.when(F.col("file") == files[0], F.lit(None)).otherwise(F.col("min_val")),
    ).withColumn(
        "max_val",
        F.when(F.col("file") == files[0], F.lit(None)).otherwise(F.col("max_val")),
    )
    kept = prune_files(m_nulled, "o_orderkey", 10**12, None, cast="bigint")
    assert kept == [files[0]]


def test_refresh_is_incremental_and_drops_vanished(spark, ranged_dir):
    from taxi_data_datapipeline_spark.sources.stats_manifest import (
        refresh_stats_manifest,
    )

    files = _files(ranged_dir)
    m0 = build_stats_manifest(spark, files[:5], columns=["o_orderkey"]).cache()
    # Add 3 new files, drop 1 old: refreshed manifest covers exactly the
    # current set, and the surviving old rows are reused verbatim.
    current = files[1:]
    m1 = refresh_stats_manifest(spark, m0, current, columns=["o_orderkey"])
    got = {r["file"]: r for r in m1.collect()}
    assert set(got) == set(current)
    old = {r["file"]: r for r in m0.collect()}
    for f in files[1:5]:
        assert got[f]["min_val"] == old[f]["min_val"]
        assert got[f]["max_val"] == old[f]["max_val"]
    # No-op refresh returns the same coverage.
    m2 = refresh_stats_manifest(spark, m1, current, columns=["o_orderkey"])
    assert m2.count() == m1.count()


def test_layout_determines_skipping_power(spark, ranged_dir, tmp_path):
    """The 100 TB layout story, measured: the SAME data in a key-ranged
    layout (repartitionByRange) prunes most files for a narrow band,
    while a random (round-robin) layout prunes nothing — every file's
    min/max straddles the band. This is why compaction with sorted
    layout (operators/compact.py, Z-order keys) multiplies the
    manifest's skipping power."""
    out = str(tmp_path / "random")
    (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .repartition(8)  # round-robin: every file spans the key range
        .write.mode("overwrite")
        .parquet(out)
    )
    rnd_files = _files(out)
    rng_files = _files(ranged_dir)
    m_rnd = build_stats_manifest(spark, rnd_files, columns=["o_orderkey"])
    m_rng = build_stats_manifest(spark, rng_files, columns=["o_orderkey"])
    lo, hi = 100, 400
    kept_rnd = prune_files(m_rnd, "o_orderkey", lo, hi, cast="bigint")
    kept_rng = prune_files(m_rng, "o_orderkey", lo, hi, cast="bigint")
    assert len(kept_rnd) == len(rnd_files)  # random layout: no skipping
    assert len(kept_rng) <= len(rng_files) // 2  # ranged layout: most skipped


def test_binary_stats_recorded_absent_and_kept(spark, tmp_path):
    """Stats whose str() does not round-trip through a SQL CAST (binary
    columns) are recorded ABSENT, so range pruning on them keeps every
    file — a mangled repr literal must never cause a wrong skip."""
    from pyspark.sql import Row

    out = str(tmp_path / "bin")
    spark.createDataFrame(
        [Row(k=i, payload=bytes([i]) * 4) for i in range(100)]
    ).repartition(4).write.mode("overwrite").parquet(out)
    files = _files(out)
    m = build_stats_manifest(spark, files, columns=["payload", "k"])
    rows = m.collect()
    assert all(
        r["min_val"] is None for r in rows if r["column"] == "payload"
    )
    assert set(prune_files(m, "payload", "zzz", None)) == set(files)
    # The sibling int column in the same files still prunes normally.
    assert all(
        r["min_val"] is not None for r in rows if r["column"] == "k"
    )
