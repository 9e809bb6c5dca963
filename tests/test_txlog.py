"""Transactional table layer (sources/txlog.py): atomicity, snapshot
isolation, time travel, OCC conflict rules, checkpoints, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.sources.txlog import (
    LOG_DIR,
    CommitConflict,
    TxTable,
)


def _mk(spark, tmp_path, interval=10) -> TxTable:
    return TxTable(spark, str(tmp_path / "tbl"), checkpoint_interval=interval)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_append_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.append(_df(spark, 0, 10))
    v1 = t.append(_df(spark, 10, 30))
    assert (v0, v1) == (0, 1)
    assert t.read(0).count() == 10          # time travel
    assert t.read(1).count() == 30
    assert t.read().count() == 30           # latest
    ids = {r.id for r in t.read(0).collect()}
    assert ids == set(range(10))


def test_overwrite_replaces_snapshot_but_preserves_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    t.overwrite(_df(spark, 100, 105))
    assert t.read().count() == 5
    assert t.read(0).count() == 10          # old snapshot still readable
    ops = [c.operation for c in t.history()]
    assert ops == ["append", "overwrite"]


def test_staged_data_invisible_until_commit(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    # simulate a crashed writer: staged files, no log entry
    t._stage(_df(spark, 500, 600))
    assert t.read().count() == 10           # reader never sees the debris
    deleted = t.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert deleted                           # debris collected
    assert t.read().count() == 10


def test_occ_append_rebases_and_overwrite_conflicts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    # writer A stages an overwrite against v0 but a concurrent append
    # (writer B) lands first: A must CONFLICT, not clobber B's rows
    victims = t.files_at()
    staged_a = t._stage(_df(spark, 100, 110))
    read_v = t.latest_version()
    t.append(_df(spark, 10, 20))  # writer B wins the race
    with pytest.raises(CommitConflict):
        t._commit(read_v, "overwrite", staged_a, victims, exact_snapshot=True)
    # blind appends rebase instead: stage against the same stale version
    staged_c = t._stage(_df(spark, 20, 25))
    v = t._commit(read_v, "append", staged_c, [])
    assert v == t.latest_version()
    assert t.read().count() == 25


def test_version_file_put_if_absent_is_atomic(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    entry = {"operation": "append", "add": [], "remove": []}
    assert t._try_publish(5, entry) is True
    assert t._try_publish(5, entry) is False  # second writer loses


def test_checkpoint_bounds_log_fold_and_matches_full_fold(spark, tmp_path):
    t = _mk(spark, tmp_path, interval=4)
    for i in range(9):
        t.append(_df(spark, i * 10, i * 10 + 10))
    cks = [
        n for n in os.listdir(os.path.join(t.dir, LOG_DIR))
        if n.endswith(".checkpoint.json")
    ]
    assert cks  # at least versions 4 and 8
    # checkpointed resolution equals folding the whole log from scratch
    ck_files = t.files_at(8)
    with open(os.path.join(t.dir, LOG_DIR, "0000000008.checkpoint.json")) as fh:
        assert sorted(json.load(fh)["files"]) == ck_files
    assert t.read(8).count() == 90


def test_compact_preserves_contents_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    t.append(_df(spark, 10, 20))
    before = {(r.id, r.v) for r in t.read().collect()}
    v = t.compact()
    assert {(r.id, r.v) for r in t.read().collect()} == before
    assert len(t.files_at(v)) == 1
    assert t.read(0).count() == 10  # pre-compaction snapshots intact
    # vacuum keeping only the tip removes the pre-compaction files
    t.vacuum(retain_versions=1, min_age_seconds=0.0)
    assert {(r.id, r.v) for r in t.read().collect()} == before


def test_vacuum_keeps_retained_versions_readable(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    t.overwrite(_df(spark, 50, 55))
    t.append(_df(spark, 55, 60))
    t.vacuum(retain_versions=2, min_age_seconds=0.0)
    assert t.read(1).count() == 5    # within horizon
    assert t.read(2).count() == 10
    with pytest.raises(Exception):
        t.read(0).collect()          # vacuumed away


def test_txsink_replay_is_noop_and_watermark_survives_checkpoint(spark, tmp_path):
    from taxi_data_datapipeline_spark.sources.txlog import TxSink

    t = _mk(spark, tmp_path, interval=2)
    sink = TxSink(t, app_id="app1")
    assert sink.last_committed_batch() == -1
    assert sink.append_batch(_df(spark, 0, 10), 0) == 0
    assert sink.append_batch(_df(spark, 10, 20), 1) == 1
    assert t.read().count() == 20
    # replays of already-committed batches commit nothing
    assert sink.append_batch(_df(spark, 0, 10), 0) is None
    assert sink.append_batch(_df(spark, 10, 20), 1) is None
    assert t.read().count() == 20
    # a second app's batches are independent
    sink2 = TxSink(t, app_id="app2")
    assert sink2.last_committed_batch() == -1
    assert sink2.append_batch(_df(spark, 20, 25), 0) is not None
    assert t.read().count() == 25
    # the high-water mark folds correctly past a checkpointed prefix
    assert sink.last_committed_batch() == 1


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    from taxi_data_datapipeline_spark.sources.txlog import merge_upsert

    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))  # v = id*2
    src = spark.range(5, 15).select(
        F.col("id"), (F.col("id") * 100).alias("v")
    )
    v = merge_upsert(t, src, ["id"])
    got = {r.id: r.v for r in t.read().collect()}
    assert len(got) == 15
    for i in range(0, 5):
        assert got[i] == i * 2      # untouched
    for i in range(5, 15):
        assert got[i] == i * 100    # updated / inserted
    assert t.read(0).count() == 10  # pre-merge snapshot intact
    assert t.history()[v].operation == "merge"


def test_append_rejects_schema_drift(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    drifted = spark.range(0, 5).select(
        F.col("id"), F.col("id").cast("string").alias("v")  # v: long -> string
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(drifted)
    # overwrite is the explicit evolution path: allowed
    t.overwrite(drifted)
    assert dict(t.read().dtypes)["v"] == "string"


def test_compact_zorder_preserves_contents_and_tiles_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 500))
    t.append(_df(spark, 500, 1000))
    before = {(r.id, r.v) for r in t.read().collect()}
    v = t.compact(zorder_cols=["id", "v"], n_files=4)
    assert {(r.id, r.v) for r in t.read().collect()} == before
    files = t.files_at(v)
    assert len(files) == 4
    # each z-ordered file covers a bounded id range (tile property)
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        tbl = pq.read_table(os.path.join(t.dir, f), columns=["id"])
        ids = tbl.column("id").to_pylist()
        spans.append(max(ids) - min(ids))
    assert sum(spans) / len(spans) < 1000 * 0.75  # tighter than one global span


def test_delete_where_and_physical_erasure(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 100))
    v = t.delete_where(F.col("id") % 10 == 3)
    ids = {r.id for r in t.read().collect()}
    assert len(ids) == 90 and not any(i % 10 == 3 for i in ids)
    assert t.history()[v].operation == "delete"
    # rows survive in the old snapshot until vacuum (audit window) ...
    assert t.read(0).count() == 100
    # ... and physical erasure is delete + vacuum
    t.vacuum(retain_versions=1, min_age_seconds=0.0)
    import pyarrow.parquet as pq

    remaining = set()
    for f in t.files_at():
        remaining.update(
            pq.read_table(os.path.join(t.dir, f), columns=["id"])
            .column("id").to_pylist()
        )
    assert not any(i % 10 == 3 for i in remaining)
    # no other data files exist on disk anymore
    on_disk = []
    for root, _dirs, names in os.walk(t.dir):
        on_disk += [n for n in names if n.endswith(".parquet")]
    assert len(on_disk) == len(t.files_at())


def test_snapshot_stats_manifest_prunes_files(spark, tmp_path):
    """A txlog snapshot composes with the stats-manifest data-skipping
    layer: each committed batch covers a disjoint id range, so a range
    predicate should scan a strict subset of the snapshot's files and
    still return exactly the right rows."""
    from taxi_data_datapipeline_spark.sources.stats_manifest import (
        build_stats_manifest,
        prune_files,
    )

    t = _mk(spark, tmp_path)
    for i in range(5):
        t.append(
            spark.range(i * 100, (i + 1) * 100)
            .coalesce(1)
            .select(F.col("id"), (F.col("id") * 2).alias("v"))
        )
    files = [os.path.join(t.dir, f) for f in t.files_at()]
    manifest = build_stats_manifest(spark, files, columns=["id"])
    surviving = prune_files(manifest, "id", lo=120, hi=180, cast="bigint")
    assert len(surviving) < len(files)
    got = (
        spark.read.parquet(*surviving)
        .filter((F.col("id") >= 120) & (F.col("id") <= 180))
        .count()
    )
    assert got == 61

def test_vacuum_age_guard_protects_inflight_stage(spark, tmp_path):
    """A writer stages data BEFORE publishing its log entry; vacuum's
    retention-age guard must not delete those fresh unreferenced files
    (deleting them would let the writer commit a log entry pointing at
    missing files — table corruption under multi-writer OCC)."""
    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    staged = t._stage(_df(spark, 100, 110))  # in-flight writer, not yet published
    assert t.vacuum(retain_versions=1) == []  # default min_age: skipped
    # the in-flight writer can still publish safely
    v = t._commit(t.latest_version(), "append", staged, [])
    assert t.read(v).count() == 20
    # once committed the files are referenced; an aged vacuum keeps them too
    assert t.vacuum(retain_versions=1, min_age_seconds=0.0) == []
    assert t.read().count() == 20


def test_txsink_rechecks_watermark_on_commit_retry(spark, tmp_path, monkeypatch):
    """Two concurrent re-deliveries of the same (app, batch) can both pass
    the entry check; the OCC loop must re-read txn_state on every retry so
    the loser returns None instead of committing the batch twice."""
    from taxi_data_datapipeline_spark.sources.txlog import TxSink

    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    sink = TxSink(t, app_id="app1")
    orig = t._try_publish
    raced = {"done": False}

    def racing_publish(version, entry):
        # interleave the rival's commit of the SAME batch just before our
        # first publish attempt — the classic lost-race window
        if not raced["done"] and entry.get("txn"):
            raced["done"] = True
            assert orig(version, {"operation": "append", "add": [],
                                  "remove": [],
                                  "txn": {"app": "app1", "batch": 0}})
        return orig(version, entry)

    monkeypatch.setattr(t, "_try_publish", racing_publish)
    assert sink.append_batch(_df(spark, 0, 10), 0) is None  # loser backs off
    monkeypatch.setattr(t, "_try_publish", orig)
    assert t.read().count() == 10  # rival's empty commit, no double rows
    assert sink.last_committed_batch() == 0


def test_txsink_rejects_schema_drift(spark, tmp_path):
    from taxi_data_datapipeline_spark.sources.txlog import TxSink

    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 10))
    sink = TxSink(t, app_id="app1")
    drifted = spark.range(0, 5).select(
        F.col("id"), F.col("id").cast("string").alias("v")
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        sink.append_batch(drifted, 0)
    assert t.read().count() == 10


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE WHERE removes only rows where the predicate is TRUE;
    NULL-predicate rows must be kept, not silently erased."""
    t = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "x"), (4, None)], "id bigint, s string"
    )
    t.append(df)
    t.delete_where(F.col("s") == "x")
    got = sorted(r.id for r in t.read().collect())
    assert got == [1, 2, 4]  # NULL-s rows survive


def test_concurrent_blind_appends_all_land_exactly_once(spark, tmp_path):
    """Real multi-writer OCC: 8 threads race blind appends through the
    same table directory. The O_EXCL publish plus rebase must land every
    append exactly once — no lost commits, no duplicated rows, contiguous
    version numbers."""
    from concurrent.futures import ThreadPoolExecutor

    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 1))  # v0

    def writer(i: int) -> int:
        lo = 1000 * (i + 1)
        return t.append(_df(spark, lo, lo + 10))

    with ThreadPoolExecutor(max_workers=8) as ex:
        versions = list(ex.map(writer, range(8)))
    assert sorted(versions) == list(range(1, 9))  # contiguous, no gaps
    assert t.latest_version() == 8
    ids = sorted(r.id for r in t.read().collect())
    expect = [0] + [x for i in range(8) for x in range(1000 * (i + 1), 1000 * (i + 1) + 10)]
    assert ids == sorted(expect)


def test_concurrent_txsink_same_batch_single_commit(spark, tmp_path):
    """Real duplicate-delivery race: 6 threads all try to commit the SAME
    (app, batch). Exactly one version may carry the batch's rows; the
    rest must return None (the per-retry txn re-validation closes the
    window the initial check leaves open)."""
    from concurrent.futures import ThreadPoolExecutor

    from taxi_data_datapipeline_spark.sources.txlog import TxSink

    t = _mk(spark, tmp_path)
    t.append(_df(spark, 0, 5))
    sink = TxSink(t, app_id="dup_app")

    def deliver(_i: int):
        return sink.append_batch(_df(spark, 100, 110), 7)

    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(deliver, range(6)))
    committed = [r for r in results if r is not None]
    assert len(committed) == 1  # exactly-once under real concurrency
    assert t.read().count() == 15  # 5 base + one 10-row batch
    assert sink.last_committed_batch() == 7
