"""clear_memos(): the memo layer's cache-invalidation API.

The heavy shared builds (co-purchase pair table, LSH pairs, CF-eval
frames, ...) localCheckpoint into the unified memory pool and stay
pinned for the session's lifetime. A long-lived session that switches
datasets accumulates every dataset's blocks until executions die with
UNABLE_TO_ACQUIRE_MEMORY (observed live: the sf6 pair-table build OOMed
under the sf3 memo's residency during the round-10 scale ladder).
clear_memos() releases the blocks and the cache entries; subsequent
consumers rebuild transparently with identical results.
"""

from __future__ import annotations

from taxi_data_datapipeline_spark.queries import QUERIES, clear_memos
from taxi_data_datapipeline_spark import queries_advanced  # noqa: E402  (after the registry orchestrator — direct first import would cycle)

SF = "/root/testdata/sf0.001"


def _edge_cache_keys():
    return list(queries_advanced._EDGE_CACHE)


def test_clear_memos_releases_and_rebuilds_identically(spark):
    rows_before = QUERIES["pagerank_copurchase"](spark, SF).collect()
    assert _edge_cache_keys(), "memo should be populated after a consumer ran"

    released = clear_memos()
    assert released >= 1
    assert not _edge_cache_keys()

    # consumer rebuilds transparently, bit-identical results
    rows_after = QUERIES["pagerank_copurchase"](spark, SF).collect()
    assert sorted(map(tuple, rows_before)) == sorted(map(tuple, rows_after))


def test_clear_memos_is_selective_by_sf_dir(spark):
    QUERIES["pagerank_copurchase"](spark, SF).count()
    assert any(k[1] == SF for k in _edge_cache_keys())
    # clearing a DIFFERENT dataset's entries leaves this one resident
    assert clear_memos("/nonexistent/sf") == 0
    assert any(k[1] == SF for k in _edge_cache_keys())
    # clearing this dataset removes exactly its entries
    assert clear_memos(SF) >= 1
    assert not any(k[1] == SF for k in _edge_cache_keys())


def test_clear_memos_empty_is_noop():
    clear_memos()  # drain
    assert clear_memos() == 0


def test_clear_memos_tolerates_concurrent_pop(monkeypatch):
    """ADVICE r10: two racing clear_memos() calls — a pop of a key already
    removed between the list() snapshot and the pop must be skipped, not
    raise KeyError (and must not count as released)."""
    from taxi_data_datapipeline_spark import queries_advanced

    clear_memos()  # drain every real cache so only the shim has entries

    class RacingDict(dict):
        def pop(self, k, *default):
            dict.pop(self, k, None)  # the racing clear got here first
            return dict.pop(self, k, *default)

    racing = RacingDict({("app", SF): object()})
    monkeypatch.setattr(queries_advanced, "_EDGE_CACHE", racing)
    assert clear_memos() == 0  # the pop lost the race: skipped, no KeyError
    assert not racing
