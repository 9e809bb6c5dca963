"""Pins for tools/lineage_report.py's memo-provenance labeling (ADVICE r9):
the builder match must be against code-object name tables, not source text,
so a docstring/comment mention can't mislabel a query's lineage; and the
hard-coded MEMO_SOURCES table/column notes must track the builders' actual
load() calls."""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "lineage_report", os.path.join(REPO, "tools", "lineage_report.py")
)
lineage_report = importlib.util.module_from_spec(spec)
spec.loader.exec_module(lineage_report)


def test_docstring_mention_does_not_label_provenance():
    def mentions_only(spark, sf_dir):
        """This docstring mentions _cf_eval_frames( but never calls it."""
        # comment mentioning _copurchase_pair_counts( either
        return None

    assert lineage_report.memo_note(mentions_only) is None


def test_real_call_labels_provenance_including_nested():
    def calls_directly(spark, sf_dir):
        return _cf_eval_frames(spark, sf_dir)  # noqa: F821

    def calls_nested(spark, sf_dir):
        def inner():
            return _copurchase_pair_counts(spark, sf_dir)  # noqa: F821

        return inner()

    assert "cf_eval_frames" in lineage_report.memo_note(calls_directly)
    assert "copurchase_pair_counts" in lineage_report.memo_note(calls_nested)


def test_memo_sources_track_builder_load_calls():
    """Every table named in a MEMO_SOURCES note must still be load()ed by
    the builder it describes (gross-drift guard: a builder rewritten to
    read different tables would silently falsify the lineage note)."""
    import inspect

    from taxi_data_datapipeline_spark.queries_advanced import (
        _copurchase_pair_counts,
    )
    from taxi_data_datapipeline_spark.queries_stats import _cf_eval_frames

    builders = {
        "_cf_eval_frames": _cf_eval_frames,
        "_copurchase_pair_counts": _copurchase_pair_counts,
        # the edge builders derive from the pair-count memo
        "_copurchase_edges": _copurchase_pair_counts,
        "_copurchase_edges_support": _copurchase_pair_counts,
    }
    for key, note in lineage_report.MEMO_SOURCES.items():
        fn = builders[key]
        src = inspect.getsource(fn)
        loaded = set(re.findall(r'load\(spark,\s*sf_dir,\s*"(\w+)"', src))
        # _cf_eval_frames reaches lineitem via the pair-count memo builder
        loaded |= set(
            re.findall(
                r'load\(spark,\s*sf_dir,\s*"(\w+)"',
                inspect.getsource(_copurchase_pair_counts),
            )
        ) if "_copurchase" in inspect.getsource(fn) or key == "_cf_eval_frames" else set()
        noted_tables = set(re.findall(r"(\w+)\(", note.split(":", 1)[1]))
        missing = noted_tables - loaded
        assert not missing, f"{key}: note claims {missing} never load()ed"
