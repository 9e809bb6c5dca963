"""Pins for bench.py's reporting guards (no Spark needed).

1. probe_verdict: the published JSON must self-label contention so a
   reader never recomputes the convergence gate's thresholds from the raw
   probe arrays (VERDICT r8 wrong #2 — the r8 artifact was produced at
   loadavg 29-32 and nothing in the JSON said so explicitly).
2. snapshot_path: a slower rerun must never clobber a round's committed
   record detail (ADVICE r8 medium — a 132.5 s degraded-host rerun
   overwrote the 72.5 s r8 record snapshot, destroying the per-query
   detail behind the published record).
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import probe_verdict_for, snapshot_path


class TestProbeVerdict:
    def test_quiet_host(self):
        # Fastest pass bracketed by ~10 ms single / ~13 ms parallel probes.
        assert probe_verdict_for(
            [80.0, 72.5], [10.5, 10.8, 10.2, 10.6], [13.0, 13.5, 12.8, 13.1]
        ) == "QUIET"

    def test_degraded_multicore_is_noisy(self):
        # Healthy single probes, 3x-degraded parallel probes — the r8
        # regime the lone-thread probe was blind to.
        assert probe_verdict_for(
            [80.0, 72.5], [10.5, 10.8, 10.2, 10.6], [30.0, 33.5, 31.8, 35.1]
        ) == "NOISY"

    def test_slow_single_probe_is_noisy(self):
        assert probe_verdict_for(
            [72.5], [15.0, 16.0], [18.0, 19.0]
        ) == "NOISY"

    def test_fastest_pass_on_quiet_bracket_wins(self):
        # Pass 0 contended, pass 1 quiet and fastest: verdict follows the
        # REPORTED pass, not the worst pass.
        assert probe_verdict_for(
            [130.0, 72.5], [11.0, 30.0, 10.2, 10.6], [14.0, 60.0, 12.8, 13.1]
        ) == "QUIET"

    def test_fastest_pass_on_noisy_bracket_loses(self):
        # The fastest wall itself ran between degraded probes.
        assert probe_verdict_for(
            [95.0, 90.0], [10.2, 10.6, 11.0, 14.5], [13.0, 13.1, 14.0, 40.0]
        ) == "NOISY"


class TestSnapshotGuard:
    def _write(self, path, wall):
        with open(path, "w") as f:
            json.dump({"value": wall, "queries": {}}, f)

    def test_first_write_takes_round_slot(self, tmp_path):
        p = snapshot_path(str(tmp_path), "9", 75.0, force=False)
        assert p.endswith("bench_detail_r9.json")

    def test_faster_wall_replaces_record(self, tmp_path):
        self._write(tmp_path / "bench_detail_r9.json", 75.0)
        p = snapshot_path(str(tmp_path), "9", 70.0, force=False)
        assert p.endswith("bench_detail_r9.json")

    def test_slower_wall_diverts_to_rerun(self, tmp_path):
        self._write(tmp_path / "bench_detail_r9.json", 72.5)
        p = snapshot_path(str(tmp_path), "9", 132.5, force=False)
        assert p.endswith("bench_detail_r9_rerun.json")

    def test_force_overrides(self, tmp_path):
        self._write(tmp_path / "bench_detail_r9.json", 72.5)
        p = snapshot_path(str(tmp_path), "9", 132.5, force=True)
        assert p.endswith("bench_detail_r9.json")

    def test_corrupt_existing_snapshot_is_not_overwritten(self, tmp_path):
        # Unreadable record: treat its wall as unknown-best (inf) so the
        # new run still lands in the round slot only if nothing readable
        # is lost — prev_wall=inf means any wall replaces it.
        (tmp_path / "bench_detail_r9.json").write_text("{corrupt")
        p = snapshot_path(str(tmp_path), "9", 100.0, force=False)
        assert p.endswith("bench_detail_r9.json")
