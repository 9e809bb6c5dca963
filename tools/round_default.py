"""Single source of truth for the current round number (VERDICT r11 wrong #1).

bench.py, tools/pivot_throughput.py, tools/skew_probe.py and
tools/quiet_hunter.py each carried their own ``os.environ.get(
"SPARK_GRAFT_ROUND", "<literal>")`` default, and the literals went stale
independently: the external driver does not set the env var, so its
round-11 bench run defaulted to "10" and wrote its snapshot into round
10's slots (``bench_detail_r10_rerun3.json``), mislabeling
``BENCH_r11.json``'s ``round_best_wall`` as round 10's best.  ADVICE r11
additionally flagged that bench.py ("10") and quiet_hunter.py ("11")
disagreed with each other in the same working tree.

Resolution order:

1. ``SPARK_GRAFT_ROUND`` env var, when set (manual runs keep full control);
2. the committed ``ROUND`` marker file at the repo root — static for the
   whole round, so the driver's unparameterized end-of-round bench run
   lands in the right slots regardless of whether the driver materializes
   ``CORRECTNESS_r{N}.json`` before or after it runs bench;
3. newest ``CORRECTNESS_r*.json`` round + 1 (during round N the newest
   correctness file on disk is round N-1's).

``tests/test_bench_guard.py`` lints that the marker equals the
newest-correctness-derived value, so forgetting to bump ``ROUND`` at a
round boundary fails the suite instead of silently mislabeling artifacts.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_correctness_round(repo: str = REPO) -> int | None:
    """Largest N among CORRECTNESS_r{N}.json files at the repo root."""
    rounds = []
    for name in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) if rounds else None


def marker_round(repo: str = REPO) -> str | None:
    """Contents of the committed ROUND marker file, if present and sane."""
    path = os.path.join(repo, "ROUND")
    try:
        with open(path) as f:
            text = f.read().strip()
    except OSError:
        return None
    return text if re.fullmatch(r"\d+", text) else None


def current_round(repo: str = REPO) -> str:
    """The round label every tool should stamp artifacts with."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return env
    marker = marker_round(repo)
    if marker is not None:
        return marker
    newest = newest_correctness_round(repo)
    return str(newest + 1) if newest is not None else "1"
