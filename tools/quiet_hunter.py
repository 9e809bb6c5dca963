"""Detached quiet-window hunter (VERDICT r10 missing #2 / next-round #3).

Rounds 9 and 10 had ZERO quiet host windows across ~11 h of manual
watching, so the record-grade numbers are three rounds stale. Manual
polling cannot catch a window that opens while the operator is busy;
this loop can. It polls the single/parallel probe pair every POLL_SEC,
appends every sample to ``bench_history/probe_watch_r{round}.log``
(same line format as the manual watch logs, timestamp-prefixed), and on
CONSECUTIVE_QUIET quiet verdicts in a row fires, in order:

1. the full sf0.1 bench suite (``bench.py`` — probes bracket every pass,
   so a burst that starts mid-run is still detected and labeled), then
2. FLAGSHIP_SAMPLES flagship throughput runs (``tools/pivot_throughput.py``
   — each persists its own probe-bracketed artifact at the first free
   ``bench_history/flagship_r{round}_{i}.json`` slot).

While a firing is in progress the lockfile
``/tmp/spark_graft_quiet_hunt.lock`` exists — the interactive session
checks it before launching heavy work so a record attempt is never
self-polluted (the round-10 postmortem: a concurrent explain-job
inflated ladder walls 7x). Firing output goes to
``bench_history/quiet_fire_r{round}_{n}.log``.

Stops after MAX_FIRES firings, or when ``/tmp/spark_graft_quiet_hunt.stop``
appears (checked every poll), so an end-of-round cleanup is one ``touch``.

Usage (ALWAYS detached — the Bash tool kills backgrounded children at
its timeout cap):

    cd /root/repo && setsid nohup python tools/quiet_hunter.py \
        > /tmp/quiet_hunter.out 2>&1 &
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.host_probe import parallel_ms, single_ms  # noqa: E402
from tools.probe_thresholds import quiet_verdict  # noqa: E402
from tools.round_default import current_round  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = "/tmp/spark_graft_quiet_hunt.lock"
STOP = "/tmp/spark_graft_quiet_hunt.stop"
POLL_SEC = float(os.environ.get("QUIET_HUNT_POLL_SEC", "75"))
CONSECUTIVE_QUIET = int(os.environ.get("QUIET_HUNT_CONSECUTIVE", "2"))
MAX_FIRES = int(os.environ.get("QUIET_HUNT_MAX_FIRES", "2"))
FLAGSHIP_SAMPLES = int(os.environ.get("QUIET_HUNT_FLAGSHIPS", "3"))
ROUND = current_round()


def _log_path() -> str:
    hist = os.path.join(REPO, "bench_history")
    os.makedirs(hist, exist_ok=True)
    return os.path.join(hist, f"probe_watch_r{ROUND}.log")


def _sample() -> tuple[float, float, str]:
    s, p = single_ms(), parallel_ms()
    verdict = quiet_verdict(s, p)
    ts = datetime.datetime.now().strftime("%H:%M:%S")
    line = (f"{ts} single {s:6.1f} ms | parallel(8) {p:6.1f} ms | "
            f"loadavg {os.getloadavg()[0]:5.2f} | {verdict}")
    with open(_log_path(), "a") as f:
        f.write(line + "\n")
    print(line, flush=True)
    return s, p, verdict


def _fire(n: int) -> None:
    fire_log = os.path.join(REPO, "bench_history", f"quiet_fire_r{ROUND}_{n}.log")
    env = dict(os.environ, SPARK_GRAFT_ROUND=ROUND)
    cmds = [[sys.executable, os.path.join(REPO, "bench.py")]]
    cmds += [[sys.executable, os.path.join(REPO, "tools", "pivot_throughput.py")]
             for _ in range(FLAGSHIP_SAMPLES)]
    with open(LOCK, "w") as f:
        f.write(f"fire {n} started {datetime.datetime.now().isoformat()}\n")
    try:
        with open(fire_log, "a") as out:
            for cmd in cmds:
                out.write(f"\n=== {' '.join(cmd)} @ "
                          f"{datetime.datetime.now().isoformat()} ===\n")
                out.flush()
                subprocess.run(cmd, cwd=REPO, env=env, stdout=out,
                               stderr=subprocess.STDOUT, timeout=3600)
    finally:
        os.unlink(LOCK)


def main() -> None:
    streak, fires = 0, 0
    print(f"quiet_hunter up: poll {POLL_SEC}s, need {CONSECUTIVE_QUIET} "
          f"consecutive QUIET, max {MAX_FIRES} fires, round {ROUND}",
          flush=True)
    while fires < MAX_FIRES:
        if os.path.exists(STOP):
            print("stop file seen; exiting", flush=True)
            return
        _, _, verdict = _sample()
        streak = streak + 1 if verdict == "QUIET" else 0
        if streak >= CONSECUTIVE_QUIET:
            fires += 1
            streak = 0
            print(f"QUIET window confirmed — firing #{fires}", flush=True)
            try:
                _fire(fires)
            except Exception as exc:  # keep hunting even if a fire breaks
                print(f"fire #{fires} failed: {exc!r}", flush=True)
        time.sleep(POLL_SEC)
    print(f"max fires ({MAX_FIRES}) reached; exiting", flush=True)


if __name__ == "__main__":
    main()
