"""Host health probe: is this a quiet window worth benching in?

This container shares its kernel with other tenants whose CPU bursts do
NOT show in the container's loadavg and do NOT slow a lone-thread CPU
probe when they land on other cores — yet they inflate 12-way suite
walls 1.4-3x (round-8 observation: loadavg 0.06, single probe 10 ms,
parallel probe 30 ms = ~3x multicore degradation, suite walls 1.75x the
record). Sample BOTH probes before trusting any wall-clock record run:

* single ~10-11 ms AND parallel within ~1.5x single -> quiet, bench away
* single healthy but parallel 2x+ single -> neighbors bursting on other
  cores; records taken now are noise

bench.py runs the same pair around every pass (cpu_probe_ms /
cpu_probe_par_ms) and gates convergence on both.

Usage: python tools/host_probe.py [n_trials]
"""

from __future__ import annotations

import hashlib
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.probe_thresholds import quiet_verdict  # noqa: E402


def single_ms() -> float:
    buf = b"\x5a" * 4096
    t0 = time.perf_counter()
    for _ in range(3000):
        buf = hashlib.sha256(buf).digest() * 128
    return round((time.perf_counter() - t0) * 1000, 1)


def parallel_ms(threads: int = 8) -> float:
    def work():
        buf = b"\x5a" * 262144
        for _ in range(60):
            buf = hashlib.sha256(buf).digest() * 8192
    ts = [threading.Thread(target=work) for _ in range(threads)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return round((time.perf_counter() - t0) * 1000, 1)


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for _ in range(trials):
        s, p = single_ms(), parallel_ms()
        load = round(os.getloadavg()[0], 2)
        verdict = quiet_verdict(s, p)
        print(f"single {s:6.1f} ms | parallel(8) {p:6.1f} ms | "
              f"loadavg {load:5.2f} | {verdict}", flush=True)
        time.sleep(1)


if __name__ == "__main__":
    main()
