"""Single source of truth for the host-contention probe thresholds.

Four numbers decide whether a bench pass ran in a quiet window; they were
previously hard-coded twice in bench.py (the convergence gate and
probe_verdict_for) and once in tools/host_probe.py, so editing one site
silently desynced the published probe_verdict from the gate that actually
selected the pass (ADVICE r9). Every consumer imports from here.

* SINGLE_PROBE_REL / PAR_PROBE_REL — a pass counts as healthy only when its
  bracketing single/parallel probes are within these factors of the best
  probe seen in the same run (relative: catches bursts that start mid-run).
* SINGLE_PROBE_ABS_MS / PAR_OVER_SINGLE_MAX — absolute host bounds: the
  lone-thread sha256 probe's quiet-host time, and how much slower the
  8-thread probe may be before neighbors are evidently bursting on other
  cores (the degraded-multicore signature loadavg can't see).
"""

SINGLE_PROBE_REL = 1.30
PAR_PROBE_REL = 1.40
SINGLE_PROBE_ABS_MS = 13.0
PAR_OVER_SINGLE_MAX = 1.6


def quiet_verdict(single_ms: float, par_ms: float) -> str:
    """Absolute host-health verdict (tools/host_probe.py's gate)."""
    ok = single_ms <= SINGLE_PROBE_ABS_MS and par_ms <= PAR_OVER_SINGLE_MAX * single_ms
    return "QUIET" if ok else "NOISY"


def quiet_verdict_pairs(singles: list, pars: list) -> str:
    """Verdict over a run's bracketing probe samples, evaluated PER PAIR.

    quiet_verdict(max(singles), max(pars)) pairs maxima from different
    brackets, which can mask the degraded-multicore signature: brackets
    (5 ms, 15 ms) and (12 ms, 10 ms) yield QUIET although the first
    bracket's 3x par/single ratio is NOISY (ADVICE r10). A run is QUIET
    only if every (single, parallel) sample pair is quiet on its own."""
    if not singles or len(singles) != len(pars):
        return "NOISY"
    return (
        "QUIET"
        if all(quiet_verdict(s, p) == "QUIET" for s, p in zip(singles, pars))
        else "NOISY"
    )
