"""Statistics-gated broadcast sweep (VERDICT r11 wrong #3 / next-round #1).

Round 11 demonstrated the fatal class at sf3: ``substring_dup_spans``'
original plan let Catalyst's optimistic post-aggregate row estimate pick
a broadcast of a corpus-sized gram table — green at every gate scale,
dead at sf3 at the 8 GiB broadcast cap.  The SCALING.md rule: *if both
join sides scale with the corpus, never let a statistics estimate choose
broadcast* — pin ``shuffle_hash`` (or prove the build side bounded by
construction).

This tool makes the sweep mechanical.  Every registered non-streaming
query is planned twice in one session:

1. with the tuned default ``spark.sql.autoBroadcastJoinThreshold`` (64m);
2. with the threshold set to ``-1`` (statistics-gated broadcasts
   disabled; only *hint-driven* broadcasts survive).

A BroadcastHashJoin that disappears under (2) was chosen by a statistics
estimate, not by an explicit ``F.broadcast``/hint — exactly the class
that can go fatal when the estimate stays optimistic while the true size
grows with the corpus.  The JSON artifact lists, per query, the default
and hint-only join mixes and the statistics-gated BHJ/BNLJ counts, so
the boundedness review only has to touch the flagged names.

Being statistics-gated is NOT itself a defect: a 25-row nation dim or a
1-row normalizer aggregate is bounded by construction at any scale, and
letting Catalyst broadcast it is the right plan.  The review output is
an audited classification per flagged query (see SCALING.md round-12
section), with pins added only where a build side is corpus-derived.

Usage: python tools/broadcast_audit.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from taxi_data_datapipeline_spark.session import get_spark  # noqa: E402

THRESH_KEY = "spark.sql.autoBroadcastJoinThreshold"
JOIN_OPS = [
    ("BroadcastHashJoin", "BHJ"),
    ("SortMergeJoin", "SMJ"),
    ("ShuffledHashJoin", "SHJ"),
    ("BroadcastNestedLoopJoin", "BNLJ"),
    ("CartesianProduct", "CART"),
]


_NODE_RE = re.compile(r"^[\s:+\-*]*([A-Za-z][A-Za-z0-9 ]*?)\s*\((\d+)\)\s*$")

# Build-side subtree classes, worst-first. "agg"/"join" build sides have
# POST-SHUFFLE size estimates — the class Catalyst guesses optimistically
# and never corrects, the substring_dup_spans failure mode. "generate"
# (explode above a scan) under-estimates fanout. "scan" build sides
# (raw/filtered/projected file scans) have file-size-backed estimates that
# track the true size, so the same statistics gate flips them to SMJ at
# the scale where broadcast stops being safe — no pin needed.
_SCAN_ONLY = {
    "Scan parquet", "Scan csv", "Scan ExistingRDD", "LocalTableScan",
    "Filter", "Project", "ColumnarToRow", "Union", "Range", "InputAdapter",
    "WholeStageCodegen", "Scan json", "Scan orc", "Scan text", "Coalesce",
}


def _tree_nodes(plan: str) -> list[tuple[int, str]]:
    """(depth, name) per operator line of the formatted plan's tree section."""
    nodes = []
    for line in plan.splitlines():
        if not line.strip():
            if nodes:
                break
            continue
        m = _NODE_RE.match(line)
        if m:
            depth = len(line) - len(line.lstrip(" :+-*"))
            nodes.append((depth, m.group(1).strip()))
    return nodes


def broadcast_build_classes(plan: str) -> list[str]:
    """Classify every BroadcastExchange's input subtree in the plan."""
    nodes = _tree_nodes(plan)
    out = []
    for i, (depth, name) in enumerate(nodes):
        if name != "BroadcastExchange":
            continue
        sub = []
        for d, n in nodes[i + 1:]:
            if d <= depth:
                break
            sub.append(n)
        names = {n.split(" ")[0] for n in sub}
        if any("Aggregate" in n for n in names):
            cls = "agg"
        elif any("Join" in n or n == "CartesianProduct" for n in names):
            cls = "join"
        elif any(n == "Window" for n in names):
            cls = "window"
        elif "ReusedExchange" in names:
            cls = "reused"
        elif "Generate" in names:
            cls = "generate"
        elif names <= {n.split(" ")[0] for n in _SCAN_ONLY} | {
            "Scan", "Exchange", "Sort", "TakeOrderedAndProject", "GlobalLimit",
            "LocalLimit", "CollectLimit",
        } and any(n in ("GlobalLimit", "LocalLimit", "TakeOrderedAndProject",
                        "CollectLimit") for n in names):
            cls = "limit"
        elif all(n.split(" ")[0] in {s.split(" ")[0] for s in _SCAN_ONLY}
                 for n in sub):
            cls = "scan"
        else:
            cls = "other:" + ",".join(sorted(names - {
                s.split(" ")[0] for s in _SCAN_ONLY}))
        out.append(cls)
    return out


def _plan(spark, fn, sf_dir: str) -> str:
    df = fn(spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _mix(plan: str) -> dict[str, int]:
    return {
        abbr: n
        for op, abbr in JOIN_OPS
        if (n := len(re.findall(rf"\(\d+\) {op}", plan)))
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_history",
            "broadcast_audit_r12.json",
        )
    )
    spark = get_spark("broadcast_audit")
    default_thresh = spark.conf.get(THRESH_KEY)
    qs = e.queries()

    rows: dict[str, dict] = {}
    flagged = 0
    for name, fn in qs.items():
        if name.startswith("streaming_"):
            continue
        try:
            spark.conf.set(THRESH_KEY, default_thresh)
            plan_def = _plan(spark, fn, sf_dir)
            mix_def = _mix(plan_def)
            build_classes = broadcast_build_classes(plan_def)
            spark.conf.set(THRESH_KEY, "-1")
            plan_min = _plan(spark, fn, sf_dir)
            mix_min = _mix(plan_min)
            hint_classes = broadcast_build_classes(plan_min)
        except Exception as ex:  # pragma: no cover - report, don't abort
            rows[name] = {"error": str(ex)[:120]}
            continue
        finally:
            spark.conf.set(THRESH_KEY, default_thresh)
        stat_bhj = mix_def.get("BHJ", 0) - mix_min.get("BHJ", 0)
        stat_bnlj = mix_def.get("BNLJ", 0) - mix_min.get("BNLJ", 0)
        row = {"default": mix_def, "hint_only": mix_min}
        if build_classes:
            row["build_sides"] = build_classes
        if hint_classes:
            row["hinted_build_sides"] = hint_classes
        if stat_bhj > 0:
            row["stat_gated_bhj"] = stat_bhj
            flagged += 1
        if stat_bnlj > 0:
            row["stat_gated_bnlj"] = stat_bnlj
        rows[name] = row

    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "threshold_default": default_thresh,
                "queries": rows,
                "flagged_stat_gated_bhj": flagged,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(
        f"wrote {out}: {len(rows)} queries planned, "
        f"{flagged} with statistics-gated BHJs"
    )


if __name__ == "__main__":
    main()
