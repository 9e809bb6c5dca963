"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag_dir> <suffix> q1 [q2 ...]
Writes plans/<tag_dir>/<query>_<suffix>.txt for each query. Only the
plan is rendered (no action is triggered on the returned frame), though
queries with eager driver-side steps still pay those at build time.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e
from taxi_data_datapipeline_spark.session import get_spark


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    qs = e.queries()
    for n in names:
        df = qs[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", n, flush=True)


if __name__ == "__main__":
    main()
