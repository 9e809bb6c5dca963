"""Driver-window hygiene: the external correctness gate checks the first
50 registered queries with a STRICTER canonicalizer than the local gate —
pandas-based hashing crashes on array/struct cells, and DuckDB's integer
widening (SUM(BIGINT) -> HUGEINT) survives its type canon where the local
one collapses it. These regressions cost official green rows (round 1:
array_agg_nations, multimodal_features, variant_shred), so the window is
linted here structurally — schema-only, no query execution.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from taxi_data_datapipeline_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_window_is_first_50_and_fully_oracle_backed():
    assert len(DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == DRIVER_WINDOW
    assert all(n in ORACLES for n in DRIVER_WINDOW)


def test_window_rotation_not_stalled():
    """EVERY non-pinned seat must be first-time (never green in any round up
    to the rotation baseline). Guards against a rotation silently stalling —
    the registry outgrew the 50-seat window, so re-seating already-green
    queries burns the only mechanism that turns local green into official
    green (VERDICT r5 next-round #8). Round 8 tightened >=40 to ALL: a
    single wasted seat (cusum_changepoint, r8) slipped under the old bound
    (VERDICT r8 next-round #4). Bump ROTATION_BASELINE_ROUND in queries.py
    whenever the window rotates."""
    import json

    from taxi_data_datapipeline_spark.queries import (
        PINNED_SEATS,
        ROTATION_BASELINE_ROUND,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seated: set[str] = set()
    for r in range(1, ROTATION_BASELINE_ROUND + 1):
        p = os.path.join(repo, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            rows = json.load(f)
        for name, res in rows.items():
            if res.get("rows_match") and res.get("schema_match") \
                    and res.get("hash_match"):
                seated.add(name)
    assert set(PINNED_SEATS) <= set(DRIVER_WINDOW)
    wasted = [n for n in DRIVER_WINDOW
              if n not in PINNED_SEATS and n in seated]
    assert not wasted, (
        f"{len(wasted)} non-pin seats already driver-green (wasted): "
        f"{wasted}")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_window_outputs_are_driver_hashable_and_type_aligned(spark, duck):
    problems = []
    for name in DRIVER_WINDOW:
        df = QUERIES[name](spark, SF)
        spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for col, st in spark_types.items():
            if st.startswith(("array", "struct", "map")):
                problems.append(f"{name}.{col}: complex Spark type {st} "
                                "(serialize at the query boundary)")
        desc = duck.execute(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0").description
        for col, dt, *_ in desc:
            dtl = str(dt).lower()
            st = spark_types.get(col, "?")
            if "hugeint" in dtl:
                problems.append(f"{name}.{col}: oracle HUGEINT vs spark {st} "
                                "(CAST the SQL aggregate to BIGINT)")
            if dtl.startswith("decimal") and not st.startswith("decimal"):
                problems.append(f"{name}.{col}: oracle {dtl} vs spark {st} "
                                "(cast both engines to one concrete type)")
    assert not problems, "\n".join(problems)


def test_register_rejects_duplicate_names():
    """register() must raise on a name collision: a duplicate silently
    shadows the earlier query — the loser becomes dead code that LOOKS
    covered because the name stays green under the survivor's oracle
    (VERDICT r9 wrong #1: queries_advanced's count-CUSUM was shadowed by
    queries_stats' revenue-CUSUM for three rounds)."""
    from taxi_data_datapipeline_spark.queries import register

    existing = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        register(existing)(QUERIES[existing])
    # every @register call site produced exactly one registry entry
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "taxi_data_datapipeline_spark")
    out = subprocess.run(
        ["grep", "-rc", "^@register(", pkg], capture_output=True, text=True
    ).stdout
    call_sites = sum(int(line.rsplit(":", 1)[1]) for line in out.splitlines())
    assert call_sites == len(QUERIES), (
        f"{call_sites} @register call sites vs {len(QUERIES)} registry "
        "entries — a collision is being masked somewhere"
    )
