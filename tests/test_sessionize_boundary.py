"""Pinned boundary fixtures for gap-based sessionization.

Three cross-engine hazards, each pinned with an exact fixture:
1. A gap of EXACTLY 30:00 — the strict `>` rule keeps it in-session;
   any engine pair disagreeing on interval precision flips it.
2. A gap of 30:00 plus 500 NANOSECONDS stored in TIMESTAMP(NANOS)
   parquet — a µs-grain engine truncates to exactly 30:00 (in-session),
   a ns-grain engine sees > 30:00 (new session). Both sides of our gate
   compute the gap in integer epoch-µs (Spark `unix_micros` after the
   ns→µs integer-division load ladder; DuckDB `epoch_ns(ts) // 1000`),
   so both truncate identically: in-session.
3. A gap of 30:00.000001 (one full µs over) — new session on both.

Also pins the HUGEINT landmine: the oracle's windowed SUM must come
back from DuckDB's pandas path as an integer dtype, not float64 (DuckDB
widens window SUM(INTEGER) to HUGEINT, which .df() renders as float64 —
the driver-only sessionize_events hash mismatch of rounds 2-3).
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from taxi_data_datapipeline_spark.queries_advanced import q_sessionize_events
from taxi_data_datapipeline_spark.queries import ORACLES

T0 = 1_704_067_200_000_000_000  # 2024-01-01 00:00:00 UTC in ns
MIN30 = 30 * 60 * 1_000_000_000


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sess_boundary")
    ts_ns = [
        # user 1: exact 30:00 gap -> same session under strict `>`
        T0,
        T0 + MIN30,
        # then a clear 2h break -> second session
        T0 + MIN30 + 7_200_000_000_000,
        # user 2: 30:00 + 500ns -> truncates to exactly 30:00 in µs ->
        # same session on BOTH engines' integer-µs arithmetic
        T0,
        T0 + MIN30 + 500,
        # user 3: 30:00.000001 (a full µs over) -> new session
        T0,
        T0 + MIN30 + 1_000,
    ]
    users = [1, 1, 1, 2, 2, 3, 3]
    tbl = pa.table(
        {
            "event_id": pa.array(range(1, len(ts_ns) + 1), pa.int64()),
            "ts": pa.array(ts_ns, pa.timestamp("ns")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * len(ts_ns)),
            "value": pa.array([1.0] * len(ts_ns)),
            "props": pa.array(["{}"] * len(ts_ns)),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_spark_session_boundaries(spark, fixture_dir):
    rows = {
        (r.user_id, r.session_id): r.n_events
        for r in q_sessionize_events(spark, fixture_dir).collect()
    }
    # user 1: events 1-2 share a session (gap == 30:00 not > 30:00),
    # event 3 opens session 2
    assert rows[(1, 1)] == 2 and rows[(1, 2)] == 1
    # user 2: 500ns over truncates away at µs grain -> one session
    assert rows[(2, 1)] == 2 and (2, 2) not in rows
    # user 3: one whole µs over the gap -> two sessions
    assert rows[(3, 1)] == 1 and rows[(3, 2)] == 1


def test_oracle_matches_spark_on_boundaries(spark, fixture_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{fixture_dir}/events.parquet')"
    )
    rel = con.sql(ORACLES["sessionize_events"])
    # structural guard: no HUGEINT may reach the driver's pandas hasher
    assert all("HUGEINT" not in str(t).upper() for t in rel.types), rel.types
    pdf = rel.df()
    assert str(pdf["session_id"].dtype) == "int64", pdf.dtypes
    oracle = {
        (int(r.user_id), int(r.session_id)): int(r.n_events)
        for r in pdf.itertuples()
    }
    sp = {
        (r.user_id, r.session_id): r.n_events
        for r in q_sessionize_events(spark, fixture_dir).collect()
    }
    assert oracle == sp
