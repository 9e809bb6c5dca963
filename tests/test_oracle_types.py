"""Registry-wide structural guard: no oracle may output HUGEINT.

DuckDB widens SUM over integers (plain and windowed) to HUGEINT; its
pandas path (.df(), which driver-style comparators use) renders HUGEINT
as float64, so "2.0" vs Spark's "2" hash-mismatches even though
fetchall()-based hashing agrees — the rounds-2/3 sessionize_events and
variant_shred driver-only reds. Binding a relation (`con.sql(...)`)
resolves output types WITHOUT executing, so this scans all ~220 oracles
in seconds.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_no_hugeint_oracle_outputs():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)  # binds + type-resolves only; no execution
        hug = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if hug:
            offenders[name] = hug
    assert not offenders, f"cast these SUMs to BIGINT: {offenders}"
