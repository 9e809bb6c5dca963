"""Driver-window insurance: the pandas-path divergence audit must be
clean for every seated query.

tools/pandas_path_audit.py hashes each oracle's DuckDB result through
both the fetchall path (what tools/check_oracle.py sees) and the pandas
``.df()`` path (what driver-style comparators see), normalizing only the
three rendering classes proven safe by existing green CORRECTNESS rows.
A divergence here means a seated query could pass the local gate and
still go red on the driver — the rounds-2/3 sessionize_events class.

Scoped to the 50-seat window (full-registry runs live in the tool) so
the test stays fast; DuckDB-only, no Spark session.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry
from taxi_data_datapipeline_spark.queries import DRIVER_WINDOW
from tools.check_oracle import TABLES
from tools.pandas_path_audit import norm_frame_hash, pandas_frame_hash

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_driver_window_pandas_path_clean():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = entry.oracle_sql()
    divergent = []
    for name in DRIVER_WINDOW:
        sql = oracles.get(name)
        if sql is None:  # rows-only entries are not seatable by policy
            continue
        rel = con.sql(sql)
        cols = list(rel.columns)
        rows = rel.fetchall()
        pdf = con.sql(sql).df()
        if norm_frame_hash(cols, rows) != pandas_frame_hash(pdf):
            divergent.append(name)
    assert not divergent, (
        f"driver-window oracles whose pandas rendering diverges from the "
        f"fetchall rendering (sessionize-class driver risk): {divergent}"
    )
