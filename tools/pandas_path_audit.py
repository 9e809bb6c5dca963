"""Driver pandas-path divergence audit for the oracle side.

The driver's comparator canonicalizes DuckDB results through pandas
(``rel.df()``); the local gate hashes ``fetchall()`` rows. The two paths
can disagree in DATA-dependent ways the structural HUGEINT guard
(tests/test_oracle_types.py, bind-time only) cannot see:

* an INTEGER column that CONTAINS NULLs at the comparison sf becomes
  float64 in pandas — "2.0" vs the fetchall path's "2" (the rounds-2/3
  sessionize_events / variant_shred driver-only-red class, but triggered
  by nulls instead of HUGEINT);
* object cells pandas renders differently than Python natives (lists,
  Decimals, bytes).

This tool EXECUTES every oracle at the driver's comparison sf and hashes
each result twice — once from fetchall rows (the gate's view), once from
the ``.df()`` pandas frame (the driver's view) — and reports any query
whose two hashes differ, with the offending columns.

Two divergence classes are NORMALIZED AWAY because the real driver has
proven them safe (queries with exactly these shapes hold green
CORRECTNESS rows):

* DATE columns (pandas datetime64 at midnight) — ``hll_portable_daily``
  (r7), ``scd2_history`` (r4) and a dozen more date-emitting queries are
  driver-green; both canon paths here render midnight timestamps
  date-only.
* null-containing INTEGER columns (pandas float64 with integral values)
  — ``window_running`` (r1), ``window_distribution`` (r2),
  ``geo_radius_nn`` (r5) are driver-green with exactly this shape; both
  canon paths render integral floats as integers.
* DECIMAL columns (pandas float64, fetchall Decimal) —
  ``quality_scores`` (r1) and ``curation_pipeline`` (r2–r4) are
  driver-green emitting DECIMAL oracle outputs; Decimals here convert
  to float before rendering, same as pandas does.

Anything the tool still flags is therefore an UNKNOWN class — treat it
as a live driver risk until proven otherwise.

Usage: python tools/pandas_path_audit.py [sf_dir] [query ...]
Exit 1 on any divergence.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from tools.check_oracle import TABLES, canon_value


def canon_pandas_cell(v) -> str:
    """Render a pandas cell, normalizing the two driver-proven-safe
    classes (see module docstring): integral floats -> int rendering,
    midnight timestamps -> date-only rendering."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f.is_integer() and abs(f) < 2**53:
            return str(int(f))
        return repr(f)
    if isinstance(v, np.bool_):
        return str(int(bool(v)))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    return canon_norm(v)


def canon_norm(v) -> str:
    """The gate's canon_value with the same normalizations applied,
    so both hash paths share rendering rules for the safe classes."""
    from datetime import datetime
    from decimal import Decimal

    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float) and not math.isnan(v) and v.is_integer() and abs(v) < 2**53:
        return str(int(v))
    if isinstance(v, datetime) and v.hour == v.minute == v.second == v.microsecond == 0:
        return v.date().isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_norm(x) for x in v) + "]"
    return canon_value(v)


def norm_frame_hash(columns: list[str], rows: list[tuple]) -> str:
    import hashlib

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x1f".join(canon_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def pandas_frame_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    # column-wise extraction: iterrows() would unify dtypes across each
    # row (mixed int+float rows all become float), which is NOT what a
    # column-oriented comparator sees
    col_vals = [df[c].tolist() for c in cols]
    rows = ["\x1f".join(canon_pandas_cell(v) for v in vals) for vals in zip(*col_vals)]
    import hashlib

    h = hashlib.sha256()
    for line in sorted(rows):
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    divergent = {}
    checked = 0
    for name, sql in e.oracle_sql().items():
        if only and name not in only:
            continue
        t0 = time.time()
        rel = con.sql(sql)
        cols = list(rel.columns)
        rows = rel.fetchall()
        pdf = con.sql(sql).df()
        h_fetch = norm_frame_hash(cols, rows)
        h_pandas = pandas_frame_hash(pdf)
        checked += 1
        if h_fetch != h_pandas:
            # pin down offending columns: dtype changed vs fetchall value types
            bad_cols = []
            for i, c in enumerate(cols):
                native = {canon_norm(r[i]) for r in rows}
                via_pd = {canon_pandas_cell(v) for v in pdf[c].tolist()}
                if native != via_pd:
                    bad_cols.append(
                        f"{c} (pandas dtype {pdf[c].dtype})"
                    )
            divergent[name] = bad_cols
            print(f"DIVERGE {name}: {bad_cols}", flush=True)
        else:
            print(f"ok   {name} ({time.time() - t0:.1f}s)", flush=True)

    print(f"\nchecked {checked} oracles; divergent: {len(divergent)}")
    for k, v in divergent.items():
        print(f"  {k}: {v}")
    return 1 if divergent else 0


if __name__ == "__main__":
    sys.exit(main())
