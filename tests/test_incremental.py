"""Incremental pivot refresh: only new files are processed on rerun, and
the merged wide table equals the batch recompute over everything."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from taxi_data_datapipeline_spark.streaming.incremental import run_incremental_pivot


def _write(path, ts_list, places, types):
    pdf = pd.DataFrame(
        {
            "pickup_datetime": pd.to_datetime(ts_list),
            "pickup_place": places,
            "taxi_type": types,
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(path), coerce_timestamps="us")


def _snapshot(spark, out):
    rows = spark.read.parquet(out).collect()
    return {
        (r.taxi_type, str(r.date), r.pickup_place): tuple(
            r[f"hour_{h}"] for h in range(24)
        )
        for r in rows
    }


def test_incremental_matches_batch(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    out = str(tmp_path / "wide")
    ckpt = str(tmp_path / "ckpt")

    _write(
        inp / "f1.parquet",
        ["2024-03-01 08:05:00", "2024-03-01 08:55:00", "2024-03-01 09:05:00"],
        ["132", "132", "7"],
        ["yellow", "yellow", "green"],
    )
    run_incremental_pivot(spark, str(inp), out, ckpt)
    snap1 = _snapshot(spark, out)
    assert snap1[("yellow", "2024-03-01", "132")][8] == 2
    assert snap1[("green", "2024-03-01", "7")][9] == 1

    # second refresh with NO new files: output unchanged (no reprocessing)
    run_incremental_pivot(spark, str(inp), out, ckpt)
    assert _snapshot(spark, out) == snap1

    # new file lands: counts merge additively into existing cells + new cells
    _write(
        inp / "f2.parquet",
        ["2024-03-01 08:30:00", "2024-03-02 10:00:00"],
        ["132", "9"],
        ["yellow", "fhv"],
    )
    run_incremental_pivot(spark, str(inp), out, ckpt)
    snap2 = _snapshot(spark, out)
    assert snap2[("yellow", "2024-03-01", "132")][8] == 3  # 2 + 1 merged
    assert snap2[("fhv", "2024-03-02", "9")][10] == 1
    assert snap2[("green", "2024-03-01", "7")][9] == 1  # untouched rows survive

    # equivalence: the merged table == one-shot batch pivot over all files
    from taxi_data_datapipeline_spark.operators.pivot import hourly_pivot

    batch = hourly_pivot(spark.read.parquet(str(inp)), min_rides=0)
    got = {
        (r.taxi_type, str(r.date), r.pickup_place): tuple(
            r[f"hour_{h}"] for h in range(24)
        )
        for r in batch.collect()
    }
    assert got == snap2
