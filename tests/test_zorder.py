"""Z-order layout: sorting by the Morton key must narrow row-group
stats on BOTH dimensions — the property single-column sort can't give."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.functions.layout import (
    zorder_dataframe,
    zorder_key,
)
from taxi_data_datapipeline_spark.queries import load

SF = "/root/testdata/sf0.01"


def _rowgroup_spans(out_dir: str, col: str) -> list[tuple]:
    spans = []
    for f in glob.glob(f"{out_dir}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    return spans


def _mean_span(spans) -> float:
    return sum(hi - lo for lo, hi in spans) / len(spans)


def test_zorder_key_is_deterministic_and_interleaves(spark):
    df = spark.createDataFrame([(1, 2), (3, 1), (0, 0)], "a int, b int")
    got = [r["zkey"] for r in df.select(zorder_key(["a", "b"], bits=4)).collect()]
    # a bits at even positions, b bits at odd: (1,2)->1+8=9, (3,1)->5+2=7, 0
    assert got == [9, 7, 0]


def test_zorder_layout_narrows_both_dimensions(spark, tmp_path):
    ev = (
        load(spark, SF, "events")
        .select(
            F.col("user_id").cast("long").alias("u"),
            F.hour("ts").cast("long").alias("h"),
            "value",
        )
    )
    z_dir = str(tmp_path / "zorder")
    lin_dir = str(tmp_path / "linear")
    opts = {"parquet.block.size": str(8 * 1024)}

    zdf = zorder_dataframe(ev, ["u", "h"], n_files=2, bits=8)
    w = zdf.write.mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, v)
    w.parquet(z_dir)

    # baseline: sorted by u only — h stats stay full-range
    w2 = ev.repartitionByRange(2, "u").sortWithinPartitions("u").write.mode("overwrite")
    for k, v in opts.items():
        w2 = w2.option(k, v)
    w2.parquet(lin_dir)

    full_u = 149
    full_h = 23
    z_u, z_h = _rowgroup_spans(z_dir, "u"), _rowgroup_spans(z_dir, "h")
    l_u, l_h = _rowgroup_spans(lin_dir, "u"), _rowgroup_spans(lin_dir, "h")
    assert len(z_u) >= 4, "need multiple row groups for the comparison"

    # single-column sort: u narrow, h ~full range per row group
    assert _mean_span(l_u) < 0.5 * full_u
    assert _mean_span(l_h) > 0.8 * full_h
    # z-order: BOTH dimensions materially narrower than full range
    assert _mean_span(z_u) < 0.7 * full_u, _mean_span(z_u)
    assert _mean_span(z_h) < 0.7 * full_h, _mean_span(z_h)

    # and the data survives the round trip
    assert spark.read.parquet(z_dir).count() == ev.count()


def test_zorder_key_bijection_property(spark):
    """Morton interleave must be invertible: deinterleaving the key
    recovers the exact inputs (no collisions, no dropped bits). Checked
    in one Spark job over a hypothesis-style random sample."""
    import random

    rnd = random.Random(7)
    pairs = [(rnd.randrange(2**16), rnd.randrange(2**16)) for _ in range(500)]
    df = spark.createDataFrame(pairs, "a long, b long")
    out = df.select("a", "b", zorder_key(["a", "b"], bits=16))
    for r in out.collect():
        z = r["zkey"]
        a = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r["a"], r["b"])
