"""Custom Python DataSource: deterministic synthetic trips feed the
flagship pivot exactly like parquet input."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.pivot import hourly_pivot
from taxi_data_datapipeline_spark.sources.pydatasource import (
    SynthTripsSource,
    TAXI_TYPES,
)


def _read(spark, rows=500, months=2):
    spark.dataSource.register(SynthTripsSource)
    return (
        spark.read.format("synthtrips")
        .option("rows_per_partition", str(rows))
        .option("months", str(months))
        .load()
    )


def test_partition_grid_and_determinism(spark):
    df = _read(spark)
    assert df.count() == 500 * len(TAXI_TYPES) * 2
    # one partition per (type, month) — the reference's unit of work
    assert df.rdd.getNumPartitions() == len(TAXI_TYPES) * 2
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark).collect()))
    assert a == b  # re-read identical: no RNG state anywhere


def test_synth_trips_feed_flagship_pivot(spark):
    df = _read(spark)
    wide = hourly_pivot(
        df,
        ts_col="pickup_datetime",
        place_col="pickup_location",
        type_col="taxi_type",
        min_rides=1,
    )
    rows = wide.collect()
    assert len(rows) > 0
    total = sum(sum(r[f"hour_{h}"] for h in range(24)) for r in rows)
    assert total == df.count()
    assert set(r["taxi_type"] for r in rows) == set(TAXI_TYPES)


def test_months_are_disjoint_time_ranges(spark):
    df = _read(spark, rows=200, months=3)
    spans = (
        df.groupBy("month_id")
        .agg(F.min("pickup_datetime").alias("lo"), F.max("pickup_datetime").alias("hi"))
        .collect()
    )
    spans = sorted([(r["month_id"], r["lo"], r["hi"]) for r in spans])
    for (m1, _, hi1), (m2, lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2, (m1, m2)


def test_stream_reader_equals_batch(spark, tmp_path):
    from taxi_data_datapipeline_spark.sources.pydatasource import SynthTripsSource

    spark.dataSource.register(SynthTripsSource)
    opts = {"rows_per_partition": "200", "months": "3"}
    batch = spark.read.format("synthtrips").options(**opts).load()

    stream = (
        spark.readStream.format("synthtrips")
        .options(**opts)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        stream.processAllAvailable()
    finally:
        stream.stop()
    got = spark.table("synth_stream")
    assert got.count() == batch.count() == 200 * 3 * 3
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_reader_batches_per_month(spark, tmp_path):
    from taxi_data_datapipeline_spark.sources.pydatasource import (
        SynthTripsStreamReader,
    )

    r = SynthTripsStreamReader({"rows_per_partition": "10", "months": "2"})
    assert r.initialOffset() == {"month": 0}
    assert r.latestOffset() == {"month": 1}  # one month per trigger
    assert r.latestOffset() == {"month": 2}
    assert r.latestOffset() == {"month": 2}  # exhausted universe stays put
    parts = r.partitions({"month": 0}, {"month": 1})
    assert len(parts) == 3  # one per taxi type for the arrived month
