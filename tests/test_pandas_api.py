"""pandas-API-on-Spark parity: the reference is pandas code
(groupby().size() -> pivot_table(fill_value=0), pivot_utils.py:179-208).
A reference user can keep that exact idiom — `pyspark.pandas` runs it
distributed — and it produces the engine's wide table bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_datapipeline_spark.operators.pivot import hourly_pivot
from taxi_data_datapipeline_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_pandas_pivot_table_idiom_matches_engine(spark):
    import pyspark.pandas as ps

    trips = (
        load(spark, SF, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            F.col("event_type").alias("taxi_type"),
            F.to_date("ts").alias("date"),
            F.col("user_id").cast("string").alias("pickup_place"),
            F.hour("ts").alias("hour"),
        )
    )
    # --- the reference's pandas code, verbatim idiom, on pyspark.pandas ---
    pdf = trips.pandas_api()
    counts = (
        pdf.groupby(["taxi_type", "date", "pickup_place", "hour"])
        .size()
        .reset_index(name="count")
    )
    wide = counts.pivot_table(
        index=["taxi_type", "date", "pickup_place"],
        columns="hour",
        values="count",
        aggfunc="sum",
        fill_value=0,
    ).reset_index()
    wide.columns = ["taxi_type", "date", "pickup_place"] + [
        f"hour_{int(h)}" for h in wide.columns[3:]
    ]
    got = wide.to_pandas().fillna(0)

    # --- the engine's Spark-first plan ---
    want = hourly_pivot(
        load(spark, SF, "events"),
        ts_col="ts",
        place_col="user_id",
        type_col="event_type",
        min_rides=0,
    ).toPandas()

    hour_cols = sorted(
        (c for c in want.columns if c.startswith("hour_")),
        key=lambda c: int(c.split("_")[1]),
    )
    for df in (got, want):
        for c in hour_cols:
            if c not in df.columns:
                df[c] = 0
            df[c] = df[c].astype("int64")
        df["date"] = df["date"].astype(str)
    key = ["taxi_type", "date", "pickup_place"]
    got_s = got[key + hour_cols].sort_values(key).reset_index(drop=True)
    want_s = want[key + hour_cols].sort_values(key).reset_index(drop=True)
    assert got_s.equals(want_s), (len(got_s), len(want_s))


def test_pandas_rolling_mean_matches_window_spec(spark):
    """pandas `rolling(3).mean()` per user == Spark window avg over
    rowsBetween(-2, 0) — the idiom a pandas user keeps for smoothing,
    running distributed (backlog: rolling/resample parity)."""
    import pyspark.pandas as ps
    from pyspark.sql import Window

    ev = (
        load(spark, SF, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "event_id", "value")
    )
    pdf = ev.pandas_api()
    rolled = (
        pdf.sort_values(["user_id", "event_id"])
        .groupby("user_id")["value"]
        .rolling(3, min_periods=1)
        .mean()
        .reset_index(name="roll_mean")
    )
    got = {
        (r["user_id"], r["level_1"]): round(r["roll_mean"], 9)
        for r in rolled.to_pandas().to_dict("records")
    }

    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    want_df = ev.select(
        "user_id", "event_id", F.avg("value").over(w).alias("roll_mean")
    )
    want = {
        (r.user_id, r.event_id): round(r.roll_mean, 9) for r in want_df.collect()
    }
    # pandas-on-Spark keys the rolling result by the original row index
    # (level_1 = event_id here because the frame was built from it)
    assert len(got) == len(want) > 0
    mismatches = {k: (got[k], want[k]) for k in want if got.get(k) != want[k]}
    assert not mismatches, list(mismatches.items())[:5]


def test_pandas_resample_hourly_matches_date_trunc(spark):
    """pandas `resample('h').sum()` on a datetime index == Spark
    groupBy(date_trunc('hour')) — the time-series downsampling idiom."""
    import pyspark.pandas as ps

    ev = load(spark, SF, "events").select("ts", "value").filter(F.col("ts").isNotNull())
    pdf = ev.pandas_api().set_index("ts")
    res = pdf.resample("h").sum().to_pandas()
    got = {
        ts.to_pydatetime(): round(v, 6)
        for ts, v in res["value"].items()
        if v == v and v != 0.0  # resample emits empty buckets as 0/NaN
    }

    want_df = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.sum("value").alias("value"))
    )
    want = {r.bucket: round(r.value, 6) for r in want_df.collect()}
    assert len(want) > 0
    for k, v in want.items():
        assert got.get(k) == v, (k, got.get(k), v)
