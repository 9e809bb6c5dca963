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
