"""Unit tests for the union-marker as-of join operator."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from taxi_data_datapipeline_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lt=_ts("2024-01-01 10:00:00"), lv=1),
            Row(k="a", lt=_ts("2024-01-01 12:00:00"), lv=2),
            Row(k="b", lt=_ts("2024-01-01 10:00:00"), lv=3),  # no right rows
            Row(k="a", lt=_ts("2024-01-01 09:00:00"), lv=4),  # before any right
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rt=_ts("2024-01-01 09:30:00"), rv="x"),
            Row(k="a", rt=_ts("2024-01-01 11:00:00"), rv="y"),
            Row(k="a", rt=_ts("2024-01-01 12:00:00"), rv="z"),  # tie: <= matches
        ]
    )
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt")
    got = {(r.k, r.lv): (r.rt_asof, r.rv_asof) for r in out.collect()}
    assert len(got) == 4
    assert got[("a", 1)] == (_ts("2024-01-01 09:30:00"), "x")
    assert got[("a", 2)] == (_ts("2024-01-01 12:00:00"), "z")  # equal ts matches
    assert got[("b", 3)] == (None, None)
    assert got[("a", 4)] == (None, None)


def test_asof_join_null_payload_in_matched_row(spark):
    # A NULL inside the matched right row must be preserved, not fall
    # through to an older non-null row.
    left = spark.createDataFrame([Row(k="a", lt=_ts("2024-01-01 12:00:00"), lv=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", rt=_ts("2024-01-01 10:00:00"), rv="old"),
            Row(k="a", rt=_ts("2024-01-01 11:00:00"), rv=None),
        ]
    )
    out = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt").collect()
    assert out[0].rt_asof == _ts("2024-01-01 11:00:00")
    assert out[0].rv_asof is None


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lt=_ts("2024-01-01 10:00:00"), lv=1),  # next right 10:30
            Row(k="a", lt=_ts("2024-01-01 11:00:00"), lv=2),  # tie at 11:00 matches
            Row(k="a", lt=_ts("2024-01-01 12:00:00"), lv=3),  # no later right
            Row(k="b", lt=_ts("2024-01-01 10:00:00"), lv=4),  # no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rt=_ts("2024-01-01 09:00:00"), rv="old"),
            Row(k="a", rt=_ts("2024-01-01 10:30:00"), rv="x"),
            Row(k="a", rt=_ts("2024-01-01 11:00:00"), rv="y"),
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lt", right_ts="rt", direction="forward"
    )
    got = {(r.k, r.lv): (r.rt_asof, r.rv_asof) for r in out.collect()}
    assert got[("a", 1)] == (_ts("2024-01-01 10:30:00"), "x")  # earliest >= left
    assert got[("a", 2)] == (_ts("2024-01-01 11:00:00"), "y")  # equal ts matches
    assert got[("a", 3)] == (None, None)
    assert got[("b", 4)] == (None, None)

    # tolerance: the 10:00 view's nearest next right is 10:30 — farther than
    # 15 minutes, so it nulls out; 11:00's tie at distance 0 survives
    tol = asof_join(
        left, right, on=["k"], left_ts="lt", right_ts="rt",
        direction="forward", tolerance="15 minutes",
    )
    got_tol = {(r.k, r.lv): (r.rt_asof, r.rv_asof) for r in tol.collect()}
    assert got_tol[("a", 1)] == (None, None)
    assert got_tol[("a", 2)] == (_ts("2024-01-01 11:00:00"), "y")


def test_asof_join_backward_tolerance(spark):
    left = spark.createDataFrame(
        [Row(k="a", lt=_ts("2024-01-01 12:00:00"), lv=1)]
    )
    right = spark.createDataFrame(
        [Row(k="a", rt=_ts("2024-01-01 09:00:00"), rv="x")]
    )
    loose = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt",
                      tolerance="4 hours").collect()[0]
    tight = asof_join(left, right, on=["k"], left_ts="lt", right_ts="rt",
                      tolerance="1 hour").collect()[0]
    assert (loose.rt_asof, loose.rv_asof) == (_ts("2024-01-01 09:00:00"), "x")
    assert (tight.rt_asof, tight.rv_asof) == (None, None)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Differential test: random frames, all four (direction, tolerance)
    combinations, compared row-for-row against pandas.merge_asof."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_l).astype("int64"),
            "lt": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="min"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n_r).astype("int64"),
            "rt": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="min"),
            "rv": rng.integers(0, 1_000_000, n_r).astype("int64"),
        }
    )
    # merge_asof demands unique, sorted keys on the right per ts; drop ties
    rpdf = rpdf.drop_duplicates(subset=["k", "rt"], keep="first")

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)

    for direction, tolerance in [
        ("backward", None),
        ("forward", None),
        ("backward", "90 minutes"),
        ("forward", "90 minutes"),
    ]:
        got = (
            asof_join(
                ldf, rdf, on=["k"], left_ts="lt", right_ts="rt",
                direction=direction, tolerance=tolerance,
            )
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            lpdf.sort_values("lt"),
            rpdf.sort_values("rt"),
            left_on="lt",
            right_on="rt",
            by="k",
            direction=direction,
            tolerance=pd.Timedelta(tolerance) if tolerance else None,
        ).sort_values("lid").reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["rt_asof"], exp["rt"], check_names=False
        )
        pd.testing.assert_series_equal(
            got["rv_asof"].astype("float64"),
            exp["rv"].astype("float64"),
            check_names=False,
        )


def test_nearest_composition_matches_pandas_merge_asof(spark):
    """The nearest-direction composition (backward + forward + pick by
    absolute distance, ties backward) must equal
    pandas.merge_asof(direction='nearest') row-for-row."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(21)
    n_l, n_r = 300, 150
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n_l).astype("int64"),
            "lt": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="min"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n_r).astype("int64"),
            "rt": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000, n_r), unit="min"),
        }
    ).drop_duplicates(subset=["k", "rt"], keep="first")

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)

    back = asof_join(
        ldf, rdf, on=["k"], left_ts="lt", right_ts="rt", right_cols=[]
    ).select("lid", F.col("lt"), F.col("rt_asof").alias("bt"))
    fwd = asof_join(
        ldf, rdf, on=["k"], left_ts="lt", right_ts="rt", right_cols=[],
        direction="forward",
    ).select(F.col("lid").alias("lid2"), F.col("rt_asof").alias("ft"))
    j = back.join(fwd, back.lid == fwd.lid2)
    bd = F.col("lt").cast("double") - F.col("bt").cast("double")
    fd = F.col("ft").cast("double") - F.col("lt").cast("double")
    nearest = (
        F.when(F.col("bt").isNull(), F.col("ft"))
        .when(F.col("ft").isNull(), F.col("bt"))
        .when(bd <= fd, F.col("bt"))
        .otherwise(F.col("ft"))
    )
    got = (
        j.select("lid", nearest.alias("nt"))
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            lpdf.sort_values("lt"),
            rpdf.sort_values("rt"),
            left_on="lt",
            right_on="rt",
            by="k",
            direction="nearest",
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["nt"], exp["rt"], check_names=False)
