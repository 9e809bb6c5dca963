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
