"""Property-based tests (hypothesis) for driver-side pure functions."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from taxi_data_datapipeline_spark.sources.paths import (
    infer_month_from_path,
    infer_taxi_type_from_path,
    parse_size,
)

UNITS = {"K": 1024, "M": 1024**2, "G": 1024**3, "T": 1024**4, "P": 1024**5}


@given(st.integers(min_value=0, max_value=10**15))
def test_parse_size_bare_bytes(n):
    assert parse_size(str(n)) == n
    assert parse_size(n) == n


@given(
    st.integers(min_value=1, max_value=4096),
    st.sampled_from(list(UNITS)),
    st.sampled_from(["", "B", "b"]),
)
def test_parse_size_units(n, unit, suffix):
    assert parse_size(f"{n}{unit}{suffix}") == n * UNITS[unit]
    assert parse_size(f"{n} {unit}{suffix}") == n * UNITS[unit]  # tolerate space


@given(st.floats(min_value=0.1, max_value=100, allow_nan=False))
def test_parse_size_fractional_monotone(x):
    assert parse_size(f"{x}GB") == int(x * 1024**3)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=20))
def test_parse_size_never_wrong_type(junk):
    """parse_size either returns a non-negative int or raises ValueError."""
    try:
        out = parse_size(junk)
    except ValueError:
        return
    assert isinstance(out, int) and out >= 0


@given(
    st.integers(min_value=2009, max_value=2099),
    st.integers(min_value=1, max_value=12),
    st.sampled_from(["yellow", "green", "fhv"]),
    st.sampled_from(["{t}_tripdata_{y}-{m:02d}.parquet", "year={y}/month={m:02d}/{t}.parquet"]),
)
def test_path_roundtrip(year, month, ttype, fmt):
    path = "s3://bucket/taxi/" + fmt.format(t=ttype, y=year, m=month)
    assert infer_month_from_path(path) == (year, month)
    assert infer_taxi_type_from_path(path) == ttype


@given(st.text(max_size=30))
@settings(max_examples=200)
def test_taxi_type_total(path):
    """Taxi-type inference is total: always one of the four labels."""
    assert infer_taxi_type_from_path(path) in {"yellow", "green", "fhv", "unknown"}
