"""Timestamp coercion onto TimestampType.

Reference semantics (``pivot_all_files.py:139-149``): per file, the pickup
datetime column may be (a) a real timestamp, (b) an epoch integer in
milliseconds (some files: seconds), or (c) a string; invalid values coerce to
null and are dropped downstream.

Spark-first: the branch is resolved at *plan build time* from the column's
DataType (schema is known per file), so the executed plan contains exactly one
conversion expression — no runtime type dispatch, full codegen. Epoch-unit
ambiguity (ms vs s) is resolved by magnitude: epoch seconds for dates up to
year 9999 are < 2.6e11, epoch ms for dates after ~1971 are > 3e10; the
reference instead tries ms first and falls back. We use a per-value magnitude
threshold, which also handles files mixing both units.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Above this an epoch value must be milliseconds (2_600_000_000 s ~ year 2052,
# 2_600_000_000 ms ~ 1970-02-01; values in [1e9, 2.6e9] are plausible seconds
# for 2001..2052 which covers the taxi corpus). The same ladder extends
# upward: x1000 per unit step, so micros ~ 1.7e15 and nanos ~ 1.7e18 for
# current dates — the bands don't overlap for any plausible year.
_EPOCH_MS_THRESHOLD = 2_600_000_000
_EPOCH_US_THRESHOLD = _EPOCH_MS_THRESHOLD * 1_000
_EPOCH_NS_THRESHOLD = _EPOCH_MS_THRESHOLD * 1_000_000


def coerce_timestamp(col: Column, dtype: T.DataType | None = None) -> Column:
    """Coerce ``col`` (timestamp / epoch numeric / string) to TimestampType.

    Invalid values become NULL (caller filters + audits), matching the
    reference's ``errors="coerce"`` + dropna contract.
    """
    if dtype is None or isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("timestamp")
    if isinstance(dtype, T.DateType):
        return col.cast("timestamp")
    if isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.DecimalType)):
        # Magnitude ladder: ns / us / ms / s. Covers parquet TIMESTAMP(NANOS)
        # columns read as bigint under spark.sql.legacy.parquet.nanosAsLong
        # (Spark's vectorized reader has no native nanos type).
        as_long = col.cast("long")
        # ns -> us must divide in integer space: double division rounds at
        # nanos magnitude (>2^53), which would smear timestamps by ~us.
        ns_to_us = F.floor(as_long.cast("decimal(24,0)") / 1000).cast("long")
        return (
            F.when(F.abs(as_long) >= _EPOCH_NS_THRESHOLD, F.timestamp_micros(ns_to_us))
            .when(F.abs(as_long) >= _EPOCH_US_THRESHOLD, F.timestamp_micros(as_long))
            .when(F.abs(as_long) >= _EPOCH_MS_THRESHOLD, F.timestamp_millis(as_long))
            .otherwise(F.timestamp_seconds(as_long))
        )
    # strings (and anything else): lenient parse, NULL on failure
    return F.try_to_timestamp(col.cast("string"))
