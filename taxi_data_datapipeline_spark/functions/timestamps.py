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
# for 2001..2052 which covers the taxi corpus).
_EPOCH_MS_THRESHOLD = 2_600_000_000


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
        as_long = col.cast("long")
        return F.when(
            F.abs(as_long) >= _EPOCH_MS_THRESHOLD, F.timestamp_millis(as_long)
        ).otherwise(F.timestamp_seconds(as_long))
    # strings (and anything else): lenient parse, NULL on failure
    return F.try_to_timestamp(col.cast("string"))
