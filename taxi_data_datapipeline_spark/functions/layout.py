"""Z-order (Morton) layout keys: multi-dimensional clustering for scans.

Sorting a file by ONE column narrows that column's row-group min/max
stats (readers skip row groups); filters on any OTHER column still scan
everything. Interleaving the bits of k columns into one Morton key and
sorting by THAT narrows the stats of ALL k columns simultaneously — each
row group covers a small k-dimensional tile. This is the layout trick
behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain Column
expressions (shiftleft / shiftright / bitwise AND — whole-stage codegen,
no UDF).

Keys are built from the low ``bits`` of each column after an optional
min-subtraction; for skewed domains rank the columns first (ntile) so
the bits spread. 16 bits x 2 dims covers 65k x 65k tiles — ample for
row-group-level skipping.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column (cast to long,
    clamped non-negative) into one sortable long key.

    Bit b of column j lands at position b * k + j — columns must satisfy
    bits * len(cols) <= 63.
    """
    k = len(cols)
    if bits * k > 63:
        raise ValueError(f"bits*cols = {bits * k} exceeds a long")
    out: list[Column] = []
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = F.greatest(col.cast("long"), F.lit(0))
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            out.append(F.shiftleft(bit, b * k + j))
    return reduce(add, out).alias("zkey")


def _as_numeric(df: DataFrame, c: str) -> Column:
    """Map a column onto a sortable non-negative long for Morton keying:
    dates/timestamps via their epoch representation, strings/binary via a
    hash (equal values cluster; order is sacrificed — acceptable for
    point-lookup/equality-skipping dimensions), numerics as-is."""
    dt = dict(df.dtypes)[c]
    col = F.col(c)
    if dt == "date":
        return F.unix_date(col)
    if dt.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    if dt in ("string", "binary"):
        return F.abs(F.xxhash64(col))
    return col.cast("long")


def zorder_dataframe(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 16
) -> DataFrame:
    """Range-partition by the Morton key and sort within partitions —
    the write-side half of OPTIMIZE ZORDER. Each output file then holds
    a compact k-dimensional tile; combine with a small
    ``parquet.block.size`` for row-group-level tiles inside files.

    Each dimension is min-max scaled into the full ``bits`` range first
    (via ONE broadcast 1-row aggregate — no driver collect): without
    scaling, a narrow domain (e.g. 60 days of unix_date ~ 19,7xx) never
    reaches the interleaved high bits, and range-splitting the key would
    degrade to clustering on the widest column only."""
    numeric = {c: _as_numeric(df, c) for c in cols}
    stats = df.agg(
        *[F.min(e).alias(f"_mn_{i}") for i, e in enumerate(numeric.values())],
        *[F.max(e).alias(f"_mx_{i}") for i, e in enumerate(numeric.values())],
    )
    scaled = []
    top = (1 << bits) - 1
    for i, e in enumerate(numeric.values()):
        # Double-space scaling: hash dims reach 2^63, so long multiply
        # would overflow; tile placement doesn't need exact integer math.
        mn = F.col(f"_mn_{i}").cast("double")
        span = F.greatest(F.col(f"_mx_{i}").cast("double") - mn, F.lit(1.0))
        scaled.append(((e.cast("double") - mn) * top / span).cast("long"))
    key = zorder_key(scaled, bits=bits)
    return (
        df.join(F.broadcast(stats))
        .withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *stats.columns)
    )
