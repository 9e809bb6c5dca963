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


def zorder_dataframe(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 16
) -> DataFrame:
    """Range-partition by the Morton key and sort within partitions —
    the write-side half of OPTIMIZE ZORDER. Each output file then holds
    a compact k-dimensional tile; combine with a small
    ``parquet.block.size`` for row-group-level tiles inside files."""
    key = zorder_key(cols, bits=bits)
    return (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
