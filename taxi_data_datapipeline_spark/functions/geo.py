"""Geospatial keys: geohash encoding and grid cells, as pure column
expressions.

The reference's place key is a rounded lat/lon string
(``pivot_utils.py`` F6 — functions/keys.py mirrors it); this module adds
the standard public-domain geohash (Niemeyer 2008) so spatial rollups
and cell-bucketed joins can use hierarchical prefixes instead of fixed
rounding. Everything is closed-form integer arithmetic — no loops at
runtime, no UDFs: the bit-interleave is unrolled at PLAN BUILD time into
shift/mask/add expressions, which keeps the whole encoder inside
whole-stage codegen on Spark and lets the SAME construction be emitted
as DuckDB SQL text for the oracle gate.

Exactness: the only floating-point steps are ((lon+180)/360) * 2^L and
its lat twin — identical IEEE operations in both engines — followed by
FLOOR; everything after is integer shifts and masks, so the emitted
geohash strings are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2  # MSB of the interleave is a longitude bit
    lat_bits = total // 2
    return lon_bits, lat_bits


def _interleave_terms(precision: int) -> list[tuple[str, int, int]]:
    """(axis, source_bit, target_position) triples for the unrolled
    interleave; axis 'x' is longitude (even positions from the MSB)."""
    lon_bits, lat_bits = _bits(precision)
    total = 5 * precision
    terms = []
    for j in range(lon_bits):
        terms.append(("x", lon_bits - 1 - j, total - 1 - 2 * j))
    for j in range(lat_bits):
        terms.append(("y", lat_bits - 1 - j, total - 2 - 2 * j))
    return terms


def geohash_col(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Geohash of (lat, lon) at the given character precision, as one
    codegen-friendly expression tree (scaling -> unrolled interleave ->
    base32 digit lookup)."""
    lon_bits, lat_bits = _bits(precision)
    x = F.greatest(
        F.least(
            F.floor(
                (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(2**lon_bits))
            ),
            F.lit(2**lon_bits - 1),
        ),
        F.lit(0),
    ).cast("bigint")
    y = F.greatest(
        F.least(
            F.floor(
                (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(2**lat_bits))
            ),
            F.lit(2**lat_bits - 1),
        ),
        F.lit(0),
    ).cast("bigint")
    inter = F.lit(0).cast("bigint")
    for axis, src, pos in _interleave_terms(precision):
        bit = F.shiftright(x if axis == "x" else y, src).bitwiseAND(F.lit(1))
        inter = inter + F.shiftleft(bit, pos)
    # Digit lookup: substring() takes only literal positions, so index an
    # array-literal alphabet with element_at (1-based) instead.
    alphabet = F.array(*[F.lit(c) for c in _BASE32])
    chars = []
    for k in range(precision):
        shift = 5 * (precision - 1 - k)
        idx = F.shiftright(inter, shift).bitwiseAND(F.lit(31)).cast("int")
        chars.append(F.element_at(alphabet, idx + 1))
    return F.concat(*chars)


def geohash_sql_parts(
    lat_expr: str, lon_expr: str, precision: int = 6
) -> tuple[str, str, str, str]:
    """The geohash construction as four SQL fragments for a chained-CTE
    oracle: (x_expr, y_expr, interleave_over_gx_gy, concat_over_gi)."""
    lon_bits, lat_bits = _bits(precision)
    x = (
        f"GREATEST(LEAST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * "
        f"{float(2 ** lon_bits)!r}) AS BIGINT), {2 ** lon_bits - 1}), 0)"
    )
    y = (
        f"GREATEST(LEAST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * "
        f"{float(2 ** lat_bits)!r}) AS BIGINT), {2 ** lat_bits - 1}), 0)"
    )
    parts = []
    for axis, src, pos in _interleave_terms(precision):
        base = "gx" if axis == "x" else "gy"
        parts.append(f"(({base} >> {src}) & 1) * {2 ** pos}")
    inter = " + ".join(parts)
    chars = []
    for k in range(precision):
        shift = 5 * (precision - 1 - k)
        chars.append(
            f"substr('{_BASE32}', CAST(((gi >> {shift}) & 31) AS INTEGER) + 1, 1)"
        )
    return x, y, inter, " || ".join(chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 6) -> str:
    """The SAME geohash construction as DuckDB SQL text, for oracle
    parity. ``lat_expr`` / ``lon_expr`` are SQL fragments."""
    lon_bits, lat_bits = _bits(precision)
    x = (
        f"GREATEST(LEAST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * "
        f"{float(2 ** lon_bits)!r}) AS BIGINT), {2 ** lon_bits - 1}), 0)"
    )
    y = (
        f"GREATEST(LEAST(CAST(FLOOR(({lat_expr} + 90.0) / 180.0 * "
        f"{float(2 ** lat_bits)!r}) AS BIGINT), {2 ** lat_bits - 1}), 0)"
    )
    parts = []
    for axis, src, pos in _interleave_terms(precision):
        base = "gx" if axis == "x" else "gy"
        parts.append(f"(({base} >> {src}) & 1) * {2 ** pos}")
    inter = " + ".join(parts)
    chars = []
    for k in range(precision):
        shift = 5 * (precision - 1 - k)
        chars.append(
            f"substr('{_BASE32}', CAST(((gi >> {shift}) & 31) AS INTEGER) + 1, 1)"
        )
    concat = " || ".join(chars)
    # Emitted as a correlated scalar chain: caller wraps in a LATERAL or
    # nested-select; keep it self-contained via nested subqueries instead.
    return (
        f"(SELECT {concat} FROM (SELECT ({inter}) AS gi FROM "
        f"(SELECT {x} AS gx, {y} AS gy)))"
    )
