"""Fuzzy schema resolution onto the canonical trip schema.

The reference's defining data-model feature (``pivot_utils.py:19-138``):
taxi parquet column names vary by era/provider, so the pickup datetime and
pickup location columns are *detected* per file — exact candidate list first
(case-insensitive), then fuzzy substring fallback, then a lat/lon column pair
as a last resort.

Here detection runs driver-side over any column-name carrier (Spark
``StructType``, pyarrow schema, pandas frame, plain list) — footer metadata
only, no data read — and resolution produces a ``TripSchema`` that the ingest
layer turns into a plain ``select`` projection (Catalyst then prunes the scan
to exactly the referenced columns).
"""

from __future__ import annotations

from dataclasses import dataclass

DATETIME_CANDIDATES = [
    "pickup_datetime",
    "tpep_pickup_datetime",
    "lpep_pickup_datetime",
    "trip_pickup_datetime",
    "request_datetime",
    "pickup_date_time",
    "pickup_time",
    "pep_pickup_date_time",
]

LOCATION_CANDIDATES = [
    "pulocationid",
    "pickup_location_id",
    "pickup_locationid",
    "pickup_location",
    "pickup_zone_id",
    "pickup_zone",
    "origin_location_id",
    "pu_location_id",
    "pu_zone_id",
    # Reference parity (pivot_utils.find_pickup_location_col): a bare
    # "location_id" column counts as the pickup location too — without it
    # such files would degrade to pickup_place='' (ADVICE r1).
    "location_id",
]

LAT_LON_CANDIDATES = [
    ("start_lat", "start_lon"),
    ("pickup_latitude", "pickup_longitude"),
    ("pickup_lat", "pickup_lon"),
    ("start_latitude", "start_longitude"),
    ("origin_lat", "origin_lon"),
]


def _column_names(schema_carrier) -> list[str]:
    """Duck-typed column-name extraction: StructType / arrow RecordBatch
    (.column_names) / arrow Schema (.names) / .fields / pandas (.columns) /
    plain iterable of names."""
    if hasattr(schema_carrier, "fieldNames"):  # Spark StructType
        return list(schema_carrier.fieldNames())
    if hasattr(schema_carrier, "column_names"):  # arrow RecordBatch/Table
        return list(schema_carrier.column_names)
    if hasattr(schema_carrier, "names"):  # arrow Schema
        return list(schema_carrier.names)
    if hasattr(schema_carrier, "columns"):  # pandas / Spark DataFrame
        return list(schema_carrier.columns)
    if hasattr(schema_carrier, "fields"):
        return [f.name for f in schema_carrier.fields]
    return [str(c) for c in schema_carrier]


def _match(names: list[str], candidates: list[str], fuzzy_pairs) -> str | None:
    lower = {n.lower(): n for n in names}
    for cand in candidates:
        if cand in lower:
            return lower[cand]
    for primary, secondaries in fuzzy_pairs:
        for n in names:
            low = n.lower()
            if primary in low and any(s in low for s in secondaries):
                return n
    return None


def find_pickup_datetime_col(schema_carrier) -> str | None:
    """Detect the pickup-datetime column (exact list, then fuzzy
    pickup+datetime/date/time, then request+...)."""
    names = _column_names(schema_carrier)
    return _match(
        names,
        DATETIME_CANDIDATES,
        [("pickup", ("datetime", "date", "time")), ("request", ("datetime", "date", "time"))],
    )


def find_pickup_location_col(schema_carrier) -> str | None:
    """Detect the pickup-location/zone id column."""
    names = _column_names(schema_carrier)
    return _match(
        names,
        LOCATION_CANDIDATES,
        [("pickup", ("location", "zone")), ("pu_", ("location", "zone", "id"))],
    )


def find_pickup_lat_lon_cols(schema_carrier) -> tuple[str | None, str | None]:
    """Detect a (lat, lon) column pair; both or (None, None)."""
    names = _column_names(schema_carrier)
    lower = {n.lower(): n for n in names}
    for lat, lon in LAT_LON_CANDIDATES:
        if lat in lower and lon in lower:
            return lower[lat], lower[lon]
    # fuzzy: any pair sharing a prefix-ish pickup/start token
    lats = [n for n in names if "lat" in n.lower() and ("pickup" in n.lower() or "start" in n.lower())]
    lons = [n for n in names if ("lon" in n.lower() or "lng" in n.lower()) and ("pickup" in n.lower() or "start" in n.lower())]
    if lats and lons:
        return lats[0], lons[0]
    return None, None


@dataclass(frozen=True)
class TripSchema:
    """Resolved per-file trip schema: how to project this file onto the
    canonical (pickup_datetime, pickup_place) pair."""

    datetime_col: str
    location_col: str | None = None
    lat_col: str | None = None
    lon_col: str | None = None

    @property
    def place_mode(self) -> str:
        if self.location_col:
            return "location"
        if self.lat_col and self.lon_col:
            return "latlon"
        return "empty"


def resolve_trip_schema(schema_carrier) -> TripSchema | None:
    """Full resolution: datetime col required; place from location col, else
    lat/lon pair, else empty-string place (reference keeps such files with
    place='')."""
    dt = find_pickup_datetime_col(schema_carrier)
    if dt is None:
        return None
    loc = find_pickup_location_col(schema_carrier)
    if loc is not None:
        return TripSchema(datetime_col=dt, location_col=loc)
    lat, lon = find_pickup_lat_lon_cols(schema_carrier)
    return TripSchema(datetime_col=dt, lat_col=lat, lon_col=lon)
