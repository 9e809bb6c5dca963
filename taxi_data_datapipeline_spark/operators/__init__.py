"""Composable DataFrame -> DataFrame operators."""

from taxi_data_datapipeline_spark.operators.pivot import (
    HOUR_COLUMNS,
    cleanup_low_count_rows,
    hourly_pivot,
    pivot_counts,
    row_total,
)

__all__ = [
    "HOUR_COLUMNS",
    "cleanup_low_count_rows",
    "hourly_pivot",
    "pivot_counts",
    "row_total",
]
