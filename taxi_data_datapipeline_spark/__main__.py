"""CLI entry point mirroring the reference's flag surface
(``README.md:20-46``, ``pivot_all_files.py:367-392``), driven by the
Spark pipeline runner.

    python3 -m taxi_data_datapipeline_spark \
      --input-dir s3a://bucket/taxi/ --output-dir ./out \
      --min-rides 50 --report report.json

Flag mapping onto Spark:

* ``--workers`` — accepted for compatibility; Spark's task scheduler
  replaces the process pool (sets local core count when given).
* ``--partition-size`` — bytes or "200MB"-style; becomes
  ``spark.sql.files.maxPartitionBytes`` (the reference's empirical batch
  optimizer collapses to this conf + AQE).
* ``--skip-partition-optimization`` — no-op (there is nothing to skip).
* ``--keep-intermediate`` — no-op (the single-plan pipeline has no
  intermediates to keep).
* ``--s3-output`` — written to directly as the output URI; no copy step.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="taxi_data_datapipeline_spark")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--min-rides", type=int, default=50)
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--partition-size", default=None)
    p.add_argument("--skip-partition-optimization", action="store_true")
    p.add_argument("--keep-intermediate", action="store_true")
    p.add_argument("--s3-output", default=None)
    p.add_argument("--report", default="report.json")
    p.add_argument("--max-files", type=int, default=None)
    p.add_argument("--name-filter", default="tripdata")
    p.add_argument("--partition-output-by", nargs="*", default=[])
    p.add_argument(
        "--zorder-by",
        nargs="*",
        default=[],
        help="cluster output files by these columns (Morton/Z-order layout; "
        "readers skip files via min/max stats on ANY listed column)",
    )
    p.add_argument("--zorder-files", type=int, default=8)
    p.add_argument(
        "--skip-schema-check",
        action="store_true",
        help="skip the advisory <=5-file schema pre-flight "
        "(reference run_schema_check; detection per file stays authoritative)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from taxi_data_datapipeline_spark.plans.pipeline import (
        PipelineConfig,
        run_pivot_pipeline,
    )
    from taxi_data_datapipeline_spark.session import configure_scan_partitions, get_spark

    spark = get_spark("pivot_pipeline", cpus=args.workers)
    if args.partition_size:
        configure_scan_partitions(spark, args.partition_size)

    output = args.s3_output or f"{args.output_dir.rstrip('/')}/wide_table.parquet"
    cfg = PipelineConfig(
        input_path=args.input_dir,
        output_path=output,
        min_rides=args.min_rides,
        max_files=args.max_files,
        name_filter=args.name_filter or None,
        report_path=args.report,
        report_format="tex" if str(args.report).endswith(".tex") else "json",
        partition_output_by=list(args.partition_output_by),
        zorder_by=list(args.zorder_by),
        zorder_files=args.zorder_files,
        schema_check=not args.skip_schema_check,
    )
    metrics = run_pivot_pipeline(spark, cfg)
    print(json.dumps(asdict(metrics)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
