"""Table maintenance: small-file compaction.

The small-files problem is the classic operational failure of long-lived
parquet tables: streaming sinks and per-batch appends leave thousands of
KB-scale files, and every downstream scan then pays file-open +
footer-read + task-schedule overhead per file (at 100 TB, millions of
tiny files can cost more than the I/O itself). Compaction rewrites a
directory into approximately target-sized files.

Sizing uses the SOURCE files' on-disk bytes (parquet-compressed), not
row counts — compression ratios vary wildly across columns and
encodings, and bytes-on-disk is the quantity the scan scheduler actually
budgets with (`spark.sql.files.maxPartitionBytes` reasons in the same
unit).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` as ~``target_file_bytes``
    files. Returns the output file count. Uses a round-robin
    ``repartition(n)`` so output files are uniformly sized regardless of
    the input's skewed file layout; for a sort-clustered rewrite compose
    with ``functions/layout.zorder_dataframe`` instead."""
    df = spark.read.parquet(src_dir)
    n = max(1, math.ceil(_dir_bytes(src_dir) / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(dst_dir)
    return sum(
        1
        for _root, _d, files in os.walk(dst_dir)
        for f in files
        if f.endswith(".parquet")
    )
