"""Table maintenance: small-files compaction.

Continuous streaming ingest (one parquet file per micro-batch per
partition) degrades every later scan: file-open overhead, tiny row
groups, no effective column-chunk compression. At 100 TB the scan cost
difference between 128 MB files and 100 KB files is the difference
between an IO-bound job and a metadata-bound one. ``compact_parquet``
rewrites a directory into size-targeted files with the same atomic
swap discipline as ``GraphStore.save_atomic``.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def parquet_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files_to_compact: int = 2,
) -> int:
    """Rewrite ``path`` into ``ceil(bytes / target)`` parquet files.

    Returns the new file count (or the old one if no compaction was
    needed). The rewrite goes to a staging directory first and swaps in
    with a rename, so concurrent readers of the old files either see
    the old directory or the new one, never a half-written mix. A
    round-robin repartition spreads rows evenly regardless of the input
    file-size distribution (no shuffle key needed — compaction must not
    change ordering guarantees, which parquet directories don't have).
    """
    n_files = parquet_file_count(path)
    if n_files < min_files_to_compact:
        return n_files
    n_out = max(1, math.ceil(parquet_bytes(path) / target_file_bytes))
    if n_out >= n_files:
        return n_files

    df = spark.read.parquet(path)
    staging = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    retired = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    try:
        df.repartition(n_out).write.mode("overwrite").parquet(staging)
        os.rename(path, retired)
        os.rename(staging, path)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    shutil.rmtree(retired, ignore_errors=True)
    return parquet_file_count(path)
