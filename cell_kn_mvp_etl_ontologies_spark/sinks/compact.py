"""Small-files compaction (100 TB posture).

Streaming upserts, per-batch writes, and over-parallel shuffles all fragment
a parquet layout into files far below the scan-efficient size; at cluster
scale the file-listing and task-scheduling overhead of millions of small
files dominates reads.  ``compact_parquet`` rewrites a path to
size-targeted files: estimate bytes from the actual input files, derive the
output file count, and rewrite through a staging dir (same two-phase dance
as the upsert sink — a source can't be overwritten while being read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..io import replace_parquet_dir

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def estimate_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the frame's input files (local paths; on a
    cluster swap in the Hadoop FileSystem listing)."""
    total = 0
    for uri in df.inputFiles():
        path = uri.removeprefix("file:")
        try:
            total += os.path.getsize(path)
        except OSError:
            pass
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``path`` to ceil(total_bytes / target) files and return the
    compacted frame.  Row content is unchanged — only the file layout."""
    df = spark.read.parquet(path)
    total = estimate_bytes(df)
    n_files = max(1, -(-total // target_file_bytes))
    staging = path.rstrip("/") + "__compact_staging"

    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    replace_parquet_dir(spark, staging, path.rstrip("/"))
    return spark.read.parquet(path)
