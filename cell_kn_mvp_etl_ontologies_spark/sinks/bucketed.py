"""Bucketed table sink (100 TB posture, SCALE.md).

Bucketing pre-shuffles a table once at write time: `bucketBy(n, keys)` hashes
rows into a fixed bucket count per partition-directory, and `sortBy` orders
within buckets.  Joins and aggregations keyed on the bucket columns then
read co-located data and skip their exchange entirely — the strategy for
fact-to-fact joins repeated across many queries, where paying one write-time
shuffle amortizes N read-time shuffles.

Bucket pruning also applies: an equality filter on the bucket key scans 1/n
of the files.

This is a saveAsTable path (bucket metadata lives in the catalog, not the
parquet footers); `join_bucketed_colocated` in tests/test_bucketed.py pins
the no-exchange plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
