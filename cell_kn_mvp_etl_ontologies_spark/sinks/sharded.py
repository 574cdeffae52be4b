"""Range-sharded ordered writes (100 TB posture).

Training shards are usually written globally ordered by some key (an order
hash for shuffled epochs, a curriculum score, a time column) so a reader can
stream shard_0000..shard_NNNN and see the whole corpus in key order without
any merge step.  ``repartitionByRange`` + ``sortWithinPartitions`` is the
Spark-native way: one range-partitioning shuffle (sampled boundaries), then
each task writes its own sorted file — no global sort-merge, no driver
bottleneck, scales to any shard count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_range_sharded(
    df: DataFrame, path: str, order_col: str, n_shards: int
) -> DataFrame:
    """Write ``df`` as ``n_shards`` parquet files range-partitioned and
    internally sorted on ``order_col``; returns the read-back frame."""
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)


def verify_range_sharded(back: DataFrame, order_col: str) -> DataFrame:
    """One-row (total_rows, ranges_disjoint): per-file key intervals must not
    overlap — the property that makes the shard set globally ordered.

    The interval check windows over ONE ROW PER FILE (thousands at most), so
    the unpartitioned window is driver-scale state, not a data-scale sort.
    """
    per_file = (
        back.select(F.col(order_col).alias("k"), F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"), F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("lo")
    flagged = per_file.withColumn("prev_hi", F.lag("hi").over(w))
    return flagged.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.bool_and(
            F.col("prev_hi").isNull() | (F.col("prev_hi") < F.col("lo"))
        ).alias("ranges_disjoint"),
    )
