"""Window operators (SURVEY.md §2.5-2.6, §2.12).

``window_last_wins`` is the engine's deterministic replacement for the
reference's HashSet-iteration-order overwrite (OntologyGraphBuilder.java:
225-229,396-401): rank over an explicit order and keep rank 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_last_wins(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Keep one row per key group: the first under ``order_by`` (pass
    descending columns for last-wins)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def window_rank_topk(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int, rank_col: str = "rnk"
) -> DataFrame:
    """Top-k rows per partition via row_number (deterministic given a total
    order).  At scale this is a single shuffle on the partition keys; no
    global sort."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def window_running_sum(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Analytic running aggregate: rows between unbounded preceding and current."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def sort_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic sink ordering (SURVEY.md §2.6): replaces the reference's
    undefined HashMap iteration order on output."""
    return df.orderBy(*keys)
