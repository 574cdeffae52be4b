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


def window_sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: list[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts whenever
    the gap from the previous event in the key partition exceeds
    ``gap_seconds``; ``session_col`` numbers sessions 1..n per key.

    Two window passes (lag to flag boundaries, running sum to number them)
    over the SAME partitioning and ordering — Catalyst plans one exchange +
    one sort feeding both Window execs, so the whole operator is a single
    shuffle on the session keys regardless of input size.  ``tiebreak_cols``
    make the intra-key order total, which makes session assignment
    deterministic when timestamps collide (required for the differential
    oracle, and for reproducible pipelines generally).

    This is the batch twin of the streaming session window
    (streaming §2.11 ``stream_window_session`` — F.session_window); same
    semantics, no watermark needed because the batch has all the data.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    ts_type = dict(df.dtypes)[ts_col]
    sec = (
        F.unix_timestamp(F.col(ts_col))
        if ts_type.startswith("timestamp")
        else F.col(ts_col).cast("long")
    )
    gap = sec - F.lag(sec).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(running))


def sort_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic sink ordering (SURVEY.md §2.6): replaces the reference's
    undefined HashMap iteration order on output."""
    return df.orderBy(*keys)
