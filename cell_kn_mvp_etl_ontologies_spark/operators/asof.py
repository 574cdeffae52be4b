"""As-of join (SURVEY.md §2.12 join_asof_events).

Spark has no native ASOF JOIN; the scalable formulation is union + windowed
last-non-null carry-forward: one shuffle on the join key, no range cross
product.  Wall-clock scales with |left| + |right| rather than their product,
and AQE handles key skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import window_last_wins


def join_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_value: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For each left row: the ``right_value`` of the latest right row with
    ``right_time <= left_time`` and matching ``on`` key (NULL when none).

    Right rows are deduplicated per (key, time) first — keeping the max value
    — so the result is deterministic under ties.
    """
    r = window_last_wins(
        right.select(on, right_time, right_value),
        [on, right_time],
        [F.col(right_value).desc()],
    )
    l_tagged = left.withColumn("_t", F.col(left_time)).withColumn("_is_left", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(r.schema[right_value].dataType)
    )
    r_tagged = (
        r.select(on, F.col(right_time).alias("_t"), F.col(right_value).alias("_rv"))
        .withColumn("_is_left", F.lit(0))
    )
    l_cols = [c for c in l_tagged.columns if c not in r_tagged.columns]
    for c in l_cols:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    u = l_tagged.select(r_tagged.columns).unionByName(r_tagged)
    # Right rows sort before left rows at equal time: <= (inclusive) semantics.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(out_col, F.last("_rv", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_left") == 1).drop("_t", "_is_left", "_rv")


def join_asof_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_value: str,
    tolerance_seconds: int | None = None,
    out_col: str = "asof_value",
) -> DataFrame:
    """Forward as-of: for each left row, the ``right_value`` of the EARLIEST
    right row with ``right_time >= left_time`` and matching key — optionally
    only if it arrives within ``tolerance_seconds`` (else NULL).  The
    sensor-alignment / next-event sibling of ``join_asof``; same scalable
    shape (union + one keyed window, never a range cross product).

    Right ties at the same (key, time) keep the MIN value for determinism.
    Output adds ``out_col`` and ``{out_col}_at`` (the matched right time,
    NULL when no match inside tolerance).
    """
    r = window_last_wins(
        right.select(on, right_time, right_value),
        [on, right_time],
        [F.col(right_value).asc()],
    )
    l_tagged = (
        left.withColumn("_t", F.col(left_time))
        .withColumn("_is_left", F.lit(1))
        .withColumn("_rv", F.lit(None).cast(r.schema[right_value].dataType))
    )
    r_tagged = (
        r.select(on, F.col(right_time).alias("_t"), F.col(right_value).alias("_rv"))
        .withColumn("_is_left", F.lit(0))
    )
    l_cols = [c for c in l_tagged.columns if c not in r_tagged.columns]
    for c in l_cols:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    u = l_tagged.select(r_tagged.columns).unionByName(r_tagged)
    # DESCENDING time with right rows first at equal time: walking the frame
    # top-down, the last right row seen at-or-after a left row is the
    # EARLIEST such right row — >= (inclusive) forward semantics.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(
        F.when(F.col("_is_left") == 0, F.struct(F.col("_t").alias("mt"), F.col("_rv").alias("mv"))),
        ignorenulls=True,
    ).over(w)
    carried = u.withColumn("_m", matched)
    if tolerance_seconds is not None:
        in_tol = F.col("_m.mt") <= F.expr(
            f"timestampadd(SECOND, {int(tolerance_seconds)}, _t)"
        )
    else:
        in_tol = F.lit(True)
    keep = F.col("_m").isNotNull() & in_tol
    return (
        carried.filter(F.col("_is_left") == 1)
        .withColumn(out_col, F.when(keep, F.col("_m.mv")))
        .withColumn(f"{out_col}_at", F.when(keep, F.col("_m.mt")))
        .drop("_t", "_is_left", "_rv", "_m")
    )
