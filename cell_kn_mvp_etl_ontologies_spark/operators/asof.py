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


def join_asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_value: str,
    tolerance_seconds: int | None = None,
    out_col: str = "asof_value",
) -> DataFrame:
    """Nearest as-of (round 7 — completes the backward/forward/nearest
    family): for each left row, the right row minimizing
    ``|right_time - left_time|`` on the matching key, optionally only
    within ``tolerance_seconds`` — the sensor-alignment mode timeseries
    engines call merge_asof(direction='nearest').

    Determinism: right rows dedup per (key, time) keeping the MIN value;
    an exact distance tie (one candidate before, one equally far after)
    resolves to the BACKWARD candidate.  Both choices are stated contract,
    pinned by the oracle's independent correlated-subquery formulation.

    Scale shape: the SAME union frame carries both directions — an
    ascending keyed window finds the latest right row at-or-before each
    left row, a descending one the earliest at-or-after; Catalyst plans
    ONE exchange on the key feeding two sorts, so the cost is
    |left| + |right| with no range cross product, exactly like the
    sibling operators above.  Output adds ``out_col``, ``{out_col}_at``,
    and ``{out_col}_dist_us`` (absolute microsecond distance; NULL when
    no candidate inside tolerance).
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
    cand = F.when(
        F.col("_is_left") == 0, F.struct(F.col("_t").alias("mt"), F.col("_rv").alias("mv"))
    )
    # ascending: right rows sort before left at equal time → inclusive <=
    w_b = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # descending: right rows first at equal time → inclusive >=
    w_f = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_b", F.last(cand, ignorenulls=True).over(w_b)).withColumn(
        "_f", F.last(cand, ignorenulls=True).over(w_f)
    )
    d_b = F.expr("timestampdiff(MICROSECOND, _b.mt, _t)")  # >= 0
    d_f = F.expr("timestampdiff(MICROSECOND, _t, _f.mt)")  # >= 0
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds) * 1_000_000
        b_ok = F.col("_b").isNotNull() & (d_b <= F.lit(tol_us))
        f_ok = F.col("_f").isNotNull() & (d_f <= F.lit(tol_us))
    else:
        b_ok = F.col("_b").isNotNull()
        f_ok = F.col("_f").isNotNull()
    # distance tie → backward (b_ok checked first with <=)
    pick_b = b_ok & (~f_ok | (d_b <= d_f))
    pick_f = f_ok & ~pick_b
    chosen = F.when(pick_b, F.col("_b")).when(pick_f, F.col("_f"))
    dist = F.when(pick_b, d_b).when(pick_f, d_f)
    return (
        carried.filter(F.col("_is_left") == 1)
        .withColumn(out_col, chosen["mv"])
        .withColumn(f"{out_col}_at", chosen["mt"])
        .withColumn(f"{out_col}_dist_us", dist.cast("long"))
        .drop("_t", "_is_left", "_rv", "_b", "_f")
    )
