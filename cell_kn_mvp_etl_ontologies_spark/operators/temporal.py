"""Temporal operators: bucketized range join + hierarchical time rollup
(SURVEY.md §2.12 extension surface).

Spark has no native interval/range join or continuous aggregate; these are
the standard scale-safe formulations:

- ``join_range_bucketed`` turns a range predicate into an equi-join on a
  bucket id (plus an exact refine filter), so Catalyst plans a hash join
  with a bounded fan-out instead of a broadcast-nested-loop cartesian.
- ``time_rollup`` computes the finest grain from the raw stream ONCE, then
  derives every coarser grain from the next-finer aggregate — the
  hypertable / continuous-aggregate cascade.  Only the first aggregation
  shuffles fact-scale data; the re-aggs shuffle grain-cardinality rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_range_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """All (point, interval) matches with ``start <= point <= end`` as an
    equi-join: intervals explode to every ``bucket_width``-sized bucket they
    overlap, points map to exactly one bucket, the join key is the bucket id
    and the exact range predicate refines.

    Each point lives in ONE bucket, so matches are emitted exactly once — no
    post-join distinct.  Fan-out is ceil(interval_len / width) + 1 rows per
    interval: pick ``bucket_width`` near the typical interval length so the
    explode stays O(|intervals|) while each bucket join stays selective.
    Long-tail intervals (>> width) are the skew risk at scale — cap their
    fan-out by splitting oversized intervals upstream or raising width.
    All columns of both inputs pass through; numeric (cast timestamps to
    epoch seconds first).
    """
    w = F.lit(bucket_width).cast("long")
    p = points.withColumn("_bucket", (F.col(point_col).cast("long") / w).cast("long"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col).cast("long") / w).cast("long"),
                (F.col(end_col).cast("long") / w).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, on="_bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hierarchical time-bucketed aggregate: (grain, bucket_start, key, n,
    total_value) for each grain, each coarser grain re-aggregated from the
    next finer one.

    ``grains`` must be ordered finest → coarsest (each a valid
    ``date_trunc`` unit).  The raw stream is aggregated exactly once (at the
    finest grain); the cascade re-aggs shuffle only grain-cardinality rows —
    at 100 TB that is the difference between one wide shuffle and
    len(grains) of them.  Sums carry DECIMAL(18,6) through the cascade
    (exact, associative) and surface as DOUBLE.
    """
    finest = grains[0]
    cur = (
        events.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("_bucket"), F.col(key_col)
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_total"),
        )
    )
    return rollup_cascade(cur, grains, key_col)


def rollup_cascade(
    finest: DataFrame, grains: tuple[str, ...], key_col: str = "event_type"
) -> DataFrame:
    """Derive every coarser grain from a finest-grain aggregate
    (``(_bucket TIMESTAMP, key, n, _total DECIMAL)``) and union the levels.

    Split out of ``time_rollup`` so a STREAMING job can maintain the finest
    grain incrementally (watermarked state, one row per bucket×key) while
    this batch cascade derives hour/day views from it — the
    continuous-aggregate maintenance pattern.
    """
    cur = finest
    levels = [cur.withColumn("grain", F.lit(grains[0]))]
    for grain in grains[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(grain, F.col("_bucket")).alias("_bucket"), F.col(key_col)
            ).agg(F.sum("n").alias("n"), F.sum("_total").alias("_total"))
        )
        levels.append(cur.withColumn("grain", F.lit(grain)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "grain",
        F.date_format("_bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        key_col,
        F.col("n").cast("long").alias("n"),
        F.col("_total").cast("double").alias("total_value"),
    )


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: how many users complete step 1, then step 2
    strictly later, then step 3 strictly later, ... (the exists-an-ordered-
    subsequence semantics every event-analytics store ships).

    One groupBy(user) collects the user's (ts, type) events into a sorted
    array; a single ``F.aggregate`` fold walks it greedily — matching each
    step at its earliest possible time, which is optimal for subsequence
    existence, and requiring strict ts increase between steps.  The fold is
    a JVM-side higher-order expression: no UDF, no per-step self-join, ONE
    keyed shuffle total (an N-step funnel via joins is N fact-scale
    shuffles).  Per-user state is the event array — bounded by per-user
    activity; cap with a windowed top-K by ts for adversarial whale users.

    Output: (step BIGINT 1..len(steps), n_users BIGINT reaching that step).
    """
    ev = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
    )
    state0 = F.struct(
        F.lit(0).alias("step"), F.lit(None).cast("timestamp").alias("last_ts")
    )

    def advance(st, e):
        cond = None
        for i, step_type in enumerate(steps):
            c = (st["step"] == i) & (e["et"] == step_type)
            if i > 0:  # later steps must be strictly later in time
                c = c & (e["ts"] > st["last_ts"])
            cond = c if cond is None else (cond | c)
        return F.when(
            cond,
            F.struct((st["step"] + 1).alias("step"), e["ts"].alias("last_ts")),
        ).otherwise(st)

    per_user = events.groupBy(user_col).agg(
        F.aggregate(ev, state0, advance, lambda st: st["step"]).alias("reached")
    )
    counts = per_user.agg(
        *[
            F.sum((F.col("reached") >= i + 1).cast("long")).alias(f"s{i + 1}")
            for i in range(len(steps))
        ]
    )
    stack = ", ".join(f"{i + 1}L, s{i + 1}" for i in range(len(steps)))
    return counts.selectExpr(f"stack({len(steps)}, {stack}) AS (step, n_users)")


def retention_cohorts(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week (cohort),
    counted in each later week they were active.

    Two grain reductions before anything joins: first-seen per user (one
    keyed agg) and distinct (user, week) activity (one agg at user-week
    cardinality, partial-aggregated map-side).  The cohort join is then
    user-keyed on both sides — co-partitioned with the activity dedup, so
    AQE plans it without an extra exchange; nothing fact-scale shuffles
    twice.  Output: (cohort_week STRING, week_offset BIGINT, n_users BIGINT).
    """
    week = lambda c: F.date_trunc("week", F.col(c))  # noqa: E731  ISO Monday start
    first_seen = events.groupBy(user_col).agg(
        F.min(week(ts_col)).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col), week(ts_col).alias("active_week")
    ).distinct()
    joined = active.join(first_seen, on=user_col)
    return (
        joined.groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


def gap_fill_interpolate(
    obs: DataFrame, key_col: str, bucket_col: str, value_col: str
) -> DataFrame:
    """Densify a bucketized series per key and linearly interpolate missing
    buckets — the time-series ``gap fill`` / ``interpolate`` resample shape
    (TimescaleDB's time_bucket_gapfill + interpolate, which the reference
    family of ETL pipelines applies to versioned ontology release series).

    ``obs`` has ONE row per (key, bucket) with ``value_col`` in integer
    micro-units (BIGINT).  Output is the dense min..max bucket grid per key
    with ``value_units`` = observed value, or the linear interpolation
    between the nearest observed neighbours, and an ``interpolated`` flag.

    Exactness: interpolation is floor((pv*(nb-b) + nv*(b-pb)) / (nb-pb))
    computed in DOUBLE; numerator stays < 2^53 for micro-unit values below
    ~1e3 units × 1e6 scale × 1e3-bucket gaps, so the floor is bit-exact and
    cross-engine hash-stable.

    Scale: the grid explode is bounded by span length per key (a sequence()
    per key row, no shuffle); the fill itself is two single-partition-key
    window passes (one ordering, Spark fuses both frames over one sort), so
    the whole operator is one shuffle on ``key_col``.  Skewed span lengths
    (one key spanning years at second grain) are the risk at scale — bucket
    coarsening or span capping upstream, not this operator, addresses that.
    """
    from pyspark.sql import Window

    k, b, v = F.col(key_col), F.col(bucket_col), F.col(value_col)
    span = obs.groupBy(key_col).agg(
        F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1")
    )
    grid = span.select(
        key_col, F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias(bucket_col)
    )
    j = grid.join(obs, [key_col, bucket_col], "left")
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(v.isNotNull(), b)
    f = j.select(
        k.cast("long").alias(key_col),
        b.cast("long").alias(bucket_col),
        v.alias("_v"),
        F.last(v, ignorenulls=True).over(w_prev).alias("_pv"),
        F.last(obs_bucket, ignorenulls=True).over(w_prev).alias("_pb"),
        F.first(v, ignorenulls=True).over(w_next).alias("_nv"),
        F.first(obs_bucket, ignorenulls=True).over(w_next).alias("_nb"),
    )
    interp = F.floor(
        (
            F.col("_pv") * (F.col("_nb") - F.col(bucket_col))
            + F.col("_nv") * (F.col(bucket_col) - F.col("_pb"))
        )
        / (F.col("_nb") - F.col("_pb")).cast("double")
    )
    return f.select(
        key_col,
        bucket_col,
        F.when(F.col("_v").isNotNull(), F.col("_v"))
        .otherwise(interp)
        .cast("long")
        .alias("value_units"),
        F.col("_v").isNull().alias("interpolated"),
    )


def ema_integer(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key exponential smoothing (alpha = 1/2) over the time-ordered
    value sequence, in pure integer arithmetic: ema_1 = v_1, ema_n =
    (ema_{n-1} + v_n) div 2 with TRUNCATING division — the same semantics
    as DuckDB's ``//`` (truncate toward zero; ``%`` takes the dividend's
    sign), so the smoothed value is bit-exact cross-engine for any sign.
    The halving stays INTEGRAL end-to-end: t - t%2 is even and truncates t
    toward the even below it, and an arithmetic shiftright(even, 1) is
    exact division by 2 for either sign — no double division anywhere, so
    exactness holds for the full int64 range, not just |t| <= 2^53
    (ADVICE r4).

    Shape: ONE keyed shuffle (collect_list + sort_array), then the fold is
    a per-row ``aggregate()`` expression over the sorted array — recursive
    state (each step depends on the previous) is exactly what windows
    cannot express and a fold can.  Per-key state is that key's full
    sequence: the standard whale caveat — cap a key's history upstream
    (windowed top-K by recency) before smoothing unbounded keys.

    Output: key_cols + (n_events BIGINT, ema_units BIGINT).
    """
    ordered = F.sort_array(
        F.collect_list(F.struct(*[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                                F.col(value_col).alias("v")))
    )
    g = df.groupBy(*key_cols).agg(
        ordered.alias("xs"), F.count(F.lit(1)).cast("long").alias("n_events")
    )
    vals = F.transform(F.col("xs"), lambda s: s["v"])
    fold = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.shiftright((acc + x) - ((acc + x) % 2), 1),
    )
    return g.select(*key_cols, "n_events", fold.alias("ema_units"))


def ohlc_rollup(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 86400,
    scale: int = 1_000_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Open/high/low/close candle rollup per (key, time bucket) — the
    financial/telemetry resample shape (TimescaleDB ``candlestick_agg``,
    kdb-style bar builds) recast as one window pass + one aggregation.

    Determinism is the whole contract: "open" and "close" are FIRST/LAST
    by event time, and event-time ties are broken by ``tiebreak_col``
    (unique within a key, e.g. the event id) so the chosen row is a pure
    function of the data, never of partition order — the same doctrine as
    the md5-keyed samplers.  Values are floor-quantized to integer
    micro-units BEFORE any aggregation, so min/max/first/last/sum are
    bit-exact across engines.

    Shape: ONE shuffle on (key, bucket); the open/close window and the
    high/low/sum aggregation share that partitioning (the window sort and
    the partial aggregation both run inside it).  Buckets are derived by
    pure calendar arithmetic over TIMESTAMP_NTZ (timestampdiff from the
    epoch — no session-timezone dependence).  Skew: a whale (key, bucket)
    cell degrades to one big sort task; coarse keys should pre-salt the
    high/low/sum part (agg_salted_hot_key) and keep open/close via the
    per-cell min/max of (ts, tiebreak) — not needed at gate scale.

    Output: (key, bucket, open/high/low/close units BIGINT, n_obs, sum_units).
    """
    from pyspark.sql import Window

    epoch_s = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    units = F.floor(F.col(value_col).cast("double") * scale).cast("long")
    tb = [F.col(tiebreak_col).asc()] if tiebreak_col else []
    base = df.select(
        F.col(key_col).cast("long").alias("key"),
        F.floor(epoch_s / bucket_seconds).cast("long").alias("bucket"),
        F.col(ts_col).alias("_ts"),
        *( [F.col(tiebreak_col).alias("_tb")] if tiebreak_col else [] ),
        units.alias("_v"),
    )
    order = [F.col("_ts").asc()] + ([F.col("_tb").asc()] if tiebreak_col else [])
    w = (
        Window.partitionBy("key", "bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    framed = base.select(
        "key",
        "bucket",
        "_v",
        F.first("_v").over(w).alias("_open"),
        F.last("_v").over(w).alias("_close"),
    )
    return framed.groupBy("key", "bucket").agg(
        F.first("_open").cast("long").alias("open_units"),
        F.max("_v").cast("long").alias("high_units"),
        F.min("_v").cast("long").alias("low_units"),
        F.first("_close").cast("long").alias("close_units"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_v").cast("long").alias("sum_units"),
    )


def rolling_anomaly_integer(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int = 7,
    k: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Rolling z-score anomaly screen in PURE int64 arithmetic — the
    streaming-telemetry cousin of ``filter_outlier_mad`` (that one is
    per-group global; this flags each event against its own trailing
    window).

    The z² > k² test is cleared of divisions entirely:
        z² = (v·n − S)² / (n·S2 − S²)         (S, S2 = window sum, sum sq)
        flag ⇔ (v·n − S)² > k² · (n·S2 − S²)
    Every factor is an exact int64 on milli-quantized values (envelope:
    |v| ≤ ~2·10⁶ milli-units keeps both sides < 2^60 at n ≤ 16) — no
    float variance, no sqrt, bit-exact cross-engine.  The window is the n
    PRECEDING events (current row excluded, so a spike can't mask
    itself); rows with fewer than n predecessors emit flag = false with
    win_n reported (the cold-start contract, explicit rather than NULL).

    Shape: ONE shuffle on key, one ordered window pass computing count,
    sum, and sum-of-squares over the same frame.  Whale keys degrade to a
    long sorted partition — the standard window caveat; bucket the key by
    time first when a single entity's history outgrows a task.

    Output: key, order cols, v_units, win_n, win_sum, win_sumsq,
    is_anomaly.
    """
    from pyspark.sql import Window

    v = F.floor(F.col(value_col).cast("double") * scale).cast("long")
    base = df.select(
        F.col(key_col).cast("long").alias(key_col),
        *[F.col(c) for c in order_cols],
        v.alias("v_units"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-n, -1)
    )
    stats = base.select(
        key_col,
        *order_cols,
        "v_units",
        F.count("v_units").over(w).cast("long").alias("win_n"),
        F.sum("v_units").over(w).cast("long").alias("win_sum"),
        F.sum(F.col("v_units") * F.col("v_units")).over(w).cast("long").alias("win_sumsq"),
    )
    lhs = (F.col("v_units") * n - F.col("win_sum"))
    rhs = F.lit(k * k) * (F.lit(n) * F.col("win_sumsq") - F.col("win_sum") * F.col("win_sum"))
    return stats.select(
        key_col,
        *order_cols,
        "v_units",
        "win_n",
        F.coalesce("win_sum", F.lit(0)).alias("win_sum"),
        F.coalesce("win_sumsq", F.lit(0)).alias("win_sumsq"),
        F.when(F.col("win_n") == n, (lhs * lhs) > rhs).otherwise(F.lit(False)).alias("is_anomaly"),
    )


def ohlc_partial(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int = 86400,
    scale: int = 1_000_000,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """MERGEABLE partial state for OHLC candles: per (key, bucket) the
    open/close carried as full (ts, tiebreak, units) structs — min/max
    under Spark's lexicographic struct order, so merging two partials is
    the SAME min/max/sum aggregation (associative + commutative; the
    result is independent of how rows split across partials, which is what
    lets a stream maintain candles one micro-batch at a time and a 100 TB
    backfill union per-shard partials).  ``ohlc_finalize`` merges and
    projects the candle; ``ohlc_rollup(df) == ohlc_finalize(ohlc_partial
    (df))`` by construction — the window formulation and the struct-extrema
    formulation pick the same rows because (ts, tiebreak) is a total
    order."""
    epoch_s = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    units = F.floor(F.col(value_col).cast("double") * scale).cast("long")
    tb = F.col(tiebreak_col).cast("long") if tiebreak_col else F.lit(0).cast("long")
    base = df.select(
        F.col(key_col).cast("long").alias("key"),
        F.floor(epoch_s / bucket_seconds).cast("long").alias("bucket"),
        F.struct(
            F.col(ts_col).alias("ts"), tb.alias("tb"), units.alias("v")
        ).alias("_ev"),
        units.alias("_v"),
    )
    return base.groupBy("key", "bucket").agg(
        F.min("_ev").alias("o"),
        F.max("_ev").alias("c"),
        F.max("_v").cast("long").alias("high_units"),
        F.min("_v").cast("long").alias("low_units"),
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_v").cast("long").alias("sum_units"),
    )


def ohlc_merge(partials: DataFrame) -> DataFrame:
    """Merge OHLC partial states (same schema as ``ohlc_partial`` output)
    to one row per (key, bucket) — the re-aggregation a streaming
    foreachBatch runs per micro-batch and a sharded backfill runs once."""
    return partials.groupBy("key", "bucket").agg(
        F.min("o").alias("o"),
        F.max("c").alias("c"),
        F.max("high_units").cast("long").alias("high_units"),
        F.min("low_units").cast("long").alias("low_units"),
        F.sum("n_obs").cast("long").alias("n_obs"),
        F.sum("sum_units").cast("long").alias("sum_units"),
    )


def ohlc_finalize(partials: DataFrame) -> DataFrame:
    """Merge + project the candle: (key, bucket, open/high/low/close units,
    n_obs, sum_units) — the ``ohlc_rollup`` output contract."""
    m = ohlc_merge(partials)
    return m.select(
        "key",
        "bucket",
        F.col("o.v").cast("long").alias("open_units"),
        "high_units",
        "low_units",
        F.col("c.v").cast("long").alias("close_units"),
        "n_obs",
        "sum_units",
    )


def holt_linear_integer(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (alpha = beta = 1/2) in
    pure integer arithmetic — the TREND-AWARE sibling of
    :func:`ema_integer` (EMA lags a trending series by construction;
    Holt carries an explicit trend state):

        level_1 = v_1,                      trend_1 = 0
        level_n = (level_{n-1} + trend_{n-1} + v_n) trunc-div 2
        trend_n = (trend_{n-1} + (level_n − level_{n-1})) trunc-div 2

    Truncating halving uses the sign-safe ``shiftright(x − x%2, 1)``
    identity (exact for either sign over the full int64 range — the
    ema_integer ADVICE-r4 trick); DuckDB's ``//`` truncates identically,
    so the two-state fold is bit-exact cross-engine.

    Shape: ONE keyed shuffle (collect_list + sort_array), then a per-row
    ``aggregate()`` fold with a STRUCT accumulator — coupled recursive
    state is exactly what windows cannot express and a fold can.  Same
    whale caveat as ema_integer: cap a key's history upstream.

    Output: key_cols + (n_events, level_units, trend_units,
    forecast_units = level + trend — the 1-step-ahead Holt forecast).
    """

    def half(x: Column) -> Column:
        return F.shiftright(x - (x % 2), 1)

    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
                F.col(value_col).alias("v"),
            )
        )
    )
    g = df.groupBy(*key_cols).agg(
        ordered.alias("xs"), F.count(F.lit(1)).cast("long").alias("n_events")
    )
    vals = F.transform(F.col("xs"), lambda s: s["v"])
    init = F.struct(
        F.element_at(vals, 1).cast("long").alias("l"),
        F.lit(0).cast("long").alias("t"),
    )

    def step(acc: Column, x: Column) -> Column:
        new_l = half(acc["l"] + acc["t"] + x)
        return F.struct(
            new_l.alias("l"), half(acc["t"] + new_l - acc["l"]).alias("t")
        )

    fold = F.aggregate(F.slice(vals, 2, F.size(vals) - 1), init, step)
    return g.select(
        *key_cols,
        "n_events",
        fold["l"].cast("long").alias("level_units"),
        fold["t"].cast("long").alias("trend_units"),
        (fold["l"] + fold["t"]).cast("long").alias("forecast_units"),
    )
