"""Window operators (SURVEY.md §2.5-2.6, §2.12).

``window_last_wins`` is the engine's deterministic replacement for the
reference's HashSet-iteration-order overwrite (OntologyGraphBuilder.java:
225-229,396-401): rank over an explicit order and keep rank 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank under a TOTAL order — without the
    single-partition ``Window.orderBy`` sort that funnels the whole frame
    through one executor.

    Two-pass range-rank: (1) ``repartitionByRange`` on the order columns
    (Spark's distributed-sort primitive — every partition holds a
    contiguous key range) + ``row_number`` within each range; (2) one
    P-row collect of per-partition counts → cumulative offsets,
    broadcast back and added to the local row number.  The offset table
    is |partitions| rows (KB — bounded-driver doctrine), so the global
    sort never materializes on one machine; this is exactly how a
    distributed engine implements ORDER BY + ROW_NUMBER internally.

    ``order_cols`` MUST be a total order (append a unique key to break
    ties) — otherwise tied rows straddling a range boundary would rank
    nondeterministically.  RangePartitioner's boundary sampling is
    seeded per-partition-index, so the two passes see identical ranges.
    """
    ranked, _total = _global_rank_with_total(df, order_cols, rank_col, num_partitions)
    return ranked


def _global_rank_with_total(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Core of the two-pass rank.  Pass 1 range-partitions ONCE to learn
    balanced bucket boundaries (each range's max key) and counts; pass 2
    assigns buckets BY VALUE against those boundary literals.  The
    by-value assignment is the load-bearing subtlety: RangePartitioner
    seeds its boundary sampling with the RDD id, so a second job over
    the same plan draws DIFFERENT ranges — pid-keyed offsets from pass 1
    would silently misalign (observed: interleaved rank collisions).
    Value-keyed buckets are a pure function of the row, identical in
    every job that evaluates them."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cols = [F.col(c) for c in order_cols]
    key = F.struct(*cols)
    # pass 1: balanced range stats — one row per range (KB driver state).
    # Unique keys (total-order contract) make range membership exact:
    # rows <= bound_i live in ranges 0..i, so cumulative counts ARE the
    # by-value offsets no matter how a later job would re-sample ranges.
    stats = (
        df.repartitionByRange(num_partitions, *cols)
        .select(F.spark_partition_id().alias("__gr_pid"), key.alias("__gr_key"))
        .groupBy("__gr_pid")
        .agg(F.count(F.lit(1)).alias("__n"), F.max("__gr_key").alias("__hi"))
        .collect()
    )
    stats.sort(key=lambda r: r["__gr_pid"])
    offsets, acc = [], 0
    for r in stats:
        offsets.append(acc)
        acc += r["__n"]
    bounds = [r["__hi"] for r in stats[:-1]]  # inner boundaries only
    # pass 2: bucket = #boundaries strictly below the key.  Two regimes
    # (round 9, closing the documented O(100)-ranges frontier):
    #   - small |ranges|: a codegen comparison chain over the boundary
    #     struct literals — measured clean at 100 ranges (SCALE.md
    #     §r9-at-10x: no 64 KB fallback at 99 chained struct compares);
    #   - large |ranges|: the chain's codegen size grows O(ranges) and
    #     would eventually trip the 64 KB interpreted fallback, so the
    #     sorted boundaries ride in ONE broadcast row as an array<struct>
    #     and the bucket is found by a FIXED-DEPTH BINARY SEARCH
    #     expressed as a SINGLE aggregate-HOF fold over log2(ranges)
    #     step tokens — the (lo, hi) state is a struct threaded through
    #     the fold, one element_at + struct compare + two CASEs per
    #     step, so both codegen size and per-row cost are O(log ranges).
    #     (A Project-per-step formulation was REJECTED: Catalyst's
    #     CollapseProject inlines each step into the next, doubling the
    #     expression tree per step — optimizer OOM.  A filter-HOF linear
    #     scan was REJECTED on measurement: per-row O(ranges)
    #     interpreted loop, 4.5x slower.)  Measured at
    #     1000 ranges × 1.5M rows (local[8]): filter-HOF linear scan
    #     44.8 s (per-row O(ranges) interpreted loop — wrong shape),
    #     binary-search fold 9.9 s vs 3.1 s at 100 ranges — the residual
    #     gap is the 1000-partition scheduling waves of the range pass,
    #     not the search.
    _CHAIN_MAX = 128
    if len(bounds) <= _CHAIN_MAX:
        bucket = F.lit(0)
        for b in bounds:
            lit_b = F.struct(
                *[F.lit(v).alias(c) for v, c in zip(b, order_cols)]
            )
            bucket = bucket + (key > lit_b).cast("int")
        bounded = df.withColumn("__gr_bkt", bucket)
    else:
        key_schema = df.select(key.alias("__gr_key")).schema["__gr_key"].dataType
        bounds_df = spark.createDataFrame(
            [(list(bounds),)],
            T.StructType(
                [T.StructField("__gr_bounds", T.ArrayType(key_schema), False)]
            ),
        )
        n_b = len(bounds)
        # lower_bound(key <= bounds[i]) as ONE aggregate-HOF fold over
        # ceil(log2(n_b+1)) step tokens: the (lo, hi) state is a struct
        # threaded through the fold, so the WHOLE search is a single
        # constant-size expression.  (A step-per-Project formulation is
        # NOT safe here: Catalyst's CollapseProject inlines each step
        # into the next and the mid/lo/hi references double the tree per
        # step — 2^steps blowup, measured as an optimizer OOM at 300
        # ranges.  The fold keeps one lambda, evaluated iteratively at
        # runtime.)
        steps = max(1, n_b.bit_length())

        def _step(acc, _tok):
            mid = F.floor((acc["lo"] + acc["hi"]) / 2).cast("int")
            probe = F.element_at(
                F.col("__gr_bounds"), F.least(mid + 1, F.lit(n_b)).cast("int")
            )
            active = acc["lo"] < acc["hi"]
            le = key <= probe
            return F.struct(
                F.when(active & ~le, mid + 1).otherwise(acc["lo"]).alias("lo"),
                F.when(active & le, mid).otherwise(acc["hi"]).alias("hi"),
            )

        state = F.aggregate(
            F.sequence(F.lit(1), F.lit(steps)),
            F.struct(
                F.lit(0).cast("int").alias("lo"), F.lit(n_b).cast("int").alias("hi")
            ),
            _step,
        )
        bounded = (
            df.crossJoin(F.broadcast(bounds_df))  # 1-row stats frame, sanctioned
            .withColumn("__gr_bkt", state["lo"].cast("int"))
            .drop("__gr_bounds")
        )
    spark_offsets = spark.createDataFrame(
        list(enumerate(offsets)) or [(0, 0)], "__gr_bkt INT, __gr_off LONG"
    )
    local = bounded.withColumn(
        "__gr_rn", F.row_number().over(Window.partitionBy("__gr_bkt").orderBy(*cols))
    )
    out = (
        local.join(F.broadcast(spark_offsets), on="__gr_bkt")
        .withColumn(rank_col, (F.col("__gr_rn") + F.col("__gr_off")).cast("long"))
        .drop("__gr_bkt", "__gr_rn", "__gr_off")
    )
    return out, acc


def ntile_exact(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``ntile(k)`` semantics — first ``n MOD k`` buckets get
    ``n DIV k + 1`` rows, the rest ``n DIV k`` — computed from the
    two-pass :func:`with_global_rank` instead of a single-partition
    window, so equi-depth binning scales past one executor.  Bit-equal
    to ``ntile(k) OVER (ORDER BY order_cols)`` whenever ``order_cols``
    is a total order (ntile itself is nondeterministic under ties, so
    the gate discipline already requires totality)."""
    ranked, n = _global_rank_with_total(df, order_cols, "__gr_rank", num_partitions)
    # n comes free from the rank pass's offset collect.  SQL ntile
    # front-loads the larger buckets:
    big = n // n_tiles + 1
    small = n // n_tiles
    n_big = n % n_tiles
    cutoff = n_big * big
    r = F.col("__gr_rank")
    if small == 0:
        tile = r  # n < k: each row its own 1..n tile
    else:
        # integer DIV keeps the bucket math BIGINT-exact at any rank
        tile = F.when(
            r <= cutoff, F.expr(f"(__gr_rank - 1) DIV {big}") + 1
        ).otherwise(n_big + F.expr(f"(__gr_rank - 1 - {cutoff}) DIV {small}") + 1)
    return ranked.withColumn(out_col, tile.cast("long")).drop("__gr_rank")
