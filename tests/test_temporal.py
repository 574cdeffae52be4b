"""Temporal operators: bucketized range join + hierarchical time rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.temporal import (
    join_range_bucketed,
    time_rollup,
)


def test_range_join_boundaries_and_fanout(spark):
    pts = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 100), (4, 250), (5, 251)], "pid long, p long"
    )
    iv = spark.createDataFrame(
        [(10, 10, 25), (20, 90, 260)], "interval_id long, s long, e long"
    )
    # bucket width much smaller than interval 20 -> interval spans many
    # buckets; each match must still appear exactly once
    got = {
        (r["pid"], r["interval_id"])
        for r in join_range_bucketed(pts, iv, "p", "s", "e", 7).collect()
    }
    assert got == {(1, 10), (2, 10), (3, 20), (4, 20), (5, 20)}  # both ends inclusive
    # count = set size (no duplicate emissions despite multi-bucket intervals)
    assert join_range_bucketed(pts, iv, "p", "s", "e", 7).count() == len(got)


def test_range_join_empty_and_negative(spark):
    pts = spark.createDataFrame([(1, -15)], "pid long, p long")
    iv = spark.createDataFrame([(10, -20, -10), (20, 0, 5)], "interval_id long, s long, e long")
    rows = join_range_bucketed(pts, iv, "p", "s", "e", 8).collect()
    assert [(r["pid"], r["interval_id"]) for r in rows] == [(1, 10)]


def test_time_rollup_grains_consistent(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:10", "a", 1.5),
            (2, "2024-01-01 00:00:40", "a", 2.5),
            (3, "2024-01-01 00:59:59", "a", 1.0),
            (4, "2024-01-01 01:00:00", "a", 10.0),
            (5, "2024-01-02 05:00:00", "b", 7.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_rollup(df).collect()
    by = {(r["grain"], r["bucket_start"], r["event_type"]): (r["n"], r["total_value"]) for r in out}
    assert by[("minute", "2024-01-01 00:00:00", "a")] == (2, 4.0)
    assert by[("hour", "2024-01-01 00:00:00", "a")] == (3, 5.0)
    assert by[("day", "2024-01-01 00:00:00", "a")] == (4, 15.0)
    assert by[("day", "2024-01-02 00:00:00", "b")] == (1, 7.0)
    # every coarser grain's totals must equal the sum of its finer children
    n_minute = sum(v[0] for k, v in by.items() if k[0] == "minute")
    n_day = sum(v[0] for k, v in by.items() if k[0] == "day")
    assert n_minute == n_day == 5


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    """The whole point of the bucketized formulation: the physical plan must
    be an equi (hash/sort-merge) join, never BroadcastNestedLoopJoin — the
    plan Spark falls back to for raw range predicates and the one that dies
    at scale."""
    pts = spark.range(1000).select(F.col("id").alias("pid"), (F.col("id") * 3).alias("p"))
    iv = spark.range(50).select(
        F.col("id").alias("interval_id"),
        (F.col("id") * 60).alias("s"),
        (F.col("id") * 60 + 30).alias("e"),
    )
    plan = (
        join_range_bucketed(pts, iv, "p", "s", "e", 30)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_range_join_matches_brute_force(spark):
    """Bucketized result == the naive inequality join, across widths."""
    pts = spark.range(200).select(F.col("id").alias("pid"), ((F.col("id") * 37) % 500).alias("p"))
    iv = spark.range(30).select(
        F.col("id").alias("interval_id"),
        ((F.col("id") * 53) % 400).alias("s"),
        ((F.col("id") * 53) % 400 + (F.col("id") % 90)).alias("e"),
    )
    brute = {
        (r["pid"], r["interval_id"])
        for r in pts.crossJoin(iv)
        .filter((F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e")))
        .collect()
    }
    for width in (1, 7, 64, 1000):
        got = {
            (r["pid"], r["interval_id"])
            for r in join_range_bucketed(pts, iv, "p", "s", "e", width).collect()
        }
        assert got == brute, width


def test_ema_integer_matches_python_fold(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.temporal import ema_integer

    rows = [(1, i, v) for i, v in enumerate([10, 20, 6, -7, 3])] + [(2, 0, 100)]
    df = spark.createDataFrame(rows, "k LONG, t LONG, v LONG")
    got = {r.k: (r.n_events, r.ema_units) for r in ema_integer(df, ["k"], ["t"], "v").collect()}

    def ref(vals):
        acc = vals[0]
        for v in vals[1:]:
            q = acc + v
            acc = int(q / 2) if q >= 0 else -((-q) // 2)  # truncate toward zero
        return acc

    assert got[1] == (5, ref([10, 20, 6, -7, 3]))
    assert got[2] == (1, 100)
    # negative-sum step truncates toward zero in BOTH engines: (−7+3 after
    # smoothing history) — spot-check a pure negative sequence
    df2 = spark.createDataFrame([(3, 0, -7), (3, 1, -2)], "k LONG, t LONG, v LONG")
    [r] = ema_integer(df2, ["k"], ["t"], "v").collect()
    assert r.ema_units == -4  # (-7 + -2) = -9 -> trunc(-9/2) = -4


def test_join_asof_forward_semantics(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.asof import join_asof_forward

    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 00:00:00"), (2, "u", "2024-01-05 00:00:00"),
         (3, "v", "2024-01-01 00:00:00")],
        "id LONG, k STRING, lt STRING",
    ).select("id", "k", F.col("lt").cast("timestamp_ntz").alias("lt"))
    right = spark.createDataFrame(
        [("u", "2024-01-03 00:00:00", 30), ("u", "2024-01-03 00:00:00", 10),
         ("u", "2024-01-10 00:00:00", 99)],
        "k STRING, rt STRING, v LONG",
    ).select("k", F.col("rt").cast("timestamp_ntz").alias("rt"), "v")
    out = {r.id: (r.nxt, r.nxt_at) for r in join_asof_forward(
        left, right, "k", "lt", "rt", "v",
        tolerance_seconds=4 * 86400, out_col="nxt",
    ).collect()}
    # id 1: earliest right >= Jan 1 within 4 days is Jan 3; tie keeps MIN v
    assert out[1][0] == 10
    # id 2 (Jan 5): next right is Jan 10 — outside the 4-day tolerance -> NULL
    assert out[2] == (None, None)
    # id 3: key v has no right rows at all -> NULL
    assert out[3] == (None, None)


def test_join_asof_forward_inclusive_at_equal_time(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.asof import join_asof_forward

    left = spark.createDataFrame(
        [(1, "u", "2024-01-03 00:00:00")], "id LONG, k STRING, lt STRING"
    ).select("id", "k", F.col("lt").cast("timestamp_ntz").alias("lt"))
    right = spark.createDataFrame(
        [("u", "2024-01-03 00:00:00", 7)], "k STRING, rt STRING, v LONG"
    ).select("k", F.col("rt").cast("timestamp_ntz").alias("rt"), "v")
    [r] = join_asof_forward(left, right, "k", "lt", "rt", "v", out_col="nxt").collect()
    assert r.nxt == 7  # >= is inclusive


def test_ema_integer_exact_beyond_double_precision(spark):
    """The halving is integral end-to-end (shiftright of an even), so values
    past 2^53 keep the exact cross-engine contract (ADVICE r4): with
    doubles, (2^60 + (2^60+8)) / 2 would round to a multiple of 256."""
    from cell_kn_mvp_etl_ontologies_spark.operators.temporal import ema_integer

    big = 1 << 60
    rows = [("k", 1, big), ("k", 2, big + 8), ("k", 3, -(big + 9))]
    df = spark.createDataFrame(rows, "k STRING, t LONG, v LONG")
    [r] = ema_integer(df, ["k"], ["t"], "v").collect()
    # python reference fold with truncating div
    e = big
    for v in (big + 8, -(big + 9)):
        s = e + v
        e = s // 2 if s >= 0 else -((-s) // 2)  # truncate toward zero
    assert (r.n_events, r.ema_units) == (3, e)


def test_join_asof_nearest_tie_and_tolerance(spark):
    """Nearest as-of: picks the closer side, resolves exact-distance ties
    BACKWARD, respects the tolerance, and dedups right rows per (key, time)
    keeping the min value."""
    from cell_kn_mvp_etl_ontologies_spark.operators.asof import join_asof_nearest

    L = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"),   # backward at 30s, forward at 31s -> backward
         (2, 1, "2024-01-01 11:00:00"),   # exact tie 60s both sides -> backward
         (3, 1, "2024-01-01 12:00:00"),   # only forward inside tolerance
         (4, 1, "2024-01-02 12:00:00"),   # nothing within tolerance
         (5, 2, "2024-01-01 10:00:00")],  # other key: equal-time dup rows -> min value
        "event_id long, k long, ts_s string",
    ).select("event_id", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    R = spark.createDataFrame(
        [(1, "2024-01-01 09:59:30", 100),
         (1, "2024-01-01 10:00:31", 101),
         (1, "2024-01-01 10:59:00", 102),
         (1, "2024-01-01 11:01:00", 103),
         (1, "2024-01-01 12:02:00", 104),
         (2, "2024-01-01 10:00:05", 201),
         (2, "2024-01-01 10:00:05", 200)],
        "k long, t_s string, v long",
    ).select("k", F.col("t_s").cast("timestamp").alias("t"), "v")
    out = {
        r.event_id: (r.near, r.near_dist_us)
        for r in join_asof_nearest(
            L, R, on="k", left_time="ts", right_time="t", right_value="v",
            tolerance_seconds=600, out_col="near",
        ).collect()
    }
    assert out[1] == (100, 30_000_000)
    assert out[2] == (102, 60_000_000)       # tie -> backward
    assert out[3] == (104, 120_000_000)      # only forward in tolerance
    assert out[4] == (None, None)
    assert out[5] == (200, 5_000_000)        # equal-time dedup keeps min value
