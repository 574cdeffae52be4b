"""Scale-pattern operators: snapshot diff (CDC), URL canonicalization,
degree-oriented triangle counting, bitmap distinct sketch, z-order layout."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import (
    bitmap_distinct_rollup,
    bitmap_distinct_words,
)
from cell_kn_mvp_etl_ontologies_spark.operators.curation import canonicalize_url
from cell_kn_mvp_etl_ontologies_spark.operators.incremental import snapshot_diff
from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
    canonical_undirected,
    triangle_count,
)
from cell_kn_mvp_etl_ontologies_spark.sinks.zorder import (
    write_zorder_clustered,
    z_value,
    z_value_sql,
    zorder_cell_stats,
)
from conftest import rows_set


# ---------------------------------------------------------------- snapshot_diff
def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b string")


def test_snapshot_diff_classifies_all_kinds(spark):
    prev = _snap(spark, [(1, "x", "y"), (2, "x", "y"), (3, "x", "y")])
    curr = _snap(spark, [(1, "x", "y"), (2, "CHANGED", "y"), (4, "x", "y")])
    got = rows_set(snapshot_diff(curr, prev, keys=["k"]))
    assert got == {(2, "update"), (3, "delete"), (4, "insert")}
    with_unchanged = rows_set(snapshot_diff(curr, prev, keys=["k"], include_unchanged=True))
    assert (1, "unchanged") in with_unchanged and len(with_unchanged) == 4


def test_snapshot_diff_null_position_swap_is_an_update(spark):
    # ('a', NULL) -> (NULL, 'a') must classify as update: a multi-arg hash
    # would skip NULLs and collide; the to_json fingerprint must not.
    prev = _snap(spark, [(1, "a", None)])
    curr = _snap(spark, [(1, None, "a")])
    got = rows_set(snapshot_diff(curr, prev, keys=["k"]))
    assert got == {(1, "update")}


def test_snapshot_diff_null_to_null_unchanged(spark):
    prev = _snap(spark, [(1, None, None)])
    curr = _snap(spark, [(1, None, None)])
    assert snapshot_diff(curr, prev, keys=["k"]).count() == 0


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string, seq long")


def test_apply_changes_is_order_independent(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.incremental import (
        apply_changes,
        live_view,
    )

    b0 = [(1, "a", "I", 0), (2, "b", "I", 0), (3, "c", "I", 0)]
    b1 = [(2, "b2", "U", 1), (3, "c", "D", 1)]
    b2 = [(3, "c3", "U", 2), (4, "d", "I", 2)]

    def run(order):
        state = _chg(spark, []).limit(0)
        for b in order:
            state = apply_changes(state, _chg(spark, b), ["k"])
        return rows_set(live_view(state))

    want = {(1, "a"), (2, "b2"), (3, "c3"), (4, "d")}
    assert run([b0, b1, b2]) == want
    assert run([b2, b0, b1]) == want  # late-arriving earlier commits
    assert run([b2, b1, b0]) == want


def test_apply_changes_tombstone_blocks_late_update(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.incremental import (
        apply_changes,
        live_view,
    )

    deleted = apply_changes(_chg(spark, []).limit(0), _chg(spark, [(1, "x", "D", 5)]), ["k"])
    late = apply_changes(deleted, _chg(spark, [(1, "old", "U", 3)]), ["k"])
    assert live_view(late).count() == 0  # seq-3 update must NOT resurrect
    # same-seq U + D tie resolves to D (conservative for dedup consumers)
    tied = apply_changes(
        _chg(spark, []).limit(0),
        _chg(spark, [(1, "u", "U", 7), (1, "d", "D", 7)]),
        ["k"],
    )
    assert live_view(tied).count() == 0


# --------------------------------------------------------------- canonicalize_url
def test_canonicalize_url_goldens(spark):
    cases = [
        # (input, canonical)
        ("HTTP://WWW.Example.COM:80/A/B/?z=1&a=2#frag", "http://www.example.com/A/B?a=2&z=1"),
        ("https://example.com:443", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default port kept
        ("http://example.com:443/x", "http://example.com:443/x"),  # 443 is not http's default
        ("https://e.com/p?utm_source=a&utm_medium=b&gclid=1&q=ok", "https://e.com/p?q=ok"),
        ("https://e.com/p?referrer=keep&ref=drop", "https://e.com/p?referrer=keep"),
        ("https://e.com/p///", "https://e.com/p"),
        ("https://e.com/?", "https://e.com/"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "doc_id long, url string"
    )
    got = {r["id"]: r["canonical_url"] for r in canonicalize_url(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_canonicalize_url_is_idempotent(spark):
    # canonical output must be a fixed point: running the canonicalizer on
    # its own output changes nothing (else dedup keys drift per pass)
    urls = [
        "HTTP://WWW.Example.COM:80/A/B/?z=1&a=2#frag",
        "https://example.com:443",
        "https://example.com:8443/x",
        "https://e.com/p?utm_source=a&q=ok&b=1&a=2",
        "http://sub.host.io/path/deep/?x=%20y&y=a+b",
        "https://e.com/p///",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    once = canonicalize_url(df)
    twice = canonicalize_url(
        once.select(F.col("id").alias("doc_id"), F.col("canonical_url").alias("url"))
    )
    assert rows_set(once) == rows_set(twice)


# ---------------------------------------------------------------- triangle_count
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_count_goldens(spark):
    # K4 has 4 triangles; directions/duplicates/self-loops must not matter.
    k4 = [(i, j) for i in range(4) for j in range(4) if i != j] + [(0, 0), (1, 2)]
    assert triangle_count(_edges(spark, k4)).collect()[0]["n_triangles"] == 4
    chain = [(i, i + 1) for i in range(10)]
    assert triangle_count(_edges(spark, chain)).collect()[0]["n_triangles"] == 0


def test_triangle_count_matches_naive_on_hub_graph(spark):
    # Star hub (0 connected to all) + ring among leaves: triangles = ring
    # edges between leaves both adjacent to hub = one per ring edge.
    n = 40
    pairs = [(0, i) for i in range(1, n)] + [(i, i % (n - 1) + 1) for i in range(1, n)]
    edges = canonical_undirected(_edges(spark, pairs))
    fast = triangle_count(edges).collect()[0]["n_triangles"]
    e = edges.alias("e1")
    naive = (
        e.join(edges.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            edges.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
            "left_semi",
        )
        .count()
    )
    assert fast == naive > 0


# ------------------------------------------------------------ event analytics
def test_funnel_steps_goldens(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.temporal import funnel_steps

    rows = [
        # u1 completes the whole funnel in order
        (1, "2024-01-01 00:00:01", "view"), (1, "2024-01-01 00:00:02", "click"),
        (1, "2024-01-01 00:00:03", "purchase"),
        # u2's click precedes its view: stalls at step 1
        (2, "2024-01-01 00:00:01", "click"), (2, "2024-01-01 00:00:02", "view"),
        (2, "2024-01-01 00:00:03", "purchase2"),
        # u3's click shares the view's timestamp: strict > rejects it
        (3, "2024-01-01 00:00:01", "view"), (3, "2024-01-01 00:00:01", "click"),
        # u4 never views
        (4, "2024-01-01 00:00:01", "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, event_type string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = dict(rows_set(funnel_steps(df, "user_id", "ts", "event_type", ["view", "click", "purchase"])))
    assert got == {1: 3, 2: 1, 3: 1}


def test_retention_cohorts_goldens(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.temporal import retention_cohorts

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 10:00:00"),  # same week
        (1, "2024-01-15 10:00:00"),                              # +2 weeks
        (2, "2024-01-01 10:00:00"), (2, "2024-01-08 10:00:00"),  # +1 week
        (3, "2024-01-08 10:00:00"),                              # later cohort
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = rows_set(retention_cohorts(df, "user_id", "ts"))
    assert got == {
        ("2024-01-01", 0, 2), ("2024-01-01", 1, 1), ("2024-01-01", 2, 1),
        ("2024-01-08", 0, 1),
    }


# ------------------------------------------------------------- bitmap distinct
def test_bitmap_distinct_matches_count_distinct(spark):
    rows = [(g, m, (g * 7 + m * 13 + i * i) % 200) for g in range(3) for m in range(4) for i in range(50)]
    df = spark.createDataFrame(rows, "g long, m long, uid long")
    words = bitmap_distinct_words(df, ["g", "m"], "uid")
    got = rows_set(bitmap_distinct_rollup(words, ["g"]))
    want = rows_set(df.groupBy("g").agg(F.countDistinct("uid").cast("long").alias("n")))
    assert got == want


def test_bitmap_distinct_word_boundaries(spark):
    # ids straddling 64-bit word edges, incl. bit 63 (sign bit of BIGINT)
    ids = [0, 1, 63, 64, 127, 128, 4095]
    df = spark.createDataFrame([(1, i) for i in ids] * 3, "g long, uid long")
    got = bitmap_distinct_rollup(bitmap_distinct_words(df, ["g"], "uid"), ["g"]).collect()
    assert got[0]["n_distinct"] == len(ids)


# ------------------------------------------------------------------- z-order
def test_z_value_goldens_and_sql_parity(spark):
    pts = [(x, y) for x in (0, 1, 3, 5, 1023) for y in (0, 2, 5, 777, 1023)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z_value(F.col("x"), F.col("y"))).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y)
    # the SQL twin used by the differential oracle computes the same codes
    sql = duckdb.execute(
        f"SELECT x, y, {z_value_sql('x', 'y')} AS z FROM (SELECT unnest(?) AS x, unnest(?) AS y)",
        [[p[0] for p in pts], [p[1] for p in pts]],
    ).fetchall()
    for x, y, z in sql:
        assert z == morton(x, y)


def test_zorder_cells_are_prefix_consistent(spark, tmp_path):
    df = spark.range(0, 2000).select(
        (F.col("id") % 1024).alias("x"), (F.col("id") * 31 % 1024).alias("y")
    )
    back = write_zorder_clustered(df, str(tmp_path / "z"), "x", "y", bits=10, prefix_shift=14)
    assert back.count() == 2000
    # every row's recomputed z-prefix equals its stored cell
    mismatched = back.filter(
        F.shiftright(z_value(F.col("x"), F.col("y")), 14) != F.col("cell")
    ).count()
    assert mismatched == 0
    stats = zorder_cell_stats(back, "x", "y", box=(0, 64, 0, 64)).collect()
    assert sum(r["n"] for r in stats) == 2000
    # cells partition the z-space into axis-aligned boxes no wider than the
    # prefix cell: 14-bit suffix => 2^7 x 2^7 cell extent
    for r in stats:
        assert r["max_x"] - r["min_x"] < 128 and r["max_y"] - r["min_y"] < 128


def test_apply_changes_random_changelogs_are_order_independent(spark):
    """Property: for a random changelog, every batch permutation and
    re-bundling reaches the same live view — plus a pure-Python oracle."""
    import itertools
    import random

    from cell_kn_mvp_etl_ontologies_spark.operators.incremental import (
        apply_changes,
        live_view,
    )

    rng = random.Random(42)
    for trial in range(3):
        # unique (key, seq) pairs with random ops/payloads
        pairs = rng.sample([(k, s) for k in range(6) for s in range(5)], 14)
        rows = [
            (k, f"v{k}_{s}", rng.choice("IUD"), s) for k, s in pairs
        ]
        # python oracle: max seq per key, D wins ties (unique seqs here), live = op != D
        latest = {}
        for k, v, op, s in rows:
            if k not in latest or s > latest[k][1]:
                latest[k] = (v, s, op)
        want = {(k, v) for k, (v, s, op) in latest.items() if op != "D"}

        chunks = [rows[i::3] for i in range(3)]  # arbitrary re-bundling
        results = set()
        for perm in itertools.permutations(range(3)):
            state = _chg(spark, []).limit(0)
            for i in perm:
                state = apply_changes(state, _chg(spark, chunks[i]), ["k"])
            results.add(frozenset(rows_set(live_view(state))))
        assert results == {frozenset(want)}, f"trial {trial}"


def test_maintain_group_agg_moves_and_drops_groups(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.incremental import (
        cdc_delta_rows,
        maintain_group_agg,
    )

    agg0 = spark.createDataFrame(
        [("a", 2, 30.0), ("b", 1, 5.0)], "g string, n long, total double"
    ).withColumn("total", F.col("total").cast("decimal(18,6)"))
    # one row moves a->c (group-moving update), b's only row is deleted,
    # and a brand-new group d appears
    changelog = spark.createDataFrame(
        [
            ("U", "a", 10.0, "c", 12.0),
            ("D", "b", 5.0, None, None),
            ("I", None, None, "d", 7.0),
        ],
        "op string, before_g string, before_v double, after_g string, after_v double",
    ).select(
        "op", "before_g", F.col("before_v").cast("decimal(18,6)").alias("before_v"),
        "after_g", F.col("after_v").cast("decimal(18,6)").alias("after_v"),
    )
    deltas = cdc_delta_rows(changelog, ["g", "v"])
    out = maintain_group_agg(agg0, deltas, ["g"], "v")
    got = {r["g"]: (r["n"], float(r["total"])) for r in out.collect()}
    # a keeps one row (30 - 10), b vanishes, c and d appear
    assert got == {"a": (1, 20.0), "c": (1, 12.0), "d": (1, 7.0)}
