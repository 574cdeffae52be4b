"""Unit tests for the §2.12 extension operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.asof import join_asof
from cell_kn_mvp_etl_ontologies_spark.operators.dedup import (
    dedup_exact_hash,
    dedup_minhash_lsh,
    ngram_jaccard_pairs,
    simhash16,
)
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    cosine_join_quantized,
    similarity_topk,
)
from cell_kn_mvp_etl_ontologies_spark.operators.text_analysis import quality_score, token_counts
from cell_kn_mvp_etl_ontologies_spark.search.analyzers import char_ngrams, edge_ngrams


def test_char_ngrams_golden(spark):
    out = (
        spark.createDataFrame([("abcdef",)], "s: string")
        .select(char_ngrams(F.col("s"), 3, 4, True).alias("g"))
        .first()["g"]
    )
    assert out == ["abc", "bcd", "cde", "def", "abcd", "bcde", "cdef", "abcdef"]


def test_char_ngrams_short_string(spark):
    out = (
        spark.createDataFrame([("ab",)], "s: string")
        .select(char_ngrams(F.col("s"), 3, 4, True).alias("g"))
        .first()["g"]
    )
    assert out == ["ab"]  # too short for any gram; preserveOriginal keeps it


def test_edge_ngrams_golden(spark):
    out = (
        spark.createDataFrame([("customers",)], "s: string")
        .select(edge_ngrams(F.col("s"), 3, 6, True).alias("g"))
        .first()["g"]
    )
    # len 9 > n_max 6: preserveOriginal appends the whole token
    assert out == ["cus", "cust", "custo", "custom", "customers"]
    out12 = (
        spark.createDataFrame([("abcdefghijklmnop",)], "s: string")
        .select(edge_ngrams(F.col("s"), 3, 12, True).alias("g"))
        .first()["g"]
    )
    assert out12[-1] == "abcdefghijklmnop"  # longer than n_max: original kept


def test_dedup_exact_hash(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id: long, text: string"
    )
    out = {r["keep_id"]: r["n_copies"] for r in dedup_exact_hash(df, "text", "id").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_finds_exact_dups(spark):
    rows = [(i, f"completely different document number {i} with words") for i in range(8)]
    rows.append((100, rows[0][1]))  # exact copy of doc 0
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = {
        (r["a"], r["b"])
        for r in dedup_minhash_lsh(df, "text", "doc_id", 5, None, 6, 3).collect()
    }
    assert (0, 100) in pairs


def test_simhash_identical_texts_equal(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zzz qqq xxx www")],
        "id: long, text: string",
    )
    out = {r["id"]: r["simhash"] for r in simhash16(df, "text", "id").collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] < 2**16


def test_ngram_jaccard_exact_dup_is_one(spark):
    df = spark.createDataFrame(
        [(1, "abcabcabc"), (2, "abcabcabc"), (3, "xyzxyzxyz")], "id: long, text: string"
    )
    out = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, "text", "id").collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out  # no shared shingles


def test_cosine_quantized_self_similarity(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [1.0, 0.0, 0.0])],
        "vec_id: long, embedding: array<float>",
    )
    out = {
        (r["q_id"], r["t_id"]): r["cos"] for r in cosine_join_quantized(df, df).collect()
    }
    assert out[(1, 3)] == pytest.approx(1.0)
    assert out[(1, 2)] == pytest.approx(0.0)
    top = similarity_topk(df, df, k=1).select("q_id", "t_id").collect()
    assert {(r["q_id"], r["t_id"]) for r in top} >= {(1, 3), (3, 1)}


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame([(1, "the cat, sat!")], "doc_id: long, text: string")
    tc = token_counts(df, "text", "doc_id").first()
    assert tc["n_ws_tokens"] == 3
    assert tc["n_bpe_tokens"] == 5  # the/cat/,/sat/!
    q = quality_score(df, "text", "doc_id").first()
    assert 0.0 <= q["quality"] <= 1.0
    assert q["n_tokens"] == 3


def test_join_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 50), (4, 99, 500)],
        "event_id: long, user_id: long, t: long",
    )
    right = spark.createDataFrame(
        [(10, 100, 7), (10, 200, 8), (11, 100, 9)], "user_id: long, rt: long, val: long"
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in join_asof(left, right, "user_id", "t", "rt", "val").collect()
    }
    assert out[1] == 7   # exact-time match included (<=)
    assert out[2] == 8   # latest at-or-before 205
    assert out[3] is None  # before any right row
    assert out[4] is None  # no right rows for user 99


# ---------------------------------------------------------------------------
# sessionization / SCD2 / wide pivot (round-2 additions)
# ---------------------------------------------------------------------------
def test_sessionize_gaps_and_islands(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators import window_sessionize

    rows = [
        # user a: 3 events within gaps, then a >600s gap -> 2 sessions
        ("a", 1, 1000), ("a", 2, 1100), ("a", 3, 1500),
        ("a", 4, 5000), ("a", 5, 5400),
        # user b: single event -> 1 session
        ("b", 6, 42),
    ]
    df = spark.createDataFrame(rows, "user string, eid long, t long")
    out = window_sessionize(df, ["user"], "t", 600, tiebreak_cols=["eid"])
    got = {(r.user, r.eid): r.session_id for r in out.collect()}
    assert got == {
        ("a", 1): 1, ("a", 2): 1, ("a", 3): 1,
        ("a", 4): 2, ("a", 5): 2,
        ("b", 6): 1,
    }


def test_sessionize_single_shuffle(spark):
    """Both window passes share one partitioning+ordering: the physical plan
    must contain exactly ONE (non-broadcast) exchange."""
    from cell_kn_mvp_etl_ontologies_spark.operators import window_sessionize

    df = spark.createDataFrame([("a", 1, 10)], "user string, eid long, t long")
    out = window_sessionize(df, ["user"], "t", 600, tiebreak_cols=["eid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_ex = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
    assert n_ex == 1, plan
    assert plan.count("Sort ") <= 1, plan


def test_sessionize_timestamp_tie_straddling_boundary(spark):
    """Ties on the timestamp resolve by the tiebreak column even when the
    session boundary lands inside the tie group."""
    from cell_kn_mvp_etl_ontologies_spark.operators import window_sessionize

    rows = [("u", 2, 10000), ("u", 1, 100), ("u", 3, 10000)]
    df = spark.createDataFrame(rows, "user string, eid long, t long")
    out = window_sessionize(df, ["user"], "t", 600, tiebreak_cols=["eid"])
    got = {r.eid: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2}


def test_scd2_intervals_chain(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators import join_upsert_scd2

    base = spark.createDataFrame(
        [("k1", 10.0, "1995-01-01"), ("k2", 20.0, "1995-01-01")],
        "key string, bal double, valid_from string",
    )
    upd = spark.createDataFrame(
        [("k1", 11.0, "1996-01-01"), ("k1", 12.0, "1997-01-01")],
        "key string, bal double, valid_from string",
    )
    out = join_upsert_scd2(base, upd, ["key"], "valid_from").collect()
    k1 = sorted((r for r in out if r.key == "k1"), key=lambda r: r.valid_from)
    assert [(r.bal, r.valid_from, r.valid_to, r.is_current) for r in k1] == [
        (10.0, "1995-01-01", "1996-01-01", False),
        (11.0, "1996-01-01", "1997-01-01", False),
        (12.0, "1997-01-01", None, True),
    ]
    (k2,) = [r for r in out if r.key == "k2"]
    assert k2.valid_to is None and k2.is_current


def test_pivot_wide_matches_conditional_agg(spark):
    from pyspark.sql import functions as F

    from cell_kn_mvp_etl_ontologies_spark.operators import agg_pivot_wide

    rows = [("u1", "x", 1.0), ("u1", "x", 2.0), ("u1", "y", 5.0), ("u2", "y", 7.0)]
    df = spark.createDataFrame(rows, "user string, kind string, v double")
    piv = agg_pivot_wide(
        df, ["user"], "kind", ["x", "y", "z"],
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("t"),
    )
    got = {r.user: r.asDict() for r in piv.collect()}
    assert got["u1"]["x_n"] == 2 and got["u1"]["x_t"] == 3.0
    assert got["u1"]["y_n"] == 1 and got["u1"]["y_t"] == 5.0
    # absent pivot cell -> NULL (catalog query coalesces to 0)
    assert got["u2"]["x_n"] is None and got["u2"]["z_t"] is None


def test_approx_distinct_within_error_bound_of_exact(spark):
    """Tighter (1σ) evidence behind agg_approx_distinct's bounded-error
    gate — Spark's HLL++ estimate must land within ±5% of the exact
    bitmap-twin count (default rsd is 5%; the gate itself allows 4σ and
    hashes the boolean; both run on the same sf0.01 events table)."""
    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import (
        bitmap_distinct_rollup,
        bitmap_distinct_words,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    approx = ev.agg(
        F.approx_count_distinct("user_id").alias("a_users"),
        F.approx_count_distinct("event_type").alias("a_types"),
    ).head()
    words = bitmap_distinct_words(ev, ["event_type"], "user_id")
    exact_users = bitmap_distinct_rollup(words, []).head()["n_distinct"]
    exact_types = ev.select("event_type").distinct().count()
    assert abs(approx.a_users - exact_users) <= 0.05 * exact_users
    assert abs(approx.a_types - exact_types) <= max(1, 0.05 * exact_types)


# --------------------------------------------------------------------------
# ntile_exact / with_global_rank — two-pass distributed equi-depth binning
# --------------------------------------------------------------------------
def test_ntile_exact_matches_sql_ntile(spark):
    """The two-pass range-rank ntile must be bit-equal to
    ntile(k) OVER (ORDER BY ...) for sizes exercising every branch of
    the front-loaded bucket formula: n % k == 0, n % k != 0, n < k."""
    from pyspark.sql import Window

    from cell_kn_mvp_etl_ontologies_spark.operators.windows import ntile_exact

    for n, k in [(100, 10), (103, 10), (7, 10), (33, 4), (1, 3)]:
        # non-monotone values with a unique tiebreak key
        df = spark.range(n).select(
            F.col("id").alias("key"), ((F.col("id") * 37) % 11).alias("v")
        )
        want = {
            (r.key, r.tile)
            for r in df.select(
                "key", F.ntile(k).over(Window.orderBy("v", "key")).alias("tile")
            ).collect()
        }
        got = {
            (r.key, r.tile)
            for r in ntile_exact(df, k, ["v", "key"], "tile").collect()
        }
        assert got == want, (n, k)


def test_with_global_rank_is_dense_and_ordered(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.windows import with_global_rank

    df = spark.range(500).select(
        F.col("id").alias("key"), ((F.col("id") * 13) % 97).alias("v")
    )
    rows = with_global_rank(df, ["v", "key"], "r").orderBy("r").collect()
    assert [x.r for x in rows] == list(range(1, 501))
    assert [(x.v, x.key) for x in rows] == sorted((x.v, x.key) for x in rows)


def test_ntile_exact_plan_has_no_single_partition_sort(spark):
    """The point of the operator: no Exchange SinglePartition feeding the
    binning — the sort is a range repartition."""
    from cell_kn_mvp_etl_ontologies_spark.operators.windows import ntile_exact

    df = spark.range(1000).select(
        F.col("id").alias("key"), ((F.col("id") * 7) % 23).alias("v")
    )
    plan = ntile_exact(df, 10, ["v", "key"], "tile")._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # the returned plan shuffles by the value-derived bucket, not a
    # global sort (the range pass ran in pass 1, driver-bounded)
    assert "hashpartitioning(__gr_bkt" in plan, plan


def test_global_rank_hof_regime_past_chain_max(spark):
    """Round 9: past _CHAIN_MAX ranges the bucket assignment must switch
    from the codegen comparison chain to the broadcast-array binary
    search expressed as a single aggregate-HOF fold (O(log ranges)
    codegen and per-row cost — the filter-HOF linear scan was measured
    4.5x slower and rejected), stay exact, and still never funnel
    through a single partition."""
    from cell_kn_mvp_etl_ontologies_spark.operators.windows import with_global_rank

    df = spark.range(20000).select(
        F.col("id").alias("key"), ((F.col("id") * 2654435761) % 99991).alias("v")
    )
    out = with_global_rank(df, ["v", "key"], "rnk", num_partitions=200)
    rows = out.collect()
    expect = {
        r.key: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (r.v, r.key)))
    }
    assert {r.key: r.rnk for r in rows} == expect
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "lambdafunction" in plan.lower(), plan  # the HOF regime engaged
    assert "SinglePartition" not in plan, plan
