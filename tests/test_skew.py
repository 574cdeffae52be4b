"""Salted aggregation / salted join equivalence with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.skew import (
    salted_collect_set,
    salted_join,
)


def _hot_df(spark):
    # one pathologically hot key ('hot' = 90% of rows) plus a uniform tail
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 137).alias("v"),
    )


def test_salted_collect_set_equals_unsalted(spark):
    df = _hot_df(spark)
    salted = {
        r.k: r.values for r in salted_collect_set(df, ["k"], "v", n_salts=8).collect()
    }
    plain = {
        r.k: r.values
        for r in df.groupBy("k").agg(F.sort_array(F.collect_set("v")).alias("values")).collect()
    }
    assert salted == plain
    assert len(salted["hot"]) == 137


def test_salted_join_equals_plain_join(spark):
    big = _hot_df(spark).withColumnRenamed("v", "payload")
    small = spark.createDataFrame([("hot", 1), ("cold", 2), ("absent", 3)], "k string, dim int")
    # force the shuffle path so the salt actually shapes an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(big, small, ["k"], n_salts=4).groupBy("k", "dim").count()
        want = big.join(small, on="k").groupBy("k", "dim").count()
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("zzz", 2)], "k string, payload int")
    small = spark.createDataFrame([("a", 10)], "k string, dim int")
    rows = {
        (r.k, r.payload, r.dim)
        for r in salted_join(big, small, ["k"], n_salts=4, how="left").collect()
    }
    assert rows == {("a", 1, 10), ("zzz", 2, None)}


def test_inverted_index_hot_token_cap(spark):
    """VERDICT r3 #5: one synthetic hot token at ~100x median document
    frequency.  The capped build must (a) keep the TRUE df for the hot
    token, (b) store only K postings for it, (c) agree exactly with the
    uncapped build on every token at-or-under the cap, and (d) plan the
    salted path as two-level hash aggregation, not a per-token window."""
    from cell_kn_mvp_etl_ontologies_spark.search import text_en_no_stem_tokens
    from cell_kn_mvp_etl_ontologies_spark.search.inverted_index import (
        build_inverted_index,
    )

    # 400 docs all contain hot token 'the'; rare tokens appear in ~4 docs
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the rare"), (F.col("id") % 100).cast("string"), F.lit(" tail")
        ).alias("text"),
    )
    capped = build_inverted_index(
        docs, ["doc_id"], "text", text_en_no_stem_tokens, max_postings=8, n_salts=4
    )
    exact = build_inverted_index(docs, ["doc_id"], "text", text_en_no_stem_tokens)

    got = {r.token: r for r in capped.collect()}
    want = {r.token: r for r in exact.collect()}
    assert got["the"].n_docs == 400  # true df survives the cap
    assert len(got["the"].postings) == 8
    # capped head == first 8 of the exact sorted postings
    assert got["the"].postings == want["the"].postings[:8]
    for tok, w in want.items():
        assert got[tok].n_docs == w.n_docs
        if w.n_docs <= 8:
            assert got[tok].postings == w.postings
    # plan shape: two-level hash aggregate over (token, salt) then token —
    # no Window (a per-token sort would re-concentrate the hot token)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2
