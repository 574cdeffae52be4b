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


def _pivot_rows(spark):
    """Median vertex: 3 attribute rows.  Whale vertex 'V9': 300 rows
    (100x median) across 3 attrs — the dynamic-vocabulary skew risk of
    OntologyGraphBuilder.java:215-229.  V1 additionally carries a NULL
    attribute value (the uncapped operator keeps it; the capped one must
    too — round-5 review finding)."""
    median = spark.range(50).select(
        F.concat(F.lit("V"), (F.col("id") % 10).cast("string")).alias("id"),
        F.lit("n1").alias("number"),
        F.concat(F.lit("attr"), (F.col("id") % 3).cast("string")).alias("attr"),
        F.when(
            (F.col("id") % 10 == 1) & (F.col("id") % 3 == 0), F.lit(None).cast("string")
        ).otherwise(
            F.concat(F.lit("v"), (F.col("id") % 5).cast("string"))
        ).alias("value"),
    ).filter(F.col("id") != "V9")
    whale = spark.range(300).select(
        F.lit("V9").alias("id"),
        F.lit("n1").alias("number"),
        F.concat(F.lit("attr"), (F.col("id") % 3).cast("string")).alias("attr"),
        F.concat(F.lit("w"), F.lpad(F.col("id").cast("string"), 3, "0")).alias("value"),
    )
    return median.unionByName(whale)


def test_pivot_vertex_attrs_whale_vertex_complete_and_sorted(spark):
    """VERDICT r4 #7: the uncapped pivot must stay correct (complete,
    deterministically sorted) for a vertex with 100x the median attribute
    count — the O(n_attrs x n_entries) regroup bound documented on the
    operator holds because attrs stay few even when values explode."""
    from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import (
        agg_pivot_vertex_attrs,
    )

    out = {r.id: r.attrs for r in agg_pivot_vertex_attrs(_pivot_rows(spark)).collect()}
    whale = out["V9"]
    assert sorted(whale.keys()) == ["attr0", "attr1", "attr2"]
    assert len(whale["attr0"]) == 100
    assert whale["attr0"] == sorted(whale["attr0"])  # deterministic order


def test_pivot_capped_equals_uncapped_below_cap_and_bounds_whale(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import (
        agg_pivot_vertex_attrs,
        agg_pivot_vertex_attrs_capped,
    )

    rows = _pivot_rows(spark)
    plain = {
        (r.id, r.number): {k: list(v) for k, v in r.attrs.items()}
        for r in agg_pivot_vertex_attrs(rows).collect()
    }
    # cap above every group size: identical output
    wide = {
        (r.id, r.number): {k: list(v) for k, v in r.attrs.items()}
        for r in agg_pivot_vertex_attrs_capped(rows, max_values_per_attr=1000).collect()
    }
    assert wide == plain
    # binding cap: whale attrs keep exactly the FIRST 10 ascending values
    capped = {
        (r.id, r.number): {k: list(v) for k, v in r.attrs.items()}
        for r in agg_pivot_vertex_attrs_capped(rows, max_values_per_attr=10).collect()
    }
    for a in ("attr0", "attr1", "attr2"):
        assert capped[("V9", "n1")][a] == plain[("V9", "n1")][a][:10]
    # untouched vertices identical
    assert capped[("V1", "n1")] == plain[("V1", "n1")]


def _skewed_embeddings(spark, n=600, d=8):
    """Corpus whose mass clusters tightly around one point (vec_id >= 3),
    with two far-away outlier vectors — so with centroids = the first 3
    vectors, cell 2 receives ~100x the median cell's members AND ~all
    probes: the pathological hot IVF cell of VERDICT r5 #5."""
    rows = []
    for i in range(n):
        if i == 0:
            v = [100.0] + [0.0] * (d - 1)
        elif i == 1:
            v = [0.0, 100.0] + [0.0] * (d - 2)
        else:
            # tight angular cluster around axis 2 (assignment is cosine):
            # dominant component on dim 2, tiny jitter elsewhere
            v = [((i * 7 + j * 3) % 13) / 1000.0 for j in range(d)]
            v[2] = 10.0
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_routed_ann_hot_cell_degrades_gracefully_and_kcells_mitigates(spark):
    """VERDICT r5 #5: a pathological IVF cell (one cell holding ~all
    members and receiving ~all probes) must not change routed-serving
    RESULTS — the hot cell is one big cogroup task, not a job failure —
    and raising k_cells at build time (the documented mitigation) must
    actually break the hot cell up."""
    from cell_kn_mvp_etl_ontologies_spark.operators.clustering import kmeans_fit
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_prebuilt,
        ivf_topk_prebuilt_routed,
    )

    corpus = _skewed_embeddings(spark)
    centroids = corpus.filter(F.col("vec_id") < 3)  # cells 0, 1, hot 2
    index = build_ivf_index(corpus, centroids)

    # the planted skew is real: hot cell ~100x the median cell
    sizes = {r.cell: r.n for r in index.groupBy("cell").count().withColumnRenamed("count", "n").collect()}
    assert max(sizes.values()) >= 100 * sorted(sizes.values())[len(sizes) // 2]

    queries = corpus.filter((F.col("vec_id") % 40 == 0) & (F.col("vec_id") >= 2))
    a = sorted(
        (r.q_id, r.t_id, r.rnk)
        for r in ivf_topk_prebuilt_routed(queries, index, centroids, k=3, nprobe=1).collect()
    )
    b = sorted(
        (r.q_id, r.t_id, r.rnk)
        for r in ivf_topk_prebuilt(queries, index, centroids, k=3, nprobe=1).collect()
    )
    assert a == b and len(a) > 0  # skew degrades a task, never the answer

    # mitigation: k_cells raised via trained centroids splits the mass
    trained = kmeans_fit(corpus, k=12, n_iter=2)
    trained_cents = trained.select(
        F.col("cell").cast("long").alias("vec_id"),
        F.transform("cv", lambda x: x.cast("double") / 1000.0).alias("embedding"),
    )
    index12 = build_ivf_index(corpus, trained_cents)
    sizes12 = [r["count"] for r in index12.groupBy("cell").count().collect()]
    # the former 99.7%-of-corpus cell now splits: max cell share drops hard
    assert max(sizes12) < 0.6 * max(sizes.values())
    assert len(sizes12) >= 8
