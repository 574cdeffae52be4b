"""Unit tests for round-3 scale operators: integer PageRank, directed
containment, incremental new-vs-corpus LSH dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.dedup import (
    containment_pairs,
    dedup_incremental_lsh,
    minhash_band_keys,
    minhash_signatures,
    shingles,
)
from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import pagerank_integer


def test_pagerank_integer_star_graph(spark):
    # star: 1..4 all point at 0 — hub must outrank every spoke, spokes tie
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)], "src long, dst long"
    )
    ranks = {r["node"]: r["rank_units"] for r in pagerank_integer(edges, n_iter=3).collect()}
    assert len(ranks) == 5
    spoke = ranks[1]
    assert all(ranks[i] == spoke for i in range(2, 5))
    assert ranks[0] > spoke
    # spokes are dangling-fed only by the base term: (1e12 - 85% of 1e12)/5
    assert spoke == (10**12 - 10**12 * 85 // 100) // 5


def test_pagerank_integer_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(100)], "src long, dst long"
    )
    r1 = pagerank_integer(edges, n_iter=4).collect()
    r2 = pagerank_integer(edges.repartition(13), n_iter=4).collect()
    assert {tuple(r) for r in r1} == {tuple(r) for r in r2}


def test_containment_detects_subset_doc(spark):
    long_doc = "the quick brown fox jumps over the lazy dog again and again"
    subset = "quick brown fox jumps"
    docs = spark.createDataFrame(
        [(1, long_doc), (2, subset), (3, "entirely unrelated words zzz")],
        "doc_id long, text string",
    )
    pairs = {
        (r["a"], r["b"]): r["containment"]
        for r in containment_pairs(docs, "text", "doc_id", shingle_width=3).collect()
    }
    # every shingle of the subset doc appears in the long doc
    assert pairs[(2, 1)] == 1.0
    # the reverse direction is much weaker — that's the asymmetry
    assert pairs[(1, 2)] < 0.5
    assert (3, 1) not in pairs or pairs[(3, 1)] < 0.3


def test_dedup_incremental_lsh_flags_planted_copies(spark):
    # corpus docs must be mutually dissimilar so the planted copy matches
    # exactly one of them (near-identical corpus texts would legitimately
    # produce several band hits and a smaller min id)
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven eight",
        "lorem ipsum dolor sit amet consectetur",
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
    ]
    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "completely novel content unlike anything else xyzzy")],
        "doc_id long, text string",
    )
    corpus_bands = minhash_band_keys(
        minhash_signatures(shingles(corpus, "text", "doc_id", 5, None, distinct=False), 6),
        6, 3,
    )
    out = {r["id"]: r for r in dedup_incremental_lsh(
        new, corpus_bands, "text", "doc_id", shingle_width=5, n_hashes=6, n_bands=3
    ).collect()}
    assert out[100]["is_dup"] and out[100]["matched"] == 3
    assert not out[101]["is_dup"] and out[101]["matched"] is None


def test_bm25_integer_ranking_and_determinism(spark):
    from cell_kn_mvp_etl_ontologies_spark.search import text_en_no_stem_tokens
    from cell_kn_mvp_etl_ontologies_spark.search.ranking import bm25_rank_integer

    docs = spark.createDataFrame(
        [
            (1, "data data data processing pipeline"),
            (2, "data processing"),
            (3, "pipeline"),
            (4, "nothing relevant here at all"),
            (5, "data and more filler words to dilute term frequency data"),
        ],
        "doc_id long, text string",
    )
    out = bm25_rank_integer(
        docs, ["doc_id"], "text", ["data", "processing", "pipeline"],
        text_en_no_stem_tokens, k=3,
    ).collect()
    ranked = [r["doc_key"] for r in sorted(out, key=lambda r: r["rnk"])]
    assert len(ranked) == 3
    # doc 4 has no query terms and must never appear
    assert "4" not in ranked
    # doc 1 saturates tf on 'data' AND hits all three terms: must rank first
    assert ranked[0] == "1"
    # bit-exact under repartitioning
    out2 = bm25_rank_integer(
        docs.repartition(7), ["doc_id"], "text",
        ["data", "processing", "pipeline"], text_en_no_stem_tokens, k=3,
    ).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in out2}


def test_bitmap_overlap_exact_sets(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import (
        bitmap_distinct_words,
        bitmap_overlap,
    )

    rows = [("x", u) for u in [1, 2, 3, 100, 200]] + [("y", u) for u in [2, 3, 999]]
    df = spark.createDataFrame(rows, "s string, uid long")
    words = bitmap_distinct_words(df, ["s"], "uid")
    out = bitmap_overlap(words, "s", "x", "y").head()
    assert (out["n_left"], out["n_right"], out["n_both"], out["n_either"]) == (5, 3, 2, 6)


def test_pagerank_empty_graph_returns_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank_integer(empty, n_iter=2)
    assert out.count() == 0
    assert dict(out.dtypes) == {"node": "bigint", "rank_units": "bigint"}


def test_bitmap_overlap_premerges_finer_grain(spark):
    """ADVICE r3: words built at a finer grain than (set, chunk) — e.g. per
    day — must bit_or-fold before the join, not double-count bits."""
    from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import (
        bitmap_distinct_words,
        bitmap_overlap,
    )

    rows = [("x", d, uid) for d in (1, 2) for uid in (0, 1, 2)] + [
        ("y", d, uid) for d in (1, 2) for uid in (2, 3)
    ]
    df = spark.createDataFrame(rows, "s string, day int, uid long")
    fine = bitmap_distinct_words(df, ["s", "day"], "uid")  # finer than (s, chunk)
    out = bitmap_overlap(fine, "s", "x", "y").head()
    assert (out.n_left, out.n_right, out.n_both, out.n_either) == (3, 2, 1, 4)


def test_bm25_overflow_guard_raises(spark):
    """ADVICE r3: exceeding the BIGINT envelope raises a descriptive error
    instead of silently wrapping (forced here via an absurd scale)."""
    import pytest as _pytest

    from cell_kn_mvp_etl_ontologies_spark.search.analyzers import text_en_no_stem_tokens
    from cell_kn_mvp_etl_ontologies_spark.search.ranking import bm25_rank_integer

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " * 50) for i in range(20)], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="BIGINT envelope"):
        bm25_rank_integer(
            docs, ["doc_id"], "text", ["alpha"], text_en_no_stem_tokens,
            k=3, scale=10**15,
        ).collect()
