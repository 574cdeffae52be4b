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
