"""Unit tests for deterministic integer k-means (operators/clustering.py)."""

from __future__ import annotations

import pytest

from cell_kn_mvp_etl_ontologies_spark.operators.clustering import kmeans_integer


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_separated_clusters(spark):
    # two tight blobs far apart: every point must land with its blob-mates
    blob_a = [(i, [1.0 + 0.01 * i, 1.0, 0.0]) for i in range(5)]
    blob_b = [(10 + i, [-1.0 - 0.01 * i, -1.0, 0.0]) for i in range(5)]
    out = kmeans_integer(_vec_df(spark, blob_a + blob_b), k=2, n_iter=3).collect()
    cells = {r["vec_id"]: r["cell"] for r in out}
    assert len(cells) == 10
    a_cells = {cells[i] for i in range(5)}
    b_cells = {cells[10 + i] for i in range(5)}
    assert len(a_cells) == 1 and len(b_cells) == 1 and a_cells != b_cells


def test_kmeans_deterministic_across_partitionings(spark):
    rows = [(i, [float((i * 7) % 13) - 6, float((i * 3) % 11) - 5]) for i in range(60)]
    df = _vec_df(spark, rows)
    r1 = sorted(map(tuple, kmeans_integer(df, k=3, n_iter=2).collect()))
    r2 = sorted(map(tuple, kmeans_integer(df.repartition(17), k=3, n_iter=2).collect()))
    assert r1 == r2


def test_kmeans_k1_and_bad_args(spark):
    df = _vec_df(spark, [(1, [0.5, 0.5]), (2, [0.1, 0.9])])
    out = kmeans_integer(df, k=1, n_iter=1).collect()
    assert {r["cell"] for r in out} == {0}
    with pytest.raises(ValueError):
        kmeans_integer(df, k=0)


def test_embedding_near_dups_clustered_finds_planted_dups(spark):
    """Planted exact duplicates always survive cluster bucketing (identical
    vectors cannot split cells), and the clustered pair set is a subset of
    the all-pairs result (bucketing only ever drops cross-cell pairs)."""
    from pyspark.sql import functions as F

    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_clustered,
    )

    em = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    corpus = (
        em.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
        .unionByName(
            em.filter(F.col("vec_id") < 5).select(
                (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
            )
        )
    )
    clustered = {(r.a, r.b) for r in embedding_near_dups_clustered(corpus, k=4).collect()}
    full = {(r.a, r.b) for r in embedding_near_dups(corpus).collect()}
    assert {(i, i + 10000) for i in range(5)} <= clustered
    assert clustered <= full
