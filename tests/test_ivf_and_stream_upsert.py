"""Tests for IVF-flat ANN assignment/probing and the foreachBatch upsert."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.similarity import ivf_assign, ivf_topk


def _vecs(spark):
    # two well-separated clusters around e1 and e2
    rows = [
        (0, [1.0, 0.0, 0.0]),   # centroid A
        (1, [0.0, 1.0, 0.0]),   # centroid B
        (10, [0.9, 0.1, 0.0]),  # near A
        (11, [0.95, 0.05, 0.0]),
        (20, [0.1, 0.9, 0.0]),  # near B
        (21, [0.05, 0.95, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_assign_nearest_centroid(spark):
    em = _vecs(spark)
    cents = em.filter(F.col("vec_id") < 2)
    got = {r.vec_id: r.cell for r in ivf_assign(em, cents, nprobe=1).collect()}
    assert got[10] == 0 and got[11] == 0
    assert got[20] == 1 and got[21] == 1


def test_ivf_topk_stays_in_cluster(spark):
    em = _vecs(spark)
    cents = em.filter(F.col("vec_id") < 2)
    queries = em.filter(F.col("vec_id") == 10)
    out = ivf_topk(queries, em, cents, k=2, nprobe=1).collect()
    # nearest neighbors of 10 within its probed cell: 11 and centroid 0
    assert [(r.t_id, r.rnk) for r in sorted(out, key=lambda r: r.rnk)] == [(11, 1), (0, 2)]


def test_stream_upsert_incoming_wins(spark):
    from cell_kn_mvp_etl_ontologies_spark.sinks.graph import upsert_parquet

    root = tempfile.mkdtemp(prefix="upsert_test_")
    path = root + "/state"
    try:
        first = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        upsert_parquet(spark, first, path, ["k"])
        second = spark.createDataFrame([(2, "B2"), (3, "c")], "k long, v string")
        upsert_parquet(spark, second, path, ["k"])
        got = {r.k: r.v for r in spark.read.parquet(path).collect()}
        assert got == {1: "a", 2: "B2", 3: "c"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_ivf_prebuilt_matches_inline(spark):
    """build_ivf_index + ivf_topk_prebuilt must equal the inline ivf_topk on
    real embeddings (same centroids, same k/nprobe) — index reuse changes
    the cost, never the answer."""
    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_prebuilt,
    )

    em = load_table(spark, "/root/testdata/sf0.01", "embeddings").filter(
        F.col("vec_id") < 120
    ).select("vec_id", "embedding")
    cents = em.filter(F.col("vec_id") < 4)
    queries = em.filter(F.col("vec_id") < 8)
    inline = ivf_topk(queries, em, cents, k=3, nprobe=2)
    index = build_ivf_index(em, cents, n_partitions=4)
    pre = ivf_topk_prebuilt(queries, index, cents, k=3, nprobe=2)
    a = {(r.q_id, r.t_id, r.rnk) for r in inline.collect()}
    b = {(r.q_id, r.t_id, r.rnk) for r in pre.collect()}
    assert a == b


def test_ivf_prebuilt_serve_has_no_index_side_exchange(spark):
    """Plan pin for the serve-time claim in SCALE.md: probing a prebuilt
    (cell-partitioned, persisted) index must broadcast the query probes —
    the only exchanges in the serve plan are the index build's own
    repartition (cached upstream) and the final small top-k shuffles, never
    a fresh corpus-wide exchange keyed on cell."""
    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_prebuilt,
    )

    em = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = em.filter(F.col("vec_id") < 4)
    index = build_ivf_index(em, cents, n_partitions=4).persist()
    index.count()
    try:
        out = ivf_topk_prebuilt(em.filter(F.col("vec_id") < 3), index, cents, k=3, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan  # index served from cache
        # the candidate join consumes the broadcast probe side
        assert "BroadcastHashJoin" in plan
        # no sort-merge join anywhere in the serve path (would mean the
        # index side got re-sorted/re-shuffled for the join)
        assert "SortMergeJoin" not in plan
    finally:
        index.unpersist()
