"""Hot-IVF-cell degradation probe (VERDICT r5 #5 "Done" condition).

Plants the pathological routing case on the 80k bench corpus: a corpus
whose vectors are angularly dominated by one axis, served against 64-cell
centroids of which exactly one aligns with that axis — so ONE cell holds
~99% of the index and receives ~all probes (the IVF analogue of a hot
key).  Measures routed serving (cogrouped applyInPandas matmul) on:

  - hot    : the planted 1-super-cell index (worst case)
  - trained: k_cells=64 k-means centroids over the SAME corpus (the
             documented mitigation — raise k_cells at build time)

and asserts the hot run still completes with results identical to the
expression path (degrades to one long task, never a failure or a wrong
answer).  Prints one JSON line with wall times and cell-size profiles.

Run from the repo root:  python tools/probe_hot_cell.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.clustering import kmeans_fit
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    build_ivf_index,
    ivf_topk_prebuilt,
    ivf_topk_prebuilt_routed,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_ANN_Q", "2000"))


def skewed_corpus(spark, times: int = 40):
    """80k vectors, every one angularly dominated by dim 2 (+50 on a
    [-1, 1]-ish base) — all cosines point the same way."""
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    em = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    reps = spark.range(times).select(F.col("id").cast("int").alias("rep"))
    return (
        em.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * times + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i == 2, x + F.lit(50.0))
                .otherwise(x * (1.0 + ((i + F.col("rep") * 7) % 13) / 40.0))
                .cast("float"),
            ).alias("embedding"),
        )
        .repartition(CPUS * 2)
    )


def axis_centroids(spark, d: int = 64, k: int = 64):
    """k axis-aligned centroids: centroid j points along dim j — only
    centroid 2 aligns with the corpus, so cell 2 is the super-cell."""
    rows = [(j, [100.0 if i == j else 0.0 for i in range(d)]) for j in range(k)]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def serve(queries, index, centroids, label):
    t0 = time.monotonic()
    routed = ivf_topk_prebuilt_routed(queries, index, centroids, k=10, nprobe=1)
    n = routed.count()
    wall = time.monotonic() - t0
    return {"path": label, "rows": n, "wall_s": round(wall, 2)}


def main() -> None:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-hot-cell")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = skewed_corpus(spark).persist()
    n_corpus = corpus.count()
    queries = corpus.filter(F.col("vec_id") % (n_corpus // N_QUERIES) == 0).persist()
    n_q = queries.count()

    # --- hot: planted super-cell ------------------------------------------
    hot_cents = axis_centroids(spark)
    hot_index = build_ivf_index(corpus, hot_cents, n_partitions=CPUS * 2).persist()
    hot_sizes = sorted(
        (r["count"] for r in hot_index.groupBy("cell").count().collect()), reverse=True
    )
    hot = serve(queries, hot_index, hot_cents, "hot")

    # correctness under skew: routed == expression path, bit-for-bit.
    # Identity is per-query, so a 100-query subset is valid evidence; the
    # FULL expression-path run over the 80k super-cell is 160M interpreted
    # HOF dots — the exact cost the routed matmul exists to avoid, and it
    # does not finish in the probe budget (that asymmetry IS a result,
    # reported as expr_subset_wall_s vs the routed full-batch wall).
    sub = queries.filter(F.col("vec_id") % 800 == 0).persist()
    n_sub = sub.count()
    a = sorted(
        map(tuple, ivf_topk_prebuilt_routed(sub, hot_index, hot_cents, k=10, nprobe=1).collect())
    )
    t0 = time.monotonic()
    b = sorted(
        map(tuple, ivf_topk_prebuilt(sub, hot_index, hot_cents, k=10, nprobe=1).collect())
    )
    expr_sub_wall = round(time.monotonic() - t0, 2)
    assert a == b, "hot-cell routed result diverged from expression path"
    hot_index.unpersist()

    # --- mitigation: k_cells trained on the actual corpus -----------------
    cents = kmeans_fit(corpus, "vec_id", "embedding", k=64, n_iter=2)
    trained_cents = cents.select(
        F.col("cell").cast("long").alias("vec_id"),
        F.transform("cv", lambda x: (x / 1000.0).cast("float")).alias("embedding"),
    )
    tr_index = build_ivf_index(corpus, trained_cents, n_partitions=CPUS * 2).persist()
    tr_sizes = sorted(
        (r["count"] for r in tr_index.groupBy("cell").count().collect()), reverse=True
    )
    trained = serve(queries, tr_index, trained_cents, "trained_k64")

    print(
        json.dumps(
            {
                "n_corpus": n_corpus,
                "n_queries": n_q,
                "hot": hot,
                "hot_top_cell_share": round(hot_sizes[0] / n_corpus, 4),
                "hot_n_cells": len(hot_sizes),
                "trained": trained,
                "trained_top_cell_share": round(tr_sizes[0] / n_corpus, 4),
                "trained_n_cells": len(tr_sizes),
                "bit_identical_under_skew": True,
                "identity_subset_q": n_sub,
                "expr_subset_wall_s": expr_sub_wall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
