"""|Q| sweep for routed IVF-PQ serving (round 6) — the same evidence shape
as the round-5 routed-IVF batch sweep: expression-path ADC cost grows with
the candidate count per batch (every (q, t, sub) LUT row crosses an
exchange), while the cogrouped path's per-cell matmul/gather amortizes —
so routed serving should stay near-flat per query as |Q| grows.

Builds the 80k-corpus trained IVF-PQ index once (64 cells, m=8 trained
codebooks), then serves batches of |Q| = 50 / 500 / 5000 through BOTH
paths (expression `ivf_pq_topk` with all artifacts prebuilt, and
`ivf_pq_topk_routed`), min-of-2 each.  Prints one JSON line.

Run from the repo root:  python tools/probe_ivf_pq_batch.py
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
from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
    ivf_pq_topk,
    ivf_pq_topk_routed,
    pq_encode_vectorized,
    pq_train_codebooks,
)
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import ivf_assign
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
BATCHES = [50, 500, 5000]


def expanded_embeddings(spark, times: int = 40):
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    em = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    reps = spark.range(times).select(F.col("id").cast("int").alias("rep"))
    return (
        em.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * times + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (x * (1.0 + ((i + F.col("rep") * 7) % 13) / 40.0)).cast(
                    "float"
                ),
            ).alias("embedding"),
        )
        .repartition(CPUS * 2)
    )


def timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        fn()
        w = time.monotonic() - t0
        best = w if best is None else min(best, w)
    return round(best, 2)


def main() -> None:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-ivf-pq-batch")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = expanded_embeddings(spark).persist()
    corpus.count()
    cents = kmeans_fit(corpus, "vec_id", "embedding", k=64, n_iter=2)
    centroids = cents.select(
        F.col("cell").cast("long").alias("vec_id"),
        F.transform("cv", lambda x: (x / 1000.0).cast("float")).alias("embedding"),
    ).persist()
    centroids.count()
    books = pq_train_codebooks(corpus, m=8, ksub=64, n_iter=2).persist()
    books.count()
    codes = pq_encode_vectorized(corpus, books, m=8).persist()
    codes.count()
    cells = ivf_assign(corpus, centroids, nprobe=1).select(
        F.col("vec_id").alias("t_id"), "cell"
    ).persist()
    cells.count()
    index_codes = (
        cells.join(codes, on="t_id").select("cell", "t_id", "codes")
        .repartition(CPUS, "cell").persist()
    )
    index_codes.count()

    rows = []
    for nq in BATCHES:
        q = corpus.filter(F.col("vec_id") % (80000 // nq) == 0).persist()
        n_actual = q.count()

        def run_expr():
            ivf_pq_topk(
                q, corpus, centroids, books, k=10, nprobe=8, m=8,
                codes=codes, corpus_cells=cells,
            ).write.format("noop").mode("overwrite").save()

        def run_routed():
            ivf_pq_topk_routed(
                q, index_codes, centroids, books, k=10, nprobe=8, m=8
            ).write.format("noop").mode("overwrite").save()

        rows.append(
            {
                "n_queries": n_actual,
                "expr_s": timed(run_expr),
                "routed_s": timed(run_routed),
            }
        )
        q.unpersist()

    print(json.dumps({"metric": "ivf_pq_batch_sweep", "corpus": 80000, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
