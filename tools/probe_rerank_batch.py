"""|Q| sweep for the routed ADC-shortlist + exact-rerank path (round 7) —
the same evidence shape as the routed IVF-PQ batch sweep: the expression
shortlist's (q, t, sub)-grain LUT-sum exchanges grow with |Q|·corpus,
while the cogrouped gather amortizes per cell — so the routed two-stage
serve should stay near-flat per query as |Q| grows.

Builds the 80k-corpus artifacts once (64-cell quantizer, m=8 trained
codebooks, (cell, t_id, codes) index), then serves |Q| = 50 / 500 / 5000
through BOTH paths (expression pq_adc_rerank_topk with prebuilt codes and
pq_adc_rerank_topk_routed), min-of-2 each.  Prints one JSON line.

Run from the repo root:  python tools/probe_rerank_batch.py
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
    pq_adc_rerank_topk,
    pq_adc_rerank_topk_routed,
    pq_encode_vectorized,
    pq_train_codebooks,
)
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import build_ivf_index
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


def main():
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
    )
    for kk, vv in ENGINE_SQL_CONF.items():
        b = b.config(kk, vv)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = expanded_embeddings(spark).persist()
    corpus.count()
    cents = kmeans_fit(corpus, "vec_id", "embedding", k=64, n_iter=2)
    centroids = cents.select(
        F.col("cell").cast("long").alias("vec_id"),
        F.transform("cv", lambda x: (x / 1000.0).cast("float")).alias("embedding"),
    ).persist()
    centroids.count()
    index = build_ivf_index(corpus, centroids, n_partitions=CPUS * 2).persist()
    index.count()
    books = pq_train_codebooks(corpus, m=8, ksub=64, n_iter=2).persist()
    books.count()
    codes = pq_encode_vectorized(corpus, books, m=8).persist()
    codes.count()
    index_codes = (
        index.select("cell", "t_id").join(codes, on="t_id")
        .select("cell", "t_id", "codes").repartition(CPUS, "cell").persist()
    )
    index_codes.count()

    out = {}
    for n_q in BATCHES:
        q = corpus.filter(F.col("vec_id") < n_q)
        res = {}
        paths = [
            ("routed", lambda: pq_adc_rerank_topk_routed(
                q, corpus, index_codes, centroids, books, k=10, shortlist=100, m=8)),
        ]
        if n_q <= 500:
            # the expression shortlist is (q, t, sub)-grain: at |Q|=5000 it
            # is a 3.2B-row LUT join — demonstrating that cost would take
            # tens of minutes; the sweep's point is that the routed path
            # doesn't pay it
            paths.append(("expression", lambda: pq_adc_rerank_topk(
                q, corpus, codes, books, k=10, shortlist=100, m=8)))
        for label, fn in paths:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn().write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            res[label] = round(best, 2)
        out[n_q] = res
        print(f"|Q|={n_q}: {res}", flush=True)
    print(json.dumps({"corpus": 80000, "m": 8, "ksub": 64, "shortlist": 100, "sweep": out}))


if __name__ == "__main__":
    main()
