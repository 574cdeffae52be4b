"""Round-7 PQ recall evidence (VERDICT r6 #4 and #7):

1. Composed IVF-PQ recall@10 vs nprobe — the recall-vs-probe curve the
   composed audit (`similarity_ivf_pq_recall`) pins at one point; here the
   full curve on the 80k jitter-structured bench corpus with TRAINED
   64-cell quantizer + trained m=8/ksub=64 codebooks.
2. OPQ A/B — plain contiguous-split PQ vs the balanced-variance axis
   permutation (`opq_variance_permutation`), same trained-codebook recipe,
   full-ADC top-10 against exact quantized-L2 ground truth.

Ground truth is computed driver-side in numpy (80k×64 int matrix, ~40 MB —
a measurement script, not a serving path).  Prints one JSON line.

Run from the repo root:  python tools/probe_pq_recall_r7.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.clustering import kmeans_fit
from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
    ivf_pq_topk_routed,
    opq_variance_permutation,
    permute_vec,
    pq_encode_vectorized,
    pq_train_codebooks,
)
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import build_ivf_index
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
M, KSUB, K = 8, 64, 10
NPROBES = [1, 2, 4, 8, 16, 32, 64]


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


def exact_gt(corpus_rows, k):
    """Exact quantized-L2 top-k per query (self excluded), numpy."""
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import quantize_np

    ids = np.array([r.vec_id for r in corpus_rows], dtype=np.int64)
    V = np.stack([quantize_np(np.array(r.embedding, dtype=np.float64)) for r in corpus_rows])
    qmask = ids < 50
    gt = {}
    for qi in np.nonzero(qmask)[0]:
        d = ((V - V[qi]) ** 2).sum(axis=1)
        keep = ids != ids[qi]
        order = np.lexsort((ids[keep], d[keep]))[:k]
        gt[int(ids[qi])] = set(ids[keep][order].tolist())
    return gt


def recall(df, gt, k):
    hits, total = 0, 0
    by_q = {}
    for r in df.collect():
        by_q.setdefault(int(r.q_id), set()).add(int(r.t_id))
    for q, want in gt.items():
        got = by_q.get(q, set())
        hits += len(got & want)
        total += len(want)
    return hits / total


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
    n = corpus.count()
    q = corpus.filter(F.col("vec_id") < 50)

    t0 = time.time()
    cents = kmeans_fit(corpus, "vec_id", "embedding", k=64, n_iter=2)
    centroids = cents.select(
        F.col("cell").cast("long").alias("vec_id"),
        F.transform("cv", lambda x: (x / 1000.0).cast("float")).alias("embedding"),
    ).persist()
    centroids.count()
    index = build_ivf_index(corpus, centroids, n_partitions=CPUS * 2).persist()
    index.count()

    books = pq_train_codebooks(corpus, m=M, ksub=KSUB, n_iter=2).persist()
    books.count()
    codes = pq_encode_vectorized(corpus, books, m=M).persist()
    codes.count()
    index_codes = (
        index.select("cell", "t_id").join(codes, on="t_id")
        .select("cell", "t_id", "codes").repartition(CPUS, "cell").persist()
    )
    index_codes.count()
    build_s = time.time() - t0

    gt = exact_gt(corpus.collect(), K)

    curve = {}
    for nprobe in NPROBES:
        t0 = time.time()
        out = ivf_pq_topk_routed(q, index_codes, centroids, books, k=K, nprobe=nprobe, m=M)
        r = recall(out, gt, K)
        curve[nprobe] = {"recall": round(r, 4), "serve_s": round(time.time() - t0, 2)}

    # OPQ A/B: full-ADC (nprobe=64 == whole corpus) plain vs permuted
    t0 = time.time()
    perm = opq_variance_permutation(corpus, m=M)
    pm = corpus.select(
        "vec_id", permute_vec(F.col("embedding"), perm).alias("embedding")
    ).persist()
    pm.count()
    books_opq = pq_train_codebooks(pm, m=M, ksub=KSUB, n_iter=2).persist()
    books_opq.count()
    codes_opq = pq_encode_vectorized(pm, books_opq, m=M).persist()
    index_opq = (
        index.select("cell", "t_id").join(codes_opq, on="t_id")
        .select("cell", "t_id", "codes").repartition(CPUS, "cell").persist()
    )
    index_opq.count()
    opq_build_s = time.time() - t0
    qp = pm.filter(F.col("vec_id") < 50)
    out_plain = ivf_pq_topk_routed(q, index_codes, centroids, books, k=K, nprobe=64, m=M)
    r_plain = recall(out_plain, gt, K)
    cents_pm = centroids.select(
        "vec_id", permute_vec(F.col("embedding"), perm).alias("embedding")
    )
    out_opq = ivf_pq_topk_routed(qp, index_opq, cents_pm, books_opq, k=K, nprobe=64, m=M)
    r_opq = recall(out_opq, gt, K)

    print(json.dumps({
        "corpus": n, "m": M, "ksub": KSUB, "k": K,
        "build_s": round(build_s, 1), "opq_build_s": round(opq_build_s, 1),
        "nprobe_curve": curve,
        "adc_recall_plain": round(r_plain, 4),
        "adc_recall_opq": round(r_opq, 4),
    }))


if __name__ == "__main__":
    main()
