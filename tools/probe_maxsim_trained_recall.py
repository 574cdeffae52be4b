"""Recall A/B for cell-routed MaxSim serving on the BENCH corpus
(VERDICT r7 #5): md5-seeded cells vs k-means-trained cells at the exact
bench shape (10k 8-token docs from the 80k expanded embeddings, 50 query
docs, 64 cells, nprobe=8, k=10).

Ground truth = the routed path at nprobe = n_cells (all cells probed →
exact; the routed-identity doctrine), so the A/B isolates ROUTING loss
only — scoring is byte-identical across all three runs.

Usage: python tools/probe_maxsim_trained_recall.py
Prints one JSON line; record the numbers in SCALE.md §maxsim-trained-serving.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import bench
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    maxsim_topk_routed_vectorized,
)


def main() -> None:
    builder = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .appName("probe-maxsim-trained-recall")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in bench.ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = bench._expanded_embeddings(spark)
    toks = corpus.select(
        F.expr("vec_id div 8").cast("long").alias("t_id"),
        (F.col("vec_id") % 8).cast("long").alias("t_tok"),
        F.col("embedding").alias("vec"),
    ).persist()
    q_tokens = toks.filter(F.col("t_id") < 50).select(
        F.col("t_id").alias("q_id"), F.col("t_tok").alias("q_tok"), "vec"
    )
    toks.count()

    def topk_sets(routing: str, nprobe: int):
        t0 = time.time()
        rows = maxsim_topk_routed_vectorized(
            q_tokens, toks, k=10, n_cells=64, nprobe=nprobe, scale=1000,
            routing=routing,
        ).collect()
        dt = time.time() - t0
        by_q: dict[int, set[int]] = {}
        for r in rows:
            by_q.setdefault(r.q_id, set()).add(r.t_id)
        return by_q, dt

    exact, t_exact = topk_sets("hash", 64)  # all cells probed = exact
    denom = sum(len(exact[q]) for q in exact)
    out = {"corpus_docs": 10000, "n_queries": 50, "n_cells": 64, "k": 10,
           "t_exact_allprobe_s": round(t_exact, 2), "sweep": []}
    for nprobe in (1, 2, 4, 8):
        row = {"nprobe": nprobe}
        for routing in ("hash", "trained"):
            got, dt = topk_sets(routing, nprobe)
            overlap = sum(len(exact[q] & got.get(q, set())) for q in exact)
            row[f"recall10_{routing}"] = round(overlap / denom, 4)
            row[f"t_{routing}_s"] = round(dt, 2)
        out["sweep"].append(row)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
