"""Round-9 ANN perf evidence (VERDICT r8 #3 + #4), one quiet-window session.

#3  ann_pq_rerank_80k band settle: stage-level A/B — time the ADC shortlist
    stage alone (ivf_pq_topk_routed, nprobe = all 64 cells, k = shortlist)
    vs the full two-stage serve (shortlist + exact rerank), min-of-N with
    inter-iteration GC, sentinel-normalized.  Decides whether the 2.19
    normalized band (ONE r7 record; r7/r8 measured 3.4-3.8) has a real
    stage cost behind it or must be re-based on min-of-N evidence.

#4  cosine_topk_80k_vec fan-out sweep: cosine_topk_routed at
    n_blocks ∈ {CPUS, 2·CPUS, 4·CPUS} on the exact bench shape
    (80k corpus × 50 queries), min-of-3 each — the hash-blocked
    replication factor has never been swept (r7's ≤3.56 target).

Protocol mirrors bench.py exactly: same session conf, same scan/codegen/
Arrow warmups, min-of-N with System.gc() between iterations, inter-query
clearCache + GC, and the two pinned sentinels (q1 0.9 s, running_windows
0.45 s) for host_speed_ratio normalization.

Usage: SPARK_GRAFT_CPUS=32 python tools/probe_r9_ann.py [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import bench
from cell_kn_mvp_etl_ontologies_spark.io import load_table
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def _session():
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-r9-ann")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warmup(spark):
    load_table(spark, SF_DIR, "lineitem").count()
    (
        spark.range(10000)
        .select((F.col("id") % 100).alias("k"), F.col("id").cast("string").alias("v"))
        .groupBy("k")
        .agg(F.sort_array(F.collect_set("v")).alias("vs"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    def _warm(batches):
        import numpy as np  # noqa: F401
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"]})

    spark.range(1000).mapInPandas(_warm, "id long").write.mode("overwrite").format(
        "noop"
    ).save()


def _time(spark, fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        spark._jvm.System.gc()
        t0 = time.time()
        fn(spark).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    spark = _session()
    _warmup(spark)

    out: dict = {"sf_dir": SF_DIR, "cpus": CPUS, "runs": args.runs}

    # -- sentinels (bench protocol: min-of-3, nominal 0.9 / 0.45) ----------
    s_q1 = _time(spark, bench.q1_pricing_summary, 3)
    s_rw = _time(spark, bench.running_windows, 3)
    ratios = [s_q1 / 0.9, s_rw / 0.45]
    speed = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    out["sentinels"] = {"q1_pricing_summary": s_q1, "running_windows": s_rw}
    out["host_noise_ratio"] = round(max(ratios), 2)
    out["host_speed_ratio"] = round(speed, 3)
    spark.catalog.clearCache()
    spark._jvm.System.gc()

    # -- #4: cosine_topk_routed n_blocks sweep ------------------------------
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        cosine_topk_routed,
    )

    sweep: dict[str, dict] = {}
    for n_blocks in (CPUS, CPUS * 2, CPUS * 4):
        def fn(spark, n=n_blocks):
            corpus = bench._expanded_embeddings(spark)
            q = corpus.filter(F.col("vec_id") < 50)
            return cosine_topk_routed(q, corpus, k=10, n_blocks=n)

        raw = _time(spark, fn, 3)
        sweep[str(n_blocks)] = {"raw": raw, "normalized": round(raw / speed, 3)}
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    out["cosine_topk_routed_nblocks"] = sweep

    # -- #3: ann_pq_rerank stage-level A/B ----------------------------------
    # artifacts build once (persisted), exactly as the bench amortizes them
    bench._ensure_ivf_pq_artifacts(spark)
    from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
        ivf_pq_topk_routed,
        pq_adc_rerank_topk_routed,
    )

    def shortlist_only(spark):
        q = bench._ANN_STATE["corpus"].filter(F.col("vec_id") < 50)
        return ivf_pq_topk_routed(
            q,
            bench._ANN_STATE["ivf_pq_index"],
            bench._ANN_STATE["centroids"],
            bench._ANN_STATE["pq_books"],
            k=100,
            nprobe=64,
            m=8,
        )

    def full_rerank(spark):
        q = bench._ANN_STATE["corpus"].filter(F.col("vec_id") < 50)
        return pq_adc_rerank_topk_routed(
            q,
            bench._ANN_STATE["corpus"],
            bench._ANN_STATE["ivf_pq_index"],
            bench._ANN_STATE["centroids"],
            bench._ANN_STATE["pq_books"],
            k=10,
            shortlist=100,
            m=8,
        )

    def ivf_pq_nprobe8(spark):
        q = bench._ANN_STATE["corpus"].filter(F.col("vec_id") < 50)
        return ivf_pq_topk_routed(
            q,
            bench._ANN_STATE["ivf_pq_index"],
            bench._ANN_STATE["centroids"],
            bench._ANN_STATE["pq_books"],
            k=10,
            nprobe=8,
            m=8,
        )

    stages: dict[str, dict] = {}
    for name, fn in (
        ("ivf_pq_nprobe8_k10", ivf_pq_nprobe8),
        ("adc_shortlist_nprobe64_k100", shortlist_only),
        ("full_rerank", full_rerank),
    ):
        raw = _time(spark, fn, args.runs)
        stages[name] = {"raw": raw, "normalized": round(raw / speed, 3)}
        # NOTE: do NOT clearCache between these — the persisted artifacts
        # are the amortized offline state, same as consecutive bench rows
        spark._jvm.System.gc()
    out["pq_rerank_stages"] = stages
    out["rerank_minus_shortlist_raw"] = round(
        stages["full_rerank"]["raw"] - stages["adc_shortlist_nprobe64_k100"]["raw"], 3
    )

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
