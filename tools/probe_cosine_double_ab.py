"""Bit-identity + interleaved A/B for the round-15 blocked double-cosine
scorer (similarity.cosine_topk_routed_double) against the expression path
(similarity_topk(quantized=False) — the BroadcastNestedLoopJoin + interpreted
HOF fold), at the exact cosine_topk_80k bench shape (80k corpus, |Q|=50).

Identity is FULL-FRAME: both variants' (q_id, t_id, cos, rnk) rows collected
and compared sorted — cos is a DOUBLE, so this pins the sequential-fold
replay bit-for-bit, not just the ranking.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_cosine_double_ab.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    cosine_topk_routed_double,
    similarity_topk,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def expr_variant(spark):
    corpus = bench._expanded_embeddings(spark)
    q = corpus.filter(F.col("vec_id") < 50)
    return similarity_topk(q, corpus, k=10, quantized=False)


def routed_variant(spark):
    corpus = bench._expanded_embeddings(spark)
    q = corpus.filter(F.col("vec_id") < 50)
    return cosine_topk_routed_double(q, corpus, k=10, n_blocks=CPUS * 2)


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-cosine-double-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    a = sorted(expr_variant(spark).collect())
    b = sorted(routed_variant(spark).collect())
    print(f"identity: {a == b} ({len(a)} vs {len(b)} rows)", flush=True)
    assert a == b, "routed double scorer diverged from the expression path"

    variants = {"expr": expr_variant, "routed": routed_variant}
    for fn in variants.values():  # warm both
        fn(spark).write.mode("overwrite").format("noop").save()
    readings: dict[str, list[float]] = {}
    for rnd in range(5):
        for var in ("expr", "routed") if rnd % 2 == 0 else ("routed", "expr"):
            spark._jvm.System.gc()
            t0 = time.time()
            variants[var](spark).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            readings.setdefault(var, []).append(dt)
            print(f"round {rnd} {var}: {dt:.3f}s", flush=True)
    print()
    for var, xs in readings.items():
        print(f"{var}: {['%.2f' % x for x in xs]} min {min(xs):.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
