"""Interleaved A/B + bit-identity for the round-14 Arrow cogroup scorer
(similarity._block_cogroup_scorer_arrow / applyInArrow) against the pandas
twin (applyInPandas), at the exact bench shapes of its two consumers:
ann_ivf_routed_10k (|Q|=10k against the 80k prebuilt index) and
cosine_topk_80k_vec (hash-blocked brute twin).

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_arrow_cogroup_ab.py
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

from cell_kn_mvp_etl_ontologies_spark.operators import similarity as S
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    _dot_long,
    ivf_assign_vectorized,
    quantize_vec,
)
from cell_kn_mvp_etl_ontologies_spark.operators.windows import window_rank_topk
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ivf_routed_with(variant: str, queries, index, centroids, k: int, nprobe: int):
    probe = ivf_assign_vectorized(queries, centroids, nprobe=nprobe).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        quantize_vec(F.col("embedding")).alias("q_vec"),
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    routed = probe.join(q, on="q_id").select("cell", "q_id", "q_vec", "q_norm")
    members = index.select("cell", "t_id", "t_vec", "t_norm")
    co = members.groupBy("cell").cogroup(routed.groupBy("cell"))
    if variant == "arrow":
        cand = co.applyInArrow(
            S._block_cogroup_scorer_arrow(k), "q_id long, t_id long, cos double"
        )
    else:
        cand = co.applyInPandas(
            S._block_cogroup_scorer(k), "q_id long, t_id long, cos double"
        )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def cosine_blocked_with(variant: str, spark, k: int = 10):
    """cosine_topk_routed's exact body (cell hash, explode replication,
    bench n_blocks=CPUS*2) with the scorer variant injected."""
    corpus = bench._expanded_embeddings(spark)
    queries = corpus.filter(F.col("vec_id") < 50)
    n_blocks = CPUS * 2
    t = corpus.select(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks)).cast("int").alias("cell"),
        F.col("vec_id").alias("t_id"),
        quantize_vec(F.col("embedding")).alias("t_vec"),
    ).withColumn("t_norm", _dot_long(F.col("t_vec"), F.col("t_vec")))
    q = queries.select(
        F.col("vec_id").alias("q_id"), quantize_vec(F.col("embedding")).alias("q_vec")
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    routed = q.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("cell"),
        "q_id", "q_vec", "q_norm",
    )
    co = t.groupBy("cell").cogroup(routed.groupBy("cell"))
    if variant == "arrow":
        cand = co.applyInArrow(
            S._block_cogroup_scorer_arrow(k), "q_id long, t_id long, cos double"
        )
    else:
        cand = co.applyInPandas(
            S._block_cogroup_scorer(k), "q_id long, t_id long, cos double"
        )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-arrow-cogroup-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    bench.ann_ivf_80k(spark)  # build + persist the shared 80k index
    st = bench._ANN_STATE
    q10k = st["corpus"].filter(F.col("vec_id") < 10000)

    a = sorted(ivf_routed_with("pandas", q10k, st["index"], st["centroids"], 10, 8).collect())
    b = sorted(ivf_routed_with("arrow", q10k, st["index"], st["centroids"], 10, 8).collect())
    print(f"ivf identity: {a == b} ({len(a)} rows)", flush=True)
    assert a == b

    shapes = {
        "ann_ivf_routed_10k": lambda v: ivf_routed_with(
            v, q10k, st["index"], st["centroids"], 10, 8
        ),
        "cosine_topk_80k_vec": lambda v: cosine_blocked_with(v, spark),
    }
    for fn in shapes.values():  # warm both variants
        for v in ("pandas", "arrow"):
            fn(v).write.mode("overwrite").format("noop").save()
    readings: dict[tuple[str, str], list[float]] = {}
    for rnd in range(4):
        for var in ("pandas", "arrow") if rnd % 2 == 0 else ("arrow", "pandas"):
            for name, fn in shapes.items():
                spark._jvm.System.gc()
                t0 = time.time()
                fn(var).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                readings.setdefault((name, var), []).append(dt)
                print(f"round {rnd} {var} {name}: {dt:.3f}s", flush=True)
    print()
    for name in shapes:
        p = readings[(name, "pandas")]
        r = readings[(name, "arrow")]
        print(
            f"{name}: pandas {['%.2f' % x for x in p]} min {min(p):.3f} | "
            f"arrow {['%.2f' % x for x in r]} min {min(r):.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
