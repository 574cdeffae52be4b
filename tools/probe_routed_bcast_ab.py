"""Interleaved A/B + bit-identity for the round-15 broadcast of the query
batch into the routed serving paths' routing join (similarity.
ivf_topk_prebuilt_routed / pq.ivf_pq_topk_routed): without the hint the
planner sort-merge joins probe × q — two exchanges + two sorts of
query-scale frames per serve — to attach the quantized query vectors to
their probe rows.

Variants are built inline (smj = the pre-round-15 join, bcast = the shipped
F.broadcast(q) form) so the A/B interleaves in ONE warm session.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_routed_bcast_ab.py
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

from cell_kn_mvp_etl_ontologies_spark.operators import pq as PQ
from cell_kn_mvp_etl_ontologies_spark.operators import similarity as S
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    _dot_long,
    ivf_assign_vectorized,
    quantize_vec,
)
from cell_kn_mvp_etl_ontologies_spark.operators.windows import window_rank_topk
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ivf_routed_with(bcast: bool, queries, index, centroids, k: int, nprobe: int):
    probe = ivf_assign_vectorized(queries, centroids, nprobe=nprobe).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        quantize_vec(F.col("embedding")).alias("q_vec"),
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    q_side = F.broadcast(q) if bcast else q
    routed = probe.join(q_side, on="q_id").select("cell", "q_id", "q_vec", "q_norm")
    members = index.select("cell", "t_id", "t_vec", "t_norm")
    cand = (
        members.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInArrow(S._block_cogroup_scorer_arrow(k), "q_id long, t_id long, cos double")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-routed-bcast-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    bench.ann_ivf_80k(spark)  # build + persist the shared 80k index
    bench._ensure_ivf_pq_artifacts(spark)
    st = bench._ANN_STATE
    q10k = st["corpus"].filter(F.col("vec_id") < 10000)
    q50 = st["corpus"].filter(F.col("vec_id") < 50)

    a = sorted(ivf_routed_with(False, q10k, st["index"], st["centroids"], 10, 8).collect())
    b = sorted(ivf_routed_with(True, q10k, st["index"], st["centroids"], 10, 8).collect())
    print(f"ivf identity: {a == b} ({len(a)} rows)", flush=True)
    assert a == b

    # the shipped ivf_pq_topk_routed already broadcasts; its smj twin is the
    # same body with the hint stripped — reuse the module fn for bcast and
    # monkeypatch-free inline for smj via a tiny wrapper over the private
    # pieces is not worth duplicating 80 lines, so A/B the IVF shape (the
    # joined frames are the same probe × q pattern at the same |Q|) and
    # time the shipped pq path separately for the record.
    shapes = {
        "ann_ivf_routed_10k[smj]": lambda: ivf_routed_with(
            False, q10k, st["index"], st["centroids"], 10, 8
        ),
        "ann_ivf_routed_10k[bcast]": lambda: ivf_routed_with(
            True, q10k, st["index"], st["centroids"], 10, 8
        ),
        "ann_ivf_pq_80k[shipped]": lambda: PQ.ivf_pq_topk_routed(
            q50, st["ivf_pq_index"], st["centroids"], st["pq_books"],
            k=10, nprobe=8, m=8,
        ),
    }
    for fn in shapes.values():  # warm
        fn().write.mode("overwrite").format("noop").save()
    readings: dict[str, list[float]] = {}
    order = list(shapes)
    for rnd in range(5):
        for name in order if rnd % 2 == 0 else reversed(order):
            spark._jvm.System.gc()
            t0 = time.time()
            shapes[name]().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            readings.setdefault(name, []).append(dt)
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    print()
    for name, xs in readings.items():
        print(f"{name}: {['%.2f' % x for x in xs]} min {min(xs):.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
