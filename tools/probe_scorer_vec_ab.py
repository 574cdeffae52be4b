"""Interleaved A/B for the round-14 vectorized cogroup scorer.

Compares the OLD _block_cogroup_scorer body (per-query np.lexsort loop +
naive int64 matmul, copied verbatim from the pre-round-14 code) against the
NEW shared scorer (exact-by-bound float64 BLAS + one stable argsort), on the
exact ann_ivf_routed_10k and cosine_topk_80k_vec bench shapes, alternating
variants within one warm session (this host's hypervisor steal makes
non-interleaved A/Bs meaningless — OPTIMIZATION_r14.md §methodology).

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_scorer_vec_ab.py
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
    ivf_assign_vectorized,
    quantize_vec,
    _dot_long,
)
from cell_kn_mvp_etl_ontologies_spark.operators.windows import window_rank_topk
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def old_block_scorer(k: int):
    """Pre-round-14 scorer body, verbatim."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "q_id": pd.Series(dtype="int64"),
            "t_id": pd.Series(dtype="int64"),
            "cos": pd.Series(dtype="float64"),
        }
    )

    def score(mem: pd.DataFrame, qs: pd.DataFrame) -> pd.DataFrame:
        if mem.empty or qs.empty:
            return empty
        t_ids = mem["t_id"].to_numpy(dtype=np.int64)
        T = np.stack(mem["t_vec"].to_numpy()).astype(np.int64)
        t_norm = mem["t_norm"].to_numpy(dtype=np.int64)
        q_ids = qs["q_id"].to_numpy(dtype=np.int64)
        Q = np.stack(qs["q_vec"].to_numpy()).astype(np.int64)
        q_norm = qs["q_norm"].to_numpy(dtype=np.int64)
        dots = T @ Q.T
        cos = dots.astype(np.float64) / np.sqrt(
            q_norm[None, :].astype(np.float64) * t_norm[:, None].astype(np.float64)
        )
        out_q, out_t, out_c = [], [], []
        for j, qid in enumerate(q_ids):
            idx = np.nonzero(t_ids != qid)[0]
            if idx.size == 0:
                continue
            col = cos[idx, j]
            order = np.lexsort((t_ids[idx], -col))[:k]
            sel = idx[order]
            out_q.append(np.full(sel.size, qid, dtype=np.int64))
            out_t.append(t_ids[sel])
            out_c.append(cos[sel, j])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "q_id": np.concatenate(out_q),
                "t_id": np.concatenate(out_t),
                "cos": np.concatenate(out_c),
            }
        )

    return score


def ivf_routed_with(scorer_factory, queries, index, centroids, k, nprobe):
    probe = ivf_assign_vectorized(queries, centroids, nprobe=nprobe).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        quantize_vec(F.col("embedding")).alias("q_vec"),
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    routed = probe.join(q, on="q_id").select("cell", "q_id", "q_vec", "q_norm")
    members = index.select("cell", "t_id", "t_vec", "t_norm")
    cand = (
        members.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInPandas(scorer_factory(k), "q_id long, t_id long, cos double")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-scorer-vec-ab")
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

    variants = {
        "old(loop+int64)": ivf_routed_with(
            old_block_scorer, q10k, st["index"], st["centroids"], 10, 8
        ),
        "new(blas+argsort)": ivf_routed_with(
            S._block_cogroup_scorer, q10k, st["index"], st["centroids"], 10, 8
        ),
    }
    for name, df in variants.items():  # warm both
        df.write.mode("overwrite").format("noop").save()
    res = {n: [] for n in variants}
    for _ in range(4):
        for n, df in variants.items():
            spark._jvm.System.gc()
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            res[n].append(round(time.time() - t0, 3))
    for n, v in res.items():
        print("ann_ivf_routed_10k", n, v, "min", min(v))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
