"""Bit-identity + interleaved A/B for the round-15 Arrow conversion of the
two remaining pandas cogroup scorers (pq.ivf_pq_topk_routed, similarity.
maxsim_topk_routed_vectorized) — VERDICT r14 #5.

The pandas twins (the exact pre-round-15 scorer bodies) are reconstructed
inline here so both variants interleave in ONE warm session.  Shapes:

- pq bench shape: 80k corpus / 64 cells / |Q|=50 / nprobe=8 (the
  ann_ivf_pq_80k row), plus a 40× query-load shape (|Q|=2000) where the
  boxed-row count across the boundary grows toward the 100 TB regime.
- maxsim bench shape: 10k docs × 8 tokens / 64 cells / |Q|=50 / nprobe=8
  (the maxsim_routed_10k row — this one carries 512-int flat matrices per
  row, the heaviest boxing on the board).

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_pq_maxsim_arrow_ab.py
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
    grouped_topk_indices,
    ivf_assign_vectorized,
    quantize_vec,
)
from cell_kn_mvp_etl_ontologies_spark.operators.windows import window_rank_topk
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ivf_pq_routed_pandas(queries, index_codes, centroids, codebooks, k, nprobe, m):
    """The exact pre-round-15 ivf_pq_topk_routed body (pandas cogroup)."""
    import numpy as np
    import pandas as pd

    crows = codebooks.select("sub", "cell", "cv").collect()
    by_sub: dict[int, list] = {}
    for r in crows:
        by_sub.setdefault(int(r.sub), []).append((int(r.cell), list(r.cv)))
    C, cell_order = {}, {}
    for sub, rows_ in by_sub.items():
        rows_.sort()
        cell_order[sub] = np.array([c for c, _ in rows_], dtype=np.int64)
        C[sub] = np.array([v for _, v in rows_], dtype=np.int64)
    subdim = C[0].shape[1]

    probe = ivf_assign_vectorized(queries, centroids, nprobe=nprobe).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), quantize_vec(F.col("embedding")).alias("q_vec")
    )
    routed = probe.join(F.broadcast(q), on="q_id").select("cell", "q_id", "q_vec")
    members = index_codes.select("cell", "t_id", "codes")

    empty = pd.DataFrame(
        {
            "q_id": pd.Series(dtype="int64"),
            "t_id": pd.Series(dtype="int64"),
            "adc_dist": pd.Series(dtype="int64"),
        }
    )

    def score(mem: pd.DataFrame, qs: pd.DataFrame) -> pd.DataFrame:
        if mem.empty or qs.empty:
            return empty
        t_ids = mem["t_id"].to_numpy(dtype=np.int64)
        codes = np.stack(mem["codes"].to_numpy()).astype(np.int64)
        code_idx = np.empty_like(codes)
        for s in range(m):
            idx = np.searchsorted(cell_order[s], codes[:, s])
            idx = np.clip(idx, 0, cell_order[s].size - 1)
            code_idx[:, s] = idx
        q_ids = qs["q_id"].to_numpy(dtype=np.int64)
        Q = np.stack(qs["q_vec"].to_numpy()).astype(np.int64)
        ord_t = np.argsort(t_ids, kind="stable")
        t_ids = t_ids[ord_t]
        code_idx = code_idx[ord_t]
        adc = np.zeros((t_ids.size, q_ids.size), dtype=np.int64)
        for s in range(m):
            qsub = Q[:, s * subdim:(s + 1) * subdim]
            diff = qsub[:, None, :] - C[s][None, :, :]
            lut = np.einsum("qkd,qkd->qk", diff, diff)
            adc += lut[:, code_idx[:, s]].T
        q_idx, t_row = grouped_topk_indices(adc, t_ids, q_ids, k)
        if q_idx.size == 0:
            return empty
        return pd.DataFrame(
            {"q_id": q_ids[q_idx], "t_id": t_ids[t_row], "adc_dist": adc[t_row, q_idx]}
        )

    cand = (
        members.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInPandas(score, "q_id long, t_id long, adc_dist long")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("adc_dist").asc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def maxsim_pandas(spark, k=10):
    """maxsim_routed_10k's bench body with the pre-round-15 pandas scorer."""
    import numpy as np
    import pandas as pd

    corpus = bench._expanded_embeddings(spark)
    toks = corpus.select(
        F.expr("vec_id div 8").cast("long").alias("t_id"),
        (F.col("vec_id") % 8).cast("long").alias("t_tok"),
        F.col("embedding").alias("vec"),
    )
    q_tokens = toks.filter(F.col("t_id") < 50).select(
        F.col("t_id").alias("q_id"), F.col("t_tok").alias("q_tok"), "vec"
    )
    n_cells, nprobe, scale = 64, 8, 1000
    q_cells, t_cells = S.maxsim_route_cells(q_tokens, toks, n_cells, nprobe, scale)

    def _pack(tokens, id_col, tok_col):
        q = tokens.select(
            F.col(id_col),
            F.col(tok_col).alias("_tok"),
            quantize_vec(F.col("vec"), scale).alias("_qv"),
        )
        packed = q.groupBy(id_col).agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_tok", "_qv"))),
                lambda s: s["_qv"],
            ).alias("_toks")
        )
        return packed.select(
            id_col,
            F.size("_toks").cast("long").alias("n_toks"),
            F.flatten("_toks").alias("toks"),
        )

    q_packed = _pack(q_tokens, "q_id", "q_tok").join(q_cells, "q_id").select(
        (F.col("cell") + F.lit(0)).alias("cell"), "q_id", "n_toks", "toks"
    )
    t_packed = _pack(toks, "t_id", "t_tok").join(t_cells, "t_id").select(
        "cell", "t_id", "n_toks", "toks"
    )

    empty = pd.DataFrame(
        {
            "q_id": pd.Series(dtype="int64"),
            "t_id": pd.Series(dtype="int64"),
            "maxsim_units": pd.Series(dtype="int64"),
            "n_q_tokens": pd.Series(dtype="int64"),
        }
    )

    def score(mem: pd.DataFrame, qs: pd.DataFrame) -> pd.DataFrame:
        if mem.empty or qs.empty:
            return empty
        t_ids = mem["t_id"].to_numpy(dtype=np.int64)
        counts = mem["n_toks"].to_numpy(dtype=np.int64)
        flat = [np.asarray(m_, dtype=np.int64) for m_ in mem["toks"]]
        dim = flat[0].size // int(counts[0])
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        T_all = np.concatenate(flat).reshape(-1, dim)
        frames = []
        for qid, qn, qtoks in zip(
            qs["q_id"].to_numpy(dtype=np.int64),
            qs["n_toks"].to_numpy(dtype=np.int64),
            qs["toks"],
        ):
            Q = np.asarray(qtoks, dtype=np.int64).reshape(int(qn), -1)
            mq = int(np.abs(Q).max(initial=0))
            mt = int(np.abs(T_all).max(initial=0))
            if mq * mt * Q.shape[1] * max(int(qn), 1) < 2**53:
                dots = Q.astype(np.float64) @ T_all.T.astype(np.float64)
                seg_max = np.maximum.reduceat(dots, starts, axis=1)
                sums = seg_max.sum(axis=0).astype(np.int64)
            else:
                dots = Q @ T_all.T
                seg_max = np.maximum.reduceat(dots, starts, axis=1)
                sums = seg_max.sum(axis=0)
            keep = t_ids != qid
            if not keep.any():
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "q_id": np.full(int(keep.sum()), qid, dtype=np.int64),
                        "t_id": t_ids[keep],
                        "maxsim_units": sums[keep],
                        "n_q_tokens": np.full(int(keep.sum()), int(qn), dtype=np.int64),
                    }
                )
            )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    cand = (
        t_packed.groupBy("cell")
        .cogroup(q_packed.groupBy("cell"))
        .applyInPandas(score, "q_id long, t_id long, maxsim_units long, n_q_tokens long")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("maxsim_units").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def maxsim_arrow(spark, k=10):
    corpus = bench._expanded_embeddings(spark)
    toks = corpus.select(
        F.expr("vec_id div 8").cast("long").alias("t_id"),
        (F.col("vec_id") % 8).cast("long").alias("t_tok"),
        F.col("embedding").alias("vec"),
    )
    q_tokens = toks.filter(F.col("t_id") < 50).select(
        F.col("t_id").alias("q_id"), F.col("t_tok").alias("q_tok"), "vec"
    )
    return S.maxsim_topk_routed_vectorized(
        q_tokens, toks, k=k, n_cells=64, nprobe=8, scale=1000
    )


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-pq-maxsim-arrow-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for kk, v in ENGINE_SQL_CONF.items():
        builder = builder.config(kk, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    bench._ensure_ivf_pq_artifacts(spark)
    st = bench._ANN_STATE
    q50 = st["corpus"].filter(F.col("vec_id") < 50)
    q2000 = st["corpus"].filter(F.col("vec_id") < 2000)

    def pq_arrow(q):
        return PQ.ivf_pq_topk_routed(
            q, st["ivf_pq_index"], st["centroids"], st["pq_books"], k=10, nprobe=8, m=8
        )

    def pq_pandas(q):
        return ivf_pq_routed_pandas(
            q, st["ivf_pq_index"], st["centroids"], st["pq_books"], 10, 8, 8
        )

    a = sorted(pq_pandas(q2000).collect())
    b = sorted(pq_arrow(q2000).collect())
    print(f"pq identity (|Q|=2000): {a == b} ({len(a)} rows)", flush=True)
    assert a == b

    a = sorted(maxsim_pandas(spark).collect())
    b = sorted(maxsim_arrow(spark).collect())
    print(f"maxsim identity: {a == b} ({len(a)} rows)", flush=True)
    assert a == b

    shapes = {
        "ann_ivf_pq_80k[pandas]": lambda: pq_pandas(q50),
        "ann_ivf_pq_80k[arrow]": lambda: pq_arrow(q50),
        "ivf_pq_q2000[pandas]": lambda: pq_pandas(q2000),
        "ivf_pq_q2000[arrow]": lambda: pq_arrow(q2000),
        "maxsim_routed_10k[pandas]": lambda: maxsim_pandas(spark),
        "maxsim_routed_10k[arrow]": lambda: maxsim_arrow(spark),
    }
    for fn in shapes.values():  # warm
        fn().write.mode("overwrite").format("noop").save()
    readings: dict[str, list[float]] = {}
    order = list(shapes)
    for rnd in range(4):
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
