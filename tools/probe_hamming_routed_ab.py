"""Bit-identity + interleaved A/B for a round-15 routed Hamming scorer
candidate (inlined below — MEASURED NEGATIVE, so it ships only here, not in
pq.py: expr min 1.060 s vs routed 1.308 s at the bench shape; the 2-word
bit_count fold is too cheap for the cogroup machinery — exchange + sort +
Arrow hop — to pay for itself, the same conclusion as r14 entry E from the
other direction) against the expression path (pq.hamming_topk —
BroadcastNestedLoopJoin + interpreted bit_count fold), at the exact
ann_hamming_80k bench shape (80k corpus, |Q|=50).

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_hamming_routed_ab.py
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
from cell_kn_mvp_etl_ontologies_spark.operators.pq import hamming_topk


def hamming_topk_routed(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """``hamming_topk`` served through the routed cogroup (round 15 — the
    cosine_topk_routed_double shape applied to the binary rung): targets
    hash into blocks, queries replicate per block, and each block computes
    the xor-popcount distance matrix in numpy (uint16-LUT popcount — exact
    integer, so results are bit-identical to the expression fold's
    ``sum(bit_count(xor))``; identity asserted below).

    What it removes vs the expression twin: the per-pair interpreted
    ``aggregate ∘ zip_with`` fold of the BroadcastNestedLoopJoin plan.  The
    block exchange carries only the packed sign words (2 BIGINTs per row at
    64 dims), so the routed shape's shuffle is ~16 bytes/row — far cheaper
    than the vector rungs'.  The expression path stays the catalog/oracle
    reference (similarity_hamming_* rows)."""
    import numpy as np
    import pyarrow as pa

    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import _pa_list_matrix
    from cell_kn_mvp_etl_ontologies_spark.operators.windows import window_rank_topk as _topk

    spark = queries.sparkSession
    if n_blocks is None:
        n_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    t = PQ.binarize_sign(corpus, id_col, vec_col).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int").alias("cell"),
        F.col("id").alias("t_id"),
        F.col("words").alias("tw"),
    )
    q = PQ.binarize_sign(queries, id_col, vec_col).select(
        F.col("id").alias("q_id"), F.col("words").alias("qw")
    )
    routed = q.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("cell"),
        "q_id",
        "qw",
    )

    lut16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.int64)
    empty = pa.table(
        {
            "q_id": pa.array([], pa.int64()),
            "t_id": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )

    def score(mem: "pa.Table", qs: "pa.Table") -> "pa.Table":
        if mem.num_rows == 0 or qs.num_rows == 0:
            return empty
        t_ids = mem.column("t_id").to_numpy()
        ord_t = np.argsort(t_ids, kind="stable")
        t_ids = t_ids[ord_t]
        T = _pa_list_matrix(mem.column("tw"), np)[ord_t]
        q_ids = qs.column("q_id").to_numpy()
        Q = _pa_list_matrix(qs.column("qw"), np)
        if T.shape[1] != Q.shape[1]:
            raise ValueError(
                f"hamming_topk_routed: word widths differ ({T.shape[1]} vs {Q.shape[1]})"
            )
        if (T.size and int(T.max(initial=0)) >> 32) or (
            Q.size and int(Q.max(initial=0)) >> 32
        ):
            # the 2×uint16 popcount below covers 32-bit words only — fail
            # loudly on a wider packing instead of silently dropping bits
            raise ValueError("hamming_topk_routed: packed word exceeds 32 bits")
        ham = np.zeros((t_ids.size, q_ids.size), dtype=np.int64)
        for w in range(T.shape[1]):
            # packed words are 32-bit non-negative (binarize_sign contract),
            # so the xor fits the low 4 bytes; popcount via two uint16-LUT
            # gathers — exact integer, identical to bit_count(xor)
            x = T[:, w][:, None] ^ Q[:, w][None, :]
            ham += lut16[x & 0xFFFF]
            ham += lut16[(x >> 16) & 0xFFFF]
        from cell_kn_mvp_etl_ontologies_spark.operators.similarity import grouped_topk_indices

        q_idx, t_row = grouped_topk_indices(ham, t_ids, q_ids, k)
        if q_idx.size == 0:
            return empty
        return pa.table(
            {"q_id": q_ids[q_idx], "t_id": t_ids[t_row], "hamming": ham[t_row, q_idx]}
        )

    cand = (
        t.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInArrow(score, "q_id long, t_id long, hamming long")
    )
    return _topk(
        cand, ["q_id"], [F.col("hamming").asc(), F.col("t_id").asc()], k, rank_col="rnk"
    )

from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-hamming-routed-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    bench.ann_ivf_80k(spark)  # persisted shared corpus
    corpus = bench._ANN_STATE["corpus"]
    q = corpus.filter(F.col("vec_id") < 50)

    variants = {
        "expr": lambda: hamming_topk(q, corpus, k=10),
        "routed": lambda: hamming_topk_routed(q, corpus, k=10, n_blocks=CPUS * 2),
    }
    a = sorted(map(tuple, variants["expr"]().collect()))
    b = sorted(map(tuple, variants["routed"]().collect()))
    print(f"identity: {a == b} ({len(a)} rows)", flush=True)
    assert a == b

    for fn in variants.values():  # warm
        fn().write.mode("overwrite").format("noop").save()
    readings: dict[str, list[float]] = {}
    for rnd in range(5):
        for name in ("expr", "routed") if rnd % 2 == 0 else ("routed", "expr"):
            spark._jvm.System.gc()
            t0 = time.time()
            variants[name]().write.mode("overwrite").format("noop").save()
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
