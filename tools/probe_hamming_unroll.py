"""A/B probe for the round-14 codegen fast path in pq.hamming_words.

1. Semantics: on a mixed frame (2-word, 4-word, 1-word, NULL arrays,
   NULL elements) the guarded unroll must equal the raw HOF fold
   bit-for-bit under eqNullSafe.
2. Speed: interleaved min-of-N of the ann_hamming_80k bench shape
   (80k corpus x 50 queries, 2 packed words) with the noop sink,
   HOF variant vs shipped hamming_words alternating in one session.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_hamming_unroll.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import bench
from cell_kn_mvp_etl_ontologies_spark.operators import pq as P
from cell_kn_mvp_etl_ontologies_spark.operators.windows import window_rank_topk
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def hof_hamming(qw, tw):
    return F.aggregate(
        F.zip_with(qw, tw, lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming_topk_variant(queries, corpus, k, ham_fn):
    q = P.binarize_sign(queries, "vec_id", "embedding").select(
        F.col("id").alias("q_id"), F.col("words").alias("qw")
    )
    t = P.binarize_sign(corpus, "vec_id", "embedding").select(
        F.col("id").alias("t_id"), F.col("words").alias("tw")
    )
    pairs = t.join(F.broadcast(q), on=F.lit(True), how="inner").filter(
        F.col("q_id") != F.col("t_id")
    )
    scored = pairs.select("q_id", "t_id", ham_fn(F.col("qw"), F.col("tw")).alias("hamming"))
    return window_rank_topk(
        scored, ["q_id"], [F.col("hamming").asc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-hamming-unroll")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. semantics on a hostile mixed frame ---
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(4000):
        n = [2, 4, 1][i % 3]
        a = [rnd.randint(-(2**31), 2**31 - 1) for _ in range(n)]
        b = [rnd.randint(-(2**31), 2**31 - 1) for _ in range(n)]
        if i % 17 == 0:
            a = None
        elif i % 23 == 0:
            a[n // 2] = None
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "id long, a array<int>, b array<int>")
    bad = (
        df.select(
            P.hamming_words(F.col("a"), F.col("b"))
            .eqNullSafe(hof_hamming(F.col("a"), F.col("b")))
            .alias("ok")
        )
        .filter(~F.col("ok"))
        .count()
    )
    print(f"semantics: {bad} mismatching rows (want 0)")
    assert bad == 0, "hamming fast path diverges from HOF"

    # --- 2. interleaved speed at the ann_hamming_80k shape ---
    bench.ann_ivf_80k(spark)  # build the shared persisted corpus
    corpus = bench._ANN_STATE["corpus"]
    q = corpus.filter(F.col("vec_id") < 50)

    def run(ham_fn):
        spark._jvm.System.gc()
        t0 = time.time()
        hamming_topk_variant(q, corpus, 10, ham_fn).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.time() - t0

    n = 5
    a_times, b_times = [], []
    for _ in range(n):
        a_times.append(run(hof_hamming))
        b_times.append(run(P.hamming_words))
    print(f"HOF      : {[round(t, 3) for t in a_times]} min {min(a_times):.3f}s")
    print(f"unrolled : {[round(t, 3) for t in b_times]} min {min(b_times):.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
