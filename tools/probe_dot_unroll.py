"""A/B probe for the round-14 codegen fast path in the expression dot
helpers (similarity._dot/_dot_long/sq_dist_long/quantize_vec).

1. Semantics: on a mixed frame (64-dim, 8-dim, 3-dim, NULL, NULL-element
   vectors) the new guarded expression must equal the raw HOF fold
   bit-for-bit.
2. Speed: min-of-N of the cosine_topk_80k bench shape (4M pairs x 64-dim
   dots) with the noop sink.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_dot_unroll.py
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
from cell_kn_mvp_etl_ontologies_spark.operators import similarity as S
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def hof_dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def hof_dot_long(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def hof_sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hof_quant(v, scale=1000):
    return F.transform(v, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-dot-unroll")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. semantics on a hostile mixed frame ---
    rows = []
    import random

    rnd = random.Random(7)
    for i in range(2000):
        dim = [64, 8, 3][i % 3]
        a = [rnd.uniform(-1, 1) for _ in range(dim)]
        b = [rnd.uniform(-1, 1) for _ in range(dim)]
        if i % 17 == 0:
            a = None
        elif i % 23 == 0:
            a[dim // 2] = None
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    cmp = df.select(
        "id",
        S._dot(F.col("a"), F.col("b")).eqNullSafe(hof_dot(F.col("a"), F.col("b"))).alias("d_ok"),
        S._dot_long(hof_quant(F.col("a")), hof_quant(F.col("b")))
        .eqNullSafe(hof_dot_long(hof_quant(F.col("a")), hof_quant(F.col("b"))))
        .alias("dl_ok"),
        S.sq_dist_long(hof_quant(F.col("a")), hof_quant(F.col("b")))
        .eqNullSafe(hof_sq(hof_quant(F.col("a")), hof_quant(F.col("b"))))
        .alias("sq_ok"),
        S.quantize_vec(F.col("a")).eqNullSafe(hof_quant(F.col("a"))).alias("q_ok"),
    )
    bad = cmp.filter(~(F.col("d_ok") & F.col("dl_ok") & F.col("sq_ok") & F.col("q_ok"))).count()
    print(f"semantics: {bad} mismatching rows (want 0)")
    assert bad == 0, "fast path diverges from HOF"

    # --- 2. speed at the cosine_topk_80k shape ---
    def timed(fn, n=5):
        best = float("inf")
        for _ in range(n):
            spark._jvm.System.gc()
            t0 = time.time()
            fn(spark).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return best

    for name in ("cosine_topk_80k", "cosine_topk", "ann_lsh"):
        t = timed(bench.BENCH_QUERIES[name])
        print(f"{name}: min-of-5 {t:.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
