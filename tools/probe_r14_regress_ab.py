"""Interleaved A/B: entry-A/E unrolled-codegen fast paths vs the raw HOF
folds, AT THE BENCH ROWS that blew out in the round-14 full sweep
(ann_ivf_80k 8.5 s vs 1.7 quiet record, cosine_topk_80k, ann_hamming_80k).

The full-sweep blowup could be (a) a real regression from the unroll
commits or (b) hypervisor-steal window noise the tiny sentinels miss.
Interleaving variant H (HOF-only, the pre-round-14 expressions, obtained
by monkeypatching the fast-path builders to return the HOF branch) with
variant U (current code) in ONE session separates the two: a regression
shows U > H on paired rounds regardless of window speed.

Also samples /proc/stat steal around each reading so a steal burst is
visible in the output rather than inferred.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_r14_regress_ab.py
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
from cell_kn_mvp_etl_ontologies_spark.operators import similarity as S
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

ROWS = ["cosine_topk_80k", "ann_ivf_80k", "ann_hamming_80k"]

ORIG_FAST = S._dim_fast_path
ORIG_QUANT = S.quantize_vec
ORIG_HAMMING = P.hamming_words


def hof_fast_path(a, b, zero, term, hof):
    return hof


def hof_quantize_vec(v, scale: int = 1000):
    return F.transform(
        v, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
    )


def hof_hamming_words(qw, tw):
    def term(a, b):
        return F.bit_count(a.bitwiseXOR(b)).cast("long")

    return F.aggregate(
        F.zip_with(qw, tw, term), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def set_variant(name: str) -> None:
    if name == "H":
        S._dim_fast_path = hof_fast_path
        S.quantize_vec = hof_quantize_vec
        P.hamming_words = hof_hamming_words
    else:
        S._dim_fast_path = ORIG_FAST
        S.quantize_vec = ORIG_QUANT
        P.hamming_words = ORIG_HAMMING


def cpu_sample():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return sum(vals), vals[7]  # total, steal


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-r14-regress-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # warm: build the shared ANN state once (index build amortized, as in
    # the bench), plus one untimed pass of each row under each variant so
    # codegen/JIT for both plan shapes is compiled before timing
    bench.ann_ivf_80k(spark).write.mode("overwrite").format("noop").save()
    for var in ("U", "H"):
        set_variant(var)
        for row in ROWS:
            bench.BENCH_QUERIES[row](spark).write.mode("overwrite").format(
                "noop"
            ).save()

    readings: dict[tuple[str, str], list[float]] = {}
    steals: dict[tuple[str, str], list[float]] = {}
    for rnd in range(4):
        for var in ("H", "U") if rnd % 2 == 0 else ("U", "H"):
            set_variant(var)
            for row in ROWS:
                spark._jvm.System.gc()
                t_tot0, t_st0 = cpu_sample()
                t0 = time.time()
                bench.BENCH_QUERIES[row](spark).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.time() - t0
                t_tot1, t_st1 = cpu_sample()
                st = (t_st1 - t_st0) / max(t_tot1 - t_tot0, 1)
                readings.setdefault((row, var), []).append(dt)
                steals.setdefault((row, var), []).append(st)
                print(
                    f"round {rnd} {var} {row}: {dt:.3f}s steal={st:.1%}",
                    flush=True,
                )
    set_variant("U")
    print()
    for row in ROWS:
        h = readings[(row, "H")]
        u = readings[(row, "U")]
        print(
            f"{row}: HOF {['%.2f' % x for x in h]} min {min(h):.3f} | "
            f"UNROLL {['%.2f' % x for x in u]} min {min(u):.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
