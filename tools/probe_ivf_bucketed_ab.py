"""Interleaved A/B + bit-identity for the round-15 bucketed+sorted IVF
index landing table (VERDICT r14 #1): persist the cell-keyed index via
``bucketBy(NB, "cell").sortBy("cell").saveAsTable`` so the cogroup's
required distribution (and, with the legacy bucketed-scan-ordering conf,
its required ordering) is satisfied FROM STORAGE, deleting the per-serve
member-side Exchange/Sort that survives the cached-index path (entry N
of round 14 proved the cache does not propagate ordering).

Three member variants at the ann_ivf_routed_10k bench shape:
  cached    — the shipped path (persisted index; partitioning preserved by
              the cache, Sort paid per serve)
  bucketed  — bucketed+sorted table scan (default confs)
  bucketed+ord — same scan with
              spark.sql.legacy.bucketedTableScan.outputOrdering=true
              (one file per bucket is guaranteed by repartitioning on cell
              into NB partitions before the write)

Prints the member-side Exchange/Sort counts of each variant's formatted
plan, asserts outputs identical, then interleaves min-of-N timings.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_ivf_bucketed_ab.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    ivf_topk_prebuilt_routed,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WH = "/tmp/r15_bucketed_probe_wh"


def plan_counts(df) -> str:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n_ex = sum(1 for line in plan.splitlines() if "Exchange (" in line)
    n_sort = sum(1 for line in plan.splitlines() if "Sort (" in line)
    return f"exchanges={n_ex} sorts={n_sort}"


def main() -> int:
    shutil.rmtree(WH, ignore_errors=True)
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-ivf-bucketed-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", WH)
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    bench.ann_ivf_80k(spark)  # build + persist the shared 80k index
    st = bench._ANN_STATE
    q10k = st["corpus"].filter(F.col("vec_id") < 10000)
    nb = CPUS * 2

    # one file per bucket: pre-partition on the bucket key into NB tasks
    (
        st["index"]
        .repartition(nb, "cell")
        .write.bucketBy(nb, "cell")
        .sortBy("cell")
        .mode("overwrite")
        .saveAsTable("ivf_idx_bucketed")
    )
    bucketed = spark.table("ivf_idx_bucketed")

    def serve(index):
        return ivf_topk_prebuilt_routed(
            q10k, index, st["centroids"], k=10, nprobe=8
        )

    def with_ord(flag: bool, fn):
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", str(flag).lower())
        try:
            return fn()
        finally:
            spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")

    print("cached:        ", plan_counts(serve(st["index"])), flush=True)
    print("bucketed:      ", plan_counts(serve(bucketed)), flush=True)
    print("bucketed+ord:  ", with_ord(True, lambda: plan_counts(serve(bucketed))), flush=True)

    a = sorted(serve(st["index"]).collect())
    b = sorted(serve(bucketed).collect())
    c = with_ord(True, lambda: sorted(serve(bucketed).collect()))
    print(f"identity: cached==bucketed {a == b}, cached==bucketed+ord {a == c} ({len(a)} rows)", flush=True)
    assert a == b and a == c

    variants = {
        "cached": lambda: serve(st["index"]).write.mode("overwrite").format("noop").save(),
        "bucketed": lambda: serve(bucketed).write.mode("overwrite").format("noop").save(),
        "bucketed+ord": lambda: with_ord(
            True, lambda: serve(bucketed).write.mode("overwrite").format("noop").save()
        ),
    }
    for fn in variants.values():  # warm
        fn()
    readings: dict[str, list[float]] = {}
    order = list(variants)
    for rnd in range(5):
        for name in order if rnd % 2 == 0 else reversed(order):
            spark._jvm.System.gc()
            t0 = time.time()
            variants[name]()
            dt = time.time() - t0
            readings.setdefault(name, []).append(dt)
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    print()
    for name, xs in readings.items():
        print(f"{name}: {['%.2f' % x for x in xs]} min {min(xs):.3f}")
    spark.stop()
    shutil.rmtree(WH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
