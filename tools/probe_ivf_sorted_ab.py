"""Interleaved A/B + bit-identity for the round-14 pre-sorted-IVF-index
candidate: persisting the (cell-partitioned) index ALSO sorted by cell
within partitions should satisfy FlatMapCoGroupsIn{Arrow,Pandas}'s required
child ordering from the cache, removing the full member-side Sort that the
routed serving paths currently execute on EVERY query batch
(plans/r14/ann_ivf_routed_10k_after.txt Sort over InMemoryTableScan;
same on the ivf_pq index in ann_ivf_pq_80k_after.txt).

Measures both serving shapes at their bench grain with the index variant
(unsorted vs pre-sorted) injected, outputs asserted identical, and the
TOTAL Sort-node count of each variant's formatted plan compared as a proxy
for the member-branch Sort (``n_sorts`` counts every tree line containing
"Sort (" — query-side and window Sorts are included on both sides of the
A/B, so only the DELTA between variants is meaningful, and a member-side
change offset by an equal opposite query-side change would be masked;
ADVICE r14).

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_ivf_sorted_ab.py
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

from cell_kn_mvp_etl_ontologies_spark.operators.pq import ivf_pq_topk_routed
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    ivf_topk_prebuilt_routed,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def n_sorts(df) -> int:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # tree lines print "Sort (n)"; node-detail lines print "(n) Sort"
    return sum(1 for line in plan.splitlines() if "Sort (" in line)


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-ivf-sorted-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    bench._ensure_ivf_pq_artifacts(spark)  # builds + persists corpus/index/pq
    st = bench._ANN_STATE
    q10k = st["corpus"].filter(F.col("vec_id") < 10000)
    q50 = st["corpus"].filter(F.col("vec_id") < 50)

    # pre-sorted twins of the two persisted serving artifacts
    index_sorted = st["index"].sortWithinPartitions("cell").persist()
    index_sorted.count()
    pq_index_sorted = st["ivf_pq_index"].sortWithinPartitions("cell").persist()
    pq_index_sorted.count()

    def ivf_shape(variant: str):
        idx = index_sorted if variant == "sorted" else st["index"]
        return ivf_topk_prebuilt_routed(q10k, idx, st["centroids"], k=10, nprobe=8)

    def pq_shape(variant: str):
        idx = pq_index_sorted if variant == "sorted" else st["ivf_pq_index"]
        return ivf_pq_topk_routed(
            q50, idx, st["centroids"], st["pq_books"], k=10, nprobe=8, m=8
        )

    for name, fn in (("ivf_routed_10k", ivf_shape), ("ivf_pq_80k", pq_shape)):
        a = sorted(fn("unsorted").collect())
        b = sorted(fn("sorted").collect())
        print(f"{name} identity: {a == b} ({len(a)} rows)", flush=True)
        assert a == b
        print(
            f"{name} plan Sort nodes: unsorted {n_sorts(fn('unsorted'))} "
            f"vs sorted {n_sorts(fn('sorted'))}",
            flush=True,
        )

    shapes = {"ann_ivf_routed_10k": ivf_shape, "ann_ivf_pq_80k": pq_shape}
    for fn in shapes.values():  # warm both variants
        for v in ("unsorted", "sorted"):
            fn(v).write.mode("overwrite").format("noop").save()
    readings: dict[tuple[str, str], list[float]] = {}
    for rnd in range(5):
        for var in ("unsorted", "sorted") if rnd % 2 == 0 else ("sorted", "unsorted"):
            for name, fn in shapes.items():
                spark._jvm.System.gc()
                t0 = time.time()
                fn(var).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                readings.setdefault((name, var), []).append(dt)
                print(f"round {rnd} {var} {name}: {dt:.3f}s", flush=True)
    print()
    for name in shapes:
        u = readings[(name, "unsorted")]
        s = readings[(name, "sorted")]
        print(
            f"{name}: unsorted {['%.2f' % x for x in u]} min {min(u):.3f} | "
            f"sorted {['%.2f' % x for x in s]} min {min(s):.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
