"""Round-13 band adjudication for `graph_wire_sink` (VERDICT r12 #2): the
2.51 band came from the row's first quiet record (r9), but the accumulated
quiet cluster reads 2.505 / 2.526 / 2.582 / 2.741 normalized and the r12
driver sweep settled at raw 1.999 in the same neighborhood — two rounds of
1.09×/1.19× settled readings say the true steady-state cost is ~2.6.  One
more quiet min-of-5 decides: if it lands in the cluster, re-base to the
cluster median (~2.58) with the readings pinned in BASELINE.md (the
graph_build_full r10 / cosine_topk_80k r12 precedent); if it lands ≤ 2.51,
record the bimodality and keep the band.

Methodology (the pq_rerank settlement playbook): sentinels first (window
counts only if q1/running_windows land within ~1.3× of their 0.9/0.45 s
nominals), then min-of-5 with inter-iteration GC + clearCache, normalized
by the geometric-mean sentinel ratio exactly as bench.py does.  Control
rows measured in the same window: `cdc_diff` (CPU/shuffle-bound) and
`bm25_documents` (agg-bound) — if graph_wire_sink reads over-band while
both controls sit at ≤1.2× of their bands, the drift is row-specific
(HTTP/serialization cost), not window noise.

Run:  python tools/probe_r13_settlement.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402


def _mintime(spark, fn, n=5):
    best = float("inf")
    for _ in range(n):
        spark._jvm.System.gc()
        t0 = time.time()
        fn(spark).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    return round(best, 3)


def main() -> None:
    builder = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, bench.SF_DIR, "lineitem").count()
    load_table(spark, bench.SF_DIR, "documents").count()

    out: dict = {}
    out["sentinel_q1"] = _mintime(spark, bench.q1_pricing_summary, 3)
    out["sentinel_running_windows"] = _mintime(spark, bench.running_windows, 3)
    speed = math.exp(
        (
            math.log(out["sentinel_q1"] / 0.9)
            + math.log(out["sentinel_running_windows"] / 0.45)
        )
        / 2
    )
    out["host_speed_ratio"] = round(speed, 3)
    out["window_ok"] = (
        out["sentinel_q1"] <= 0.9 * 1.3
        and out["sentinel_running_windows"] <= 0.45 * 1.3
    )

    # warm the wire state outside the timed loop (bench's steady-state
    # contract: the graph build is the amortized offline artifact)
    bench.graph_wire_sink(spark).collect()

    for name in ("graph_wire_sink", "cdc_diff", "bm25_documents"):
        raw = _mintime(spark, bench.BENCH_QUERIES[name], 5)
        out[f"row_{name}"] = {
            "raw": raw,
            "normalized": round(raw / speed, 3),
            "band": bench.ACCEPTANCE_BANDS[name],
            "ratio": round(raw / speed / bench.ACCEPTANCE_BANDS[name], 2),
        }

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
