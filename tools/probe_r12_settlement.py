"""Round-12 band adjudication for `cosine_topk_80k` (VERDICT r11 #4): the
4.60 band has three consecutive over-band quiet-ish readings (normalized
4.85 / 5.42 / 5.69 across the post-r10 cluster) — one more quiet min-of-5
decides: if it lands in the cluster, re-base to the cluster median with
the readings pinned in BASELINE.md (the graph_build_full r10 precedent);
if it lands ≤ 4.6, record the bimodality and keep the band.

Methodology (the pq_rerank settlement playbook): sentinels first (window
counts only if q1/running_windows land within ~1.3× of their 0.9/0.45 s
nominals), then min-of-5 with inter-iteration GC + clearCache, normalized
by the geometric-mean sentinel ratio exactly as bench.py does.  The routed
siblings (`cosine_topk_80k_vec`, `ann_ivf_80k`) are re-measured in the
same window as controls: if the brute row drifted but the siblings did
not, the cost is row-specific (storage-cache interaction with the 80k
ground-truth scan), not window noise.

Run:  python tools/probe_r12_settlement.py
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
    load_table(spark, bench.SF_DIR, "embeddings").count()

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

    for name in ("cosine_topk_80k", "cosine_topk_80k_vec", "ann_ivf_80k"):
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
