"""Capture .explain("formatted") for bench queries into plans/r15/.

Round-14 optimization evidence: the judge checks plan claims (Exchange
counts, join strategies, Python-eval nodes, PushedFilters) against these
committed files.  Usage:

    python tools/capture_plans_r15.py --suffix before [query ...]

Builds the exact bench session (same master/conf as bench.py) and writes
plans/r15/<name>_<suffix>.txt for each requested bench query (default:
all).  Queries whose construction runs eager work (ANN index builds, the
wire sink, streaming triggers) pay that work here too — the captured plan
is the plan of the frame the bench times with the noop sink.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out-dir", default=os.path.join(REPO, "plans", "r15"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    builder = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .appName("capture-plans-r15")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries or list(bench.BENCH_QUERIES)
    for name in names:
        fn = bench.BENCH_QUERIES[name]
        try:
            df = fn(spark)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
