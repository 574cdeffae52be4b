"""Round-10 settlement probes (VERDICT r9 #2/#3): quiet-window min-of-5
stage-level A/B on the three rows the r9 driver window flagged —
`maxsim_routed_10k` (1.50× its 7.48 band, the round's one `weak` row),
`asof_events` (1.34 normalized vs 0.98 band), `graph_build_full` (10.50
vs 6.76 band, worst driver-window reading three rounds running).

Methodology (the pq_rerank settlement playbook, BASELINE.md round-8):
1. sentinels first — a window only counts if q1/running_windows land
   within ~1.3× of their pinned nominals (0.9 / 0.45 s);
2. min-of-5 per stage with inter-iteration GC;
3. maxsim is split at its three seams (routing chain, pack+cell-join,
   full cogroup+topk) so a regression localizes to one seam instead of
   "the row is slow".

Run:  python tools/probe_r10_settlement.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (  # noqa: E402
    maxsim_route_cells,
    quantize_vec,
)
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


def _maxsim_inputs(spark):
    corpus = bench._expanded_embeddings(spark)
    toks = corpus.select(
        F.expr("vec_id div 8").cast("long").alias("t_id"),
        (F.col("vec_id") % 8).cast("long").alias("t_tok"),
        F.col("embedding").alias("vec"),
    )
    q_tokens = toks.filter(F.col("t_id") < 50).select(
        F.col("t_id").alias("q_id"), F.col("t_tok").alias("q_tok"), "vec"
    )
    return q_tokens, toks


def stage_route(spark):
    q_tokens, toks = _maxsim_inputs(spark)
    q_cells, t_cells = maxsim_route_cells(q_tokens, toks, 64, 8, 1000)
    return t_cells.unionByName(
        q_cells.withColumnRenamed("q_id", "t_id")
    )


def stage_pack(spark):
    # the two _pack aggregations + the cell joins, everything upstream of
    # the cogroup (mirrors maxsim_topk_routed_vectorized's internals)
    q_tokens, toks = _maxsim_inputs(spark)
    q_cells, t_cells = maxsim_route_cells(q_tokens, toks, 64, 8, 1000)

    def _pack(tokens, id_col, tok_col):
        q = tokens.select(
            F.col(id_col),
            F.col(tok_col).alias("_tok"),
            quantize_vec(F.col("vec"), 1000).alias("_qv"),
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
        (F.col("cell") + F.lit(0)).alias("cell"),
        F.col("q_id").alias("t_id"),
        "n_toks",
        "toks",
    )
    t_packed = _pack(toks, "t_id", "t_tok").join(t_cells, "t_id").select(
        "cell", "t_id", "n_toks", "toks"
    )
    return t_packed.unionByName(q_packed)


def main() -> None:
    builder = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .appName("r10-settlement-probe")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # same warmups as bench.main
    bench.load_table(spark, bench.SF_DIR, "lineitem").count()
    (
        spark.range(10000)
        .select((F.col("id") % 100).alias("k"), F.col("id").cast("string").alias("v"))
        .groupBy("k")
        .agg(F.sort_array(F.collect_set("v")).alias("vs"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    def _warm(batches):
        import numpy as np  # noqa: F401
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"]})

    spark.range(1000).mapInPandas(_warm, "id long").write.mode("overwrite").format(
        "noop"
    ).save()

    out: dict = {"sentinels": {}, "stages": {}}
    out["sentinels"]["q1_pricing_summary"] = _mintime(
        spark, bench.q1_pricing_summary, n=3
    )
    out["sentinels"]["running_windows"] = _mintime(spark, bench.running_windows, n=3)
    noise = max(
        out["sentinels"]["q1_pricing_summary"] / 0.9,
        out["sentinels"]["running_windows"] / 0.45,
    )
    out["host_noise_ratio"] = round(noise, 2)

    out["stages"]["maxsim_route_only"] = _mintime(spark, stage_route)
    out["stages"]["maxsim_route_pack"] = _mintime(spark, stage_pack)
    out["stages"]["maxsim_full"] = _mintime(spark, bench.maxsim_routed_10k)
    out["stages"]["asof_events"] = _mintime(spark, bench.asof_events)
    out["stages"]["graph_build_full"] = _mintime(spark, bench.graph_build_full)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
