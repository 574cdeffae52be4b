"""Round-11 settlement probes (VERDICT r10 #2): quiet-window min-of-5
stage-level A/B on the four rows the r10 driver window left unsettled —
`positional_index` (2.07× its 1.42 band, the round's ONLY over-band row,
with no mid-round settlement evidence), plus the three pre-registered
window-class regressions `graph_pivot` (1.42×), `cosine_topk_80k_vec`
(1.35×), `minhash_dedup` (1.31×).

Methodology (the pq_rerank settlement playbook, BASELINE.md round-8):
1. sentinels first — a window only counts if q1/running_windows land
   within ~1.3× of their pinned nominals (0.9 / 0.45 s);
2. min-of-5 per row/stage with inter-iteration GC + clearCache;
3. positional_index is split at its seams (tokenize+posexplode only;
   + per-(token,doc) posting agg; + final per-token regroup) AND A/B'd
   across exchange strategies, because the r10 verdict named a concrete
   suspect: the build's single `.repartition("token")` exchange sends a
   stop-word token's ENTIRE posting mass to one partition (an unsalted
   hot-token reducer).
     A: current — one explicit exchange on (token)
     B: exchange on (token, doc_key) — balanced first agg, planner adds
        the (token) exchange for the regroup over compact per-doc rows
     C: no explicit repartition — planner partial-agg + exchanges

Run:  python tools/probe_r11_settlement.py
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

from cell_kn_mvp_etl_ontologies_spark.io import load_table, parallelize  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.search import (  # noqa: E402
    text_en_no_stem_tokens,
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


def _tokens(spark, strategy):
    docs = parallelize(load_table(spark, bench.SF_DIR, "documents"))
    t = docs.select(
        F.col("doc_id").cast("string").alias("doc_key"),
        F.posexplode(text_en_no_stem_tokens(F.col("text"))).alias("pos", "token"),
    ).filter(F.col("token") != "")
    if strategy == "token":
        return t.repartition("token")
    if strategy == "token_doc":
        return t.repartition("token", "doc_key")
    return t  # planner-chosen


def _index_from(tokens):
    per_doc = tokens.groupBy("token", "doc_key").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    return per_doc.groupBy("token").agg(
        F.sort_array(F.collect_list(F.struct("doc_key", "positions"))).alias(
            "postings"
        )
    ).select("token", F.size("postings").cast("long").alias("n_docs"), "postings")


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

    out: dict = {}
    # 1. window quality
    out["sentinel_q1"] = _mintime(spark, bench.q1_pricing_summary, 3)
    out["sentinel_running_windows"] = _mintime(spark, bench.running_windows, 3)
    out["window_ok"] = (
        out["sentinel_q1"] <= 0.9 * 1.3
        and out["sentinel_running_windows"] <= 0.45 * 1.3
    )

    # 2. the flagged rows, min-of-5
    for name in (
        "positional_index",
        "graph_pivot",
        "cosine_topk_80k_vec",
        "minhash_dedup",
    ):
        out[f"row_{name}"] = _mintime(spark, bench.BENCH_QUERIES[name], 5)

    # 3. positional_index stage split (strategy A = current)
    out["pos_stage_tokenize_only"] = _mintime(
        spark, lambda s: _tokens(s, "token").select("token", "pos"), 5
    )
    out["pos_stage_per_doc_agg"] = _mintime(
        spark,
        lambda s: _tokens(s, "token")
        .groupBy("token", "doc_key")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions")),
        5,
    )

    # 4. exchange-strategy A/B on the full build
    for tag, strat in (("A_token", "token"), ("B_token_doc", "token_doc"), ("C_planner", None)):
        out[f"pos_build_{tag}"] = _mintime(
            spark, lambda s, st=strat: _index_from(_tokens(s, st)), 5
        )

    # 5. skew evidence: rows per partition under strategy A vs B
    for tag, strat in (("A_token", "token"), ("B_token_doc", "token_doc")):
        sizes = (
            _tokens(spark, strat)
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
            .collect()[0]
        )
        out[f"partition_skew_{tag}"] = {
            "max_rows": int(sizes.mx),
            "avg_rows": round(float(sizes.avg), 1),
            "skew_x": round(sizes.mx / float(sizes.avg), 2),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
