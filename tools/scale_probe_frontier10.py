"""Scale probes for the round-13 frontier10 operators (SCALE.md §frontier10):

A. Louvain at 10× edges (sf0.1): wall, community counts, and the exact
   4m²·Q uplift chain singleton < level-1 < two-level — the modularity
   monotonicity claim at the bigger graph, plus wall linearity (the
   per-round work is census-shaped).
B. The text/eval batch at 10× contract slices (sf0.1, doc_id bound ×10):
   chrF parts, ROUGE-L, and the BPE packing chain — wall and output
   grain (chrF stays 3 rows; ROUGE rows = docs; packing bins grow with
   corpus mass, never quadratically).
C. Isotonic calibration on the FULL sf0.1 corpus (5,000 docs): the
   distinct-score grid (PAV's real input size) vs row count — the
   corpus-collapses-to-grid claim.

Run:  python tools/scale_probe_frontier10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = "/root/testdata/sf0.1"


def main() -> None:
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}

    # A — Louvain chain at 10x edges
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        louvain_rounds,
        louvain_two_level,
    )

    li = load_table(spark, SF, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("dst"),
    )
    e = edges.filter(F.col("src") != F.col("dst")).distinct()
    m = e.count()
    out["graph"] = {"m_edges": m}

    t0 = time.monotonic()
    l1 = louvain_rounds(edges, n_rounds=4).collect()
    out["louvain_rounds_10x"] = {
        "wall_s": round(time.monotonic() - t0, 1),
        "n_communities": len(l1),
        "q4m2": sum(r.q_num_part for r in l1),
    }
    t0 = time.monotonic()
    l2 = louvain_two_level(edges, n_rounds1=4, n_rounds2=3).collect()
    out["louvain_two_level_10x"] = {
        "wall_s": round(time.monotonic() - t0, 1),
        "n_communities": len(l2),
        "q4m2": sum(r.q_num_part for r in l2),
    }
    deg = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    q_singleton = -sum(r.k * r.k for r in deg.collect())
    out["graph"]["q4m2_singleton"] = q_singleton
    out["graph"]["monotone"] = (
        q_singleton
        < out["louvain_rounds_10x"]["q4m2"]
        <= out["louvain_two_level_10x"]["q4m2"]
    )

    # B — text/eval batch at 10x slices
    docs = load_table(spark, SF, "documents")

    import cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 as f10

    def chrf_10x():
        pairs = docs.filter(F.col("doc_id") < 1000).select(
            "doc_id",
            F.regexp_replace(F.lower(F.expr("substring(text, 1, 200)")), r"\s+", "").alias("cs"),
            F.regexp_replace(F.lower(F.expr("substring(text, 11, 200)")), r"\s+", "").alias("rs"),
        )
        cg = f10._chrf_gram_census(pairs, "cs", "c")
        rg = f10._chrf_gram_census(pairs, "rs", "r")
        matched = (
            cg.join(rg.select("doc_id", "n", "g", F.col("c").alias("rc")), on=["doc_id", "n", "g"])
            .groupBy("n")
            .agg(F.sum(F.least("c", "rc")).alias("m"))
        )
        return matched.count()

    for name, fn in [("chrf_1000docs", chrf_10x)]:
        t0 = time.monotonic()
        n = fn()
        out[name] = {"wall_s": round(time.monotonic() - t0, 1), "rows": n}

    # rouge at 10x docs via the registered operator body with a wider slice
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES, load_all

    load_all()
    t0 = time.monotonic()
    n = QUERIES["eval_rouge_l"](spark, SF).count()
    out["rouge_contract_sf01"] = {"wall_s": round(time.monotonic() - t0, 1), "rows": n}

    t0 = time.monotonic()
    n = QUERIES["pack_sequences_bpe"](spark, SF).count()
    out["pack_bpe_contract_sf01"] = {"wall_s": round(time.monotonic() - t0, 1), "rows": n}

    # C — isotonic grid on the full sf0.1 corpus
    scored = docs.select(
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("score_ppm")
    )
    out["isotonic_grid_sf01"] = {
        "rows": docs.count(),
        "distinct_scores": scored.distinct().count(),
    }
    t0 = time.monotonic()
    n = QUERIES["eval_isotonic_calibration"](spark, SF).count()
    out["isotonic_sf01"] = {"wall_s": round(time.monotonic() - t0, 1), "pools": n}

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
