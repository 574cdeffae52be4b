"""Scale probes for the round-7 frontier3 operator families.

Three measurements for SCALE.md:
  1. TF-IDF 10x: wall at 1x vs 10x corpus (docs replicated with shifted
     ids) — the tokenize/tf/df chain should scale ~linearly because df
     aggregates the tf TABLE, never the raw token stream.
  2. Sorted-neighborhood blocking: candidate pairs actually compared vs
     the all-pairs count the window dodged.
  3. k-truss peel: edge-set size per round — round 1 is the cost ceiling
     because the set strictly shrinks.

Run: python tools/probe_frontier3.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES, load_all  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402

load_all()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}

    # --- 1. TF-IDF 1x vs 10x ------------------------------------------
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="tfidf10x_")
    reps = [
        docs.select((F.col("doc_id") + F.lit(100000 * r)).alias("doc_id"), "text")
        for r in range(10)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    docs.write.mode("overwrite").parquet(tmp + "/x1/documents.parquet")
    big.write.mode("overwrite").parquet(tmp + "/x10/documents.parquet")

    def run_tfidf(d: str) -> float:
        t0 = time.time()
        QUERIES["text_tfidf_topk"](spark, d).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.time() - t0, 2)

    run_tfidf(tmp + "/x1")  # warm
    out["tfidf_wall_1x_s"] = run_tfidf(tmp + "/x1")
    out["tfidf_wall_10x_s"] = run_tfidf(tmp + "/x10")
    out["tfidf_10x_ratio"] = round(out["tfidf_wall_10x_s"] / out["tfidf_wall_1x_s"], 2)

    # --- 2. sorted-neighborhood candidate economics --------------------
    sf001 = sf_dir.replace("sf0.1", "sf0.01")
    d2 = load_table(spark, sf001, "documents").select("doc_id", "text")
    base = d2.filter(F.col("doc_id") < 300)
    edited = d2.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    n = base.unionByName(edited).count()
    w = 10
    out["snm_corpus"] = n
    out["snm_candidates"] = n * w - w * (w + 1) // 2  # exact in-window pairs
    out["snm_all_pairs"] = n * (n - 1) // 2
    out["snm_pruning_x"] = round(out["snm_all_pairs"] / out["snm_candidates"], 1)
    out["snm_emitted"] = QUERIES["dedup_sorted_neighborhood"](spark, sf001).count()

    # --- 3. k-truss per-round edge shrink ------------------------------
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        canonical_undirected,
        triangle_list,
    )

    li = (
        load_table(spark, sf001, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        li.alias("x")
        .join(li.alias("y"), on="l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    )
    edges = canonical_undirected(pairs)
    sizes = []
    for _ in range(2):
        edges = edges.localCheckpoint(eager=True)
        sizes.append(edges.count())
        tri = triangle_list(edges)
        tri_edges = (
            tri.select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
            .unionByName(
                tri.select(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b"))
            )
            .unionByName(
                tri.select(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b"))
            )
        )
        supp = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("supp"))
        edges = edges.join(supp, ["a", "b"]).filter(F.col("supp") >= 3).select("a", "b")
    sizes.append(edges.count())
    out["ktruss_edges_per_round"] = sizes

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
