"""A/B probe for the round-14 PageRank loop restructure.

A (old): per-round ``nodes LEFT JOIN contribs`` — re-shuffles the static
node list + SortMergeJoin every iteration to hand no-in-edge nodes their
constant base rank.
B (new, shipped in plans/graph_query.pagerank_integer): no-in-edge nodes
split out once before the loop; per round = contribution join + sum
aggregate + union of the static constant frame.

1. Semantics: both variants' (node, rank_units) must be identical on the
   bench graph (integer arithmetic -> bit-exact).
2. Speed: interleaved min-of-N at the pagerank_orders bench shape
   (sf0.1 lineitem, 5 iterations) with the noop sink.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_pagerank_union.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

import bench
from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import pagerank_integer
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def pagerank_old(edges, n_iter=5, damping_num=85, damping_den=100,
                 scale=10**12, checkpoint_every=2):
    e = edges.select(F.col("src"), F.col("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    e_deg = (
        e.withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint(eager=True)
    )
    init_units = scale // n_nodes
    base_units = (scale - scale * damping_num // damping_den) // n_nodes
    ranks = nodes.withColumn("rank_units", F.lit(init_units).cast("long"))
    for i in range(n_iter):
        contribs = (
            ranks.join(e_deg, ranks["node"] == e_deg["src"])
            .select(F.col("dst").alias("node"), F.expr("rank_units div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_units"))
        )
        ranks = nodes.join(contribs, on="node", how="left").select(
            "node",
            (F.lit(base_units)
             + F.expr(f"coalesce(in_units, 0L) * {damping_num} div {damping_den}")
             ).cast("long").alias("rank_units"),
        )
        if (i + 1) % checkpoint_every == 0 and i != n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-pagerank-union")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    li = bench.load_table(spark, bench.SF_DIR, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") % 50000).alias("src"),
        (F.col("l_partkey") % 20000).alias("dst"),
    )

    # --- 1. semantics: bit-identical rank vectors ---
    a = {(r.node, r.rank_units) for r in pagerank_old(edges).collect()}
    b = {(r.node, r.rank_units) for r in pagerank_integer(edges, n_iter=5).collect()}
    print(f"semantics: |A|={len(a)} |B|={len(b)} diff={len(a ^ b)} (want 0)")
    assert a == b, "union-form PageRank diverges from left-join form"

    # --- 2. interleaved speed ---
    n = 5
    a_times, b_times = [], []
    for _ in range(n):
        spark._jvm.System.gc()
        t0 = time.time()
        pagerank_old(edges).write.mode("overwrite").format("noop").save()
        a_times.append(time.time() - t0)
        t0 = time.time()
        pagerank_integer(edges, n_iter=5).write.mode("overwrite").format("noop").save()
        b_times.append(time.time() - t0)
    print(f"left-join (old): {[round(t, 3) for t in a_times]} min {min(a_times):.3f}s")
    print(f"union     (new): {[round(t, 3) for t in b_times]} min {min(b_times):.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
