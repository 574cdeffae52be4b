"""10× scale probes for the round-9 bounded-radius graph family's
DISTANCE-TABLE CONSUMERS (VERDICT r9 #5 — SCALE.md §r9-graph-twins covers
the scc_fb/dag_depth twins; this extends the probe to what consumes
`bounded_shortest_counts` and to the round-10 bucketed-bitmap LCA):

A. `betweenness_bounded` + the eccentricity profile on DISJOINT DIRECTED
   CYCLES of length 16 (> the 6-hop radius), n_cycles scaled 1× → 10×.
   Exactness is VERIFIED, not assumed — on a 16-cycle every node must
   report n_reach=6, ecc=6, Σd=21, betweenness_ppm=15·1e6 (interior
   positions of the unique ≤6-hop shortest paths: Σ_{d=2..6}(d-1)=15),
   n_contribs=15.  Scaling axis = number of cycles (corpus growth at
   constant radius — the ontology shape), so the claim under test is
   that the per-hop keyed joins and the sv⋈vt contribution join carry
   the 10× linearly.

B. The same consumers on a RANDOM md5-wired out-degree-2 digraph (the
   hop-join fan-out stress named in the verdict: reach grows ~2^d per
   source until collision).  No closed-form answer here; the probe
   verifies internal consistency (Σ n_reach == |distance table|) and
   measures the fan-out the hop joins actually face (sigma rows logged).

C. `lca_wu_palmer_bucketed` (round-10 production path) on a LAYERED DAG
   (depth 12, labels ≫ 63 so the bucketed universe is exercised), width
   scaled 1× → 10×, pairs md5-sampled at ~0.3%.  Depth invariant
   verified per node (depth == layer); LCA output sanity-checked
   (lca_depth ≤ min(d1,d2); wup_milli ≤ 1000).

Usage: python tools/scale_probe_bounded_radius.py [mult ...]  # default 1 10
Prints one JSON line per probe; record ratios in SCALE.md
§bounded-radius-consumers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
    betweenness_bounded,
    bounded_shortest_counts,
    lca_wu_palmer_bucketed,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CYCLE = 16
BASE_CYCLES = 500
BASE_RANDOM = 4000
BASE_WIDTH = 80
LAYERS = 12


def cycle_edges(spark, n_cycles: int):
    ids = spark.range(n_cycles * CYCLE).select(F.col("id").alias("v"))
    return ids.select(
        F.col("v").alias("src"),
        ((F.col("v") - F.col("v") % CYCLE) + (F.col("v") + 1) % CYCLE).alias("dst"),
    )


def random_edges(spark, n: int):
    """Out-degree-2 md5-wired digraph — the fan-out stress shape."""
    ids = spark.range(n).select(F.col("id").alias("src"))
    out = None
    for j in range(2):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"r{j}|"), F.col("src").cast("string"))), 1, 12),
            16,
            10,
        ).cast("long")
        e = ids.select("src", (h % n).alias("dst")).filter(F.col("src") != F.col("dst"))
        out = e if out is None else out.unionByName(e)
    return out.distinct()


def layered_dag(spark, width: int):
    """LAYERS × width DAG, child -> 1-2 md5-chosen parents one layer down.
    Node id = layer * width + slot (labels far beyond 63 by design)."""
    ids = spark.range(LAYERS * width).select(F.col("id").alias("node"))
    kids = ids.filter(F.col("node") >= width)
    out = None
    for j in range(2):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"p{j}|"), F.col("node").cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        e = kids.select(
            F.col("node").alias("child"),
            (F.col("node") - F.col("node") % width - width + h % width).alias("parent"),
        )
        e = e.filter((F.col("parent") >= 0) if j == 0 else (h % 3 == 0))
        out = e if out is None else out.unionByName(e)
    return out.distinct()


def main() -> None:
    mults = [int(x) for x in sys.argv[1:]] or [1, 10]
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bounded-radius-scale-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # JVM warm

    for mult in mults:
        # -- A: cycles, exactness verified ------------------------------
        n_cycles = BASE_CYCLES * mult
        e = cycle_edges(spark, n_cycles).localCheckpoint(eager=True)
        t0 = time.time()
        btw = betweenness_bounded(e).localCheckpoint(eager=True)
        bad_btw = btw.filter(
            (F.col("betweenness_ppm") != 15_000_000) | (F.col("n_contribs") != 15)
        ).count()
        wall_btw = time.time() - t0
        t0 = time.time()
        sigma = bounded_shortest_counts(e, max_hops=6)
        ecc = (
            sigma.groupBy("src")
            .agg(
                F.count(F.lit(1)).alias("n_reach"),
                F.max("d").alias("ecc"),
                F.sum("d").alias("sum_dist"),
            )
            .localCheckpoint(eager=True)
        )
        bad_ecc = ecc.filter(
            (F.col("n_reach") != 6) | (F.col("ecc") != 6) | (F.col("sum_dist") != 21)
        ).count()
        n_nodes = ecc.count()
        wall_ecc = time.time() - t0
        print(
            json.dumps(
                {
                    "probe": "cycles_exact",
                    "mult": mult,
                    "nodes": n_cycles * CYCLE,
                    "wall_betweenness": round(wall_btw, 2),
                    "wall_eccentricity": round(wall_ecc, 2),
                    "bad_betweenness_rows": bad_btw,
                    "bad_ecc_rows": bad_ecc,
                    "nodes_profiled": n_nodes,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

        # -- B: random digraph, fan-out stress ---------------------------
        n = BASE_RANDOM * mult
        e = random_edges(spark, n).localCheckpoint(eager=True)
        n_edges = e.count()
        t0 = time.time()
        sigma = bounded_shortest_counts(e, max_hops=6).localCheckpoint(eager=True)
        sigma_rows = sigma.count()
        wall_sigma = time.time() - t0
        t0 = time.time()
        btw_rows = betweenness_bounded(e).count()
        wall_btw = time.time() - t0
        reach_sum = (
            sigma.groupBy("src").agg(F.count(F.lit(1)).alias("r")).agg(F.sum("r")).first()[0]
        )
        print(
            json.dumps(
                {
                    "probe": "random_fanout",
                    "mult": mult,
                    "nodes": n,
                    "edges": n_edges,
                    "sigma_rows": sigma_rows,
                    "reach_sum_consistent": bool(reach_sum == sigma_rows),
                    "wall_sigma": round(wall_sigma, 2),
                    "wall_betweenness": round(wall_btw, 2),
                    "betweenness_rows": btw_rows,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

        # -- C: bucketed LCA on the layered DAG --------------------------
        width = BASE_WIDTH * mult
        e = layered_dag(spark, width).localCheckpoint(eager=True)
        nodes = (
            e.select(F.col("child").alias("n"))
            .unionByName(e.select(F.col("parent").alias("n")))
            .distinct()
        )
        a = nodes.select(F.col("n").alias("n1"))
        b = nodes.select(F.col("n").alias("n2"))
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("n1").cast("string"), F.lit("|"), F.col("n2").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        pairs = a.join(b, F.col("n1") < F.col("n2")).filter(h % 1000 < 3).localCheckpoint(
            eager=True
        )
        n_pairs = pairs.count()
        t0 = time.time()
        out = lca_wu_palmer_bucketed(e, pairs).localCheckpoint(eager=True)
        n_out = out.count()
        wall_lca = time.time() - t0
        bad_depth = out.filter(
            (F.col("d1") != (F.col("n1") / width).cast("long"))
            | (F.col("d2") != (F.col("n2") / width).cast("long"))
        ).count()
        bad_lca = out.filter(
            F.col("lca_depth").isNotNull()
            & (
                (F.col("lca_depth") > F.least("d1", "d2"))
                | (F.col("wup_milli") > 1000)
            )
        ).count()
        print(
            json.dumps(
                {
                    "probe": "lca_bucketed",
                    "mult": mult,
                    "width": width,
                    "nodes": LAYERS * width,
                    "pairs": n_pairs,
                    "out_rows": n_out,
                    "wall_lca": round(wall_lca, 2),
                    "bad_depth_rows": bad_depth,
                    "bad_lca_rows": bad_lca,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
