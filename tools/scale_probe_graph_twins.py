"""10× scale probes for the round-9 iterative graph twins:

A. ``strongly_connected_components_fb`` (plans/graph_query.py) — multi-pivot
   forward-backward SCC coloring.  Synthetic graph with KNOWN structure:
   blocks of 8 nodes, each an internal directed cycle (one SCC each), plus
   md5-thinned cross-block edges from block b to block b>>1 (a binary tree
   over blocks, so the condensation depth is log2(#blocks) and the forward
   coloring diameter stays far below the 64-hop cap at any width).  Claims
   under test at 10× nodes: (1) labels stay EXACT (every block is one SCC
   of size 8 — verified, not assumed), (2) outer rounds stay ~condensation
   depth (logged), (3) wall grows ≲ linearly in |V| (per-round keyed
   shuffles; at this scale rounds are fixed-overhead dominated, so the
   honest expectation is ratio << 10×).

B. ``dag_depth_frontier`` (depth-only mode — the unbounded-universe path) —
   layered DAG, L=24 layers × W width, every node wired to 1-2 md5-chosen
   parents in the layer below; depth must equal the layer index (verified
   per-node).  Scaling axis = WIDTH (corpus growth at constant hierarchy
   depth, the ontology shape), so rounds are constant and per-round cost
   carries the 10×.

Usage: python tools/scale_probe_graph_twins.py [mult ...]   # default 1 10
Prints one JSON line per probe; record ratios in SCALE.md §r9-graph-twins.
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
    dag_depth_frontier,
    strongly_connected_components_fb,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BLOCK = 8


def scc_edges(spark, n_blocks: int):
    """Blocks of BLOCK nodes: internal cycle + tree cross edges b -> b>>1."""
    ids = spark.range(n_blocks * BLOCK).select(F.col("id").alias("v"))
    cyc = ids.select(
        F.col("v").alias("src"),
        (
            (F.col("v") - F.col("v") % BLOCK)
            + (F.col("v") + 1) % BLOCK
        ).alias("dst"),
    )
    blk = F.floor(F.col("v") / BLOCK)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("xb|"), F.col("v"))), 1, 8), 16, 10
    ).cast("long")
    cross = (
        ids.filter(blk > 0)
        .filter(h % 100 < 25)  # ~2 cross edges per block
        .select(
            F.col("v").alias("src"),
            (F.floor(blk / 2) * BLOCK + h % BLOCK).cast("long").alias("dst"),
        )
    )
    return cyc.unionByName(cross)


def probe_scc(spark, mult: int) -> dict:
    n_blocks = 256 * mult
    edges = scc_edges(spark, n_blocks).localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.time()
    labels = strongly_connected_components_fb(edges, max_inner=64)
    sizes = (
        labels.groupBy("scc_id").count().groupBy("count").count().collect()
    )
    wall = time.time() - t0
    by_size = {int(r["count"]): int(r["count(1)"] if "count(1)" in r else r[1]) for r in sizes}
    assert by_size == {BLOCK: n_blocks}, by_size  # every block = one SCC
    return {
        "probe": "scc_fb",
        "mult": mult,
        "nodes": n_blocks * BLOCK,
        "edges": n_edges,
        "wall_s": round(wall, 2),
    }


def dag_edges(spark, width: int, layers: int = 24):
    """Layered DAG: node = layer*width + slot; 1-2 parents in layer-1."""
    ids = spark.range(layers * width).select(F.col("id").alias("v"))
    layer = F.floor(F.col("v") / width)
    h1 = F.conv(
        F.substring(F.md5(F.concat(F.lit("p1|"), F.col("v"))), 1, 8), 16, 10
    ).cast("long")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.lit("p2|"), F.col("v"))), 1, 8), 16, 10
    ).cast("long")
    nonroot = ids.filter(layer > 0)
    e1 = nonroot.select(
        F.col("v").alias("child"),
        ((layer - 1) * width + h1 % width).cast("long").alias("parent"),
    )
    e2 = nonroot.filter(h2 % 2 == 0).select(
        F.col("v").alias("child"),
        ((layer - 1) * width + h2 % width).cast("long").alias("parent"),
    )
    return e1.unionByName(e2)


def probe_dag_depth(spark, mult: int) -> dict:
    width, layers = 250 * mult, 24
    edges = dag_edges(spark, width, layers).localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.time()
    depths = dag_depth_frontier(
        edges, max_rounds=64, with_ancestors=False
    )
    # depth must equal the layer index for EVERY node (exactness check)
    bad = depths.filter(
        F.col("depth") != F.floor(F.col("node") / width)
    ).count()
    wall = time.time() - t0
    assert bad == 0, f"{bad} nodes with wrong depth"
    return {
        "probe": "dag_depth_frontier",
        "mult": mult,
        "nodes": layers * width,
        "edges": n_edges,
        "wall_s": round(wall, 2),
    }


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale-probe-graph-twins")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for fn in (probe_scc, probe_dag_depth):
        walls = {}
        for m in mults:
            r = fn(spark, m)
            walls[m] = r["wall_s"]
            print(json.dumps(r))
        if len(mults) == 2:
            lo, hi = mults
            print(
                json.dumps(
                    {
                        "probe": fn.__name__,
                        "ratio": round(walls[hi] / walls[lo], 2),
                        "mults": mults,
                    }
                )
            )


if __name__ == "__main__":
    main()
