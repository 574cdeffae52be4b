"""Round-14 scale probes (VERDICT r13 #3 + the round-14 batch at 10×).

A. Louvain at ~360k edges (the full sf0.1 lineitem co-purchase graph, no
   %3 thinning — ~2× the r13 probe's 187k): per-ROUND wall series for
   level 1 — the claim under test is that the stats-cut keeps round
   cost FLAT (no compounding driver stall), and total wall scales with
   the edge census.
B. `dedup_simhash_multiprobe` candidate-count linearity: docs 500 →
   1,500 → 5,000; claim = candidates/doc bounded (band-bucket joins,
   never all-pairs).
C. `graph_coreness_bounded` per-LEVEL wall on the sf0.1 graph (16× the
   gate graph): the peel levels must not grow in cost as the live edge
   list shrinks — flat-to-falling per-level wall, stats-cut per level.
D. `multimodal_scene_boundaries` per-payload cost: docs 500 → 5,000
   wall ratio ≈ payload ratio (pure per-row expression work).
E. The round-14 batch at 10× contract slices (sf0.1): BLEU parts
   (gram census scale), METEOR (window scale), KS (distinct-value grid
   vs corpus rows), boundary audit (hash-explode scale) — wall + the
   grain that bounds each.

Run:  python tools/scale_probe_r14.py
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

    # ---- A. Louvain per-round wall at ~2x the r13 probe's edge census
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        louvain_rounds,
    )

    li = load_table(spark, SF, "lineitem")  # NO %3 thinning
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("dst"),
    )
    n_edges = (
        edges.filter(F.col("src") != F.col("dst")).distinct().count()
    )
    walls = []
    prev = 0.0
    for r in range(1, 5):
        t0 = time.time()
        louvain_rounds(edges, n_rounds=r).count()
        total = time.time() - t0
        walls.append(round(total - prev, 2))  # marginal cost of round r
        prev = total
    out["louvain_360k"] = {
        "n_edges": n_edges,
        "marginal_round_walls_s": walls,
        "total_wall_s": round(prev, 2),
    }
    print("A louvain:", out["louvain_360k"], flush=True)

    # ---- B. simhash multiprobe candidate linearity
    from cell_kn_mvp_etl_ontologies_spark import catalog

    catalog.load_all()
    sim = []
    for n_docs in (500, 1500, 5000):
        docs = load_table(spark, SF, "documents").filter(
            F.col("doc_id") < n_docs
        )
        # replay the registered row's shape on a parameterized slice:
        # count candidate pairs emitted by the multiprobe band joins
        t0 = time.time()
        n_pairs = (
            catalog.QUERIES["dedup_simhash_multiprobe"](spark, SF).count()
            if n_docs == 5000
            else None
        )
        # parameterized census: hi/lo band key grouping sizes bound the
        # join fanout; measure sum of C(bucket,2) per band as the
        # candidate ceiling
        fp = docs.select(
            "doc_id",
            F.expr(
                "conv(substring(md5(concat('sh|', lower(substring(text,1,120)))), 1, 4), 16, 10)"
            )
            .cast("long")
            .alias("fp"),
        )
        bands = fp.select(
            "doc_id",
            (F.col("fp") / 256).cast("long").alias("hi"),
            (F.col("fp") % 256).alias("lo"),
        )
        ceil = 0
        for col in ("hi", "lo"):
            sizes = bands.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
            ceil += sum(
                r.c * (r.c - 1) // 2 for r in sizes.collect()
            )
        sim.append(
            {
                "n_docs": n_docs,
                "band_pair_ceiling": ceil,
                "ceiling_per_doc": round(ceil / n_docs, 1),
                "registered_row_pairs": n_pairs,
                "wall_s": round(time.time() - t0, 2),
            }
        )
    out["simhash_multiprobe"] = sim
    print("B simhash:", sim, flush=True)

    # ---- C. coreness per-level wall on the 16x graph
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        coreness_bounded,
    )

    li3 = load_table(spark, SF, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    edges3 = li3.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("dst"),
    )
    lw = []
    prev = 0.0
    for k_cap in (2, 4, 6, 8):
        t0 = time.time()
        coreness_bounded(edges3, k_cap=k_cap, inner_rounds=3).count()
        total = time.time() - t0
        lw.append(round(total - prev, 2))  # marginal cost of 2 more levels
        prev = total
    out["coreness_levels"] = {
        "marginal_2level_walls_s": lw,
        "total_wall_s": round(prev, 2),
    }
    print("C coreness:", out["coreness_levels"], flush=True)

    # ---- D. scene boundaries per-payload cost
    sb = []
    for n_docs in (500, 5000):
        docs = load_table(spark, SF, "documents").filter(
            F.col("doc_id") < n_docs
        )
        d = docs.select(
            "doc_id",
            (F.length("text") % 10 + 1).cast("long").alias("n_frames"),
            "text",
        )
        frames = d.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, CAST(n_frames - 1 AS INT)),"
                    " j -> conv(substring(md5(substring(text, j * 8 + 1, 8)), 1, 4), 16, 10))"
                )
            ).alias("frame_idx", "fp"),
        )
        t0 = time.time()
        n_frames = frames.count()
        sb.append(
            {
                "n_docs": n_docs,
                "n_frames": n_frames,
                "wall_s": round(time.time() - t0, 2),
            }
        )
    out["scene_boundaries"] = sb
    print("D scenes:", sb, flush=True)

    # ---- E. round-14 batch at sf0.1 (registered rows unmodified)
    batch = {}
    for name in (
        "eval_bleu_parts",
        "eval_meteor_parts",
        "agg_ks_two_sample",
        "dedup_segment_boundary_audit",
        "eval_spearman_rho",
        "eval_precision_recall_hits",
        "multimodal_audio_energy",
    ):
        t0 = time.time()
        n = catalog.QUERIES[name](spark, SF).count()
        batch[name] = {"rows": n, "wall_s": round(time.time() - t0, 2)}
    # the KS grain claim: distinct value grid vs corpus rows
    orders = load_table(spark, SF, "orders")
    batch["ks_grain"] = {
        "corpus_rows": orders.count(),
        "distinct_values": orders.select(
            F.floor("o_totalprice").alias("v")
        )
        .distinct()
        .count(),
    }
    out["r14_batch_sf01"] = batch
    print("E batch:", batch, flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
