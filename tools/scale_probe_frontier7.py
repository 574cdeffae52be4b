"""10× scale probes for the round-10 frontier7 operators whose cost shape
is worth pinning (SCALE.md §frontier7-at-10x):

A. `join_nearest_value` (sort-adjacency 1-D NN join): synthetic orders —
   C customers × ~10 orders with planted equal-price runs — scaled 1× →
   10× on customers.  Exactness verified at BOTH scales against the
   quadratic per-group argmin computed in-engine (the oracle's shape),
   which is affordable because groups are bounded; the claim under test
   is that the production path's cost tracks n·log n while the naive
   pairs path tracks Σ|group|².

B. `dedup_sequence_fingerprint`: documents replicated 1× → 10× with a
   deterministic suffix perturbation (so fingerprints differ across
   replicas); wall ratio + structural checks (≤4 slots/doc, slots
   strictly increasing in fp).

C. `dag_root_path_counts` on a layered DAG where EVERY node has exactly
   2 parents in the layer below (slots 2i and 2i+1 mod width): path
   counts are exactly 2^layer — EXPONENTIAL counts while frontier rows
   stay linear, which is precisely the aggregate-domain-counting claim.
   Width scaled 1× → 10× at constant depth 12 (counts to 4096).

Usage: python tools/scale_probe_frontier7.py [mult ...]   # default 1 10
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import dag_root_path_counts
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BASE_CUST = 2000
BASE_DOCS_MULT = 1  # documents table replicas at 1×
LAYERS = 12
BASE_WIDTH = 64


def synth_orders(spark, n_cust: int):
    """~10 orders per customer; every 5th customer gets an equal-price RUN
    (the adjacency trap case) and every 7th is a singleton."""
    o = spark.range(n_cust * 10).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % n_cust).alias("o_custkey"),
        F.lit("F").alias("o_orderstatus"),
    )
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    price = F.when(
        (F.col("o_custkey") % 5) == 0, ((h % 3) * 100 + 500).cast("double") / 100.0
    ).otherwise((h % 100000).cast("double") / 100.0)
    o = o.filter(~((F.col("o_custkey") % 7 == 0) & (F.col("o_orderkey") >= n_cust)))
    return o.select("o_orderkey", "o_custkey", price.alias("o_totalprice"), "o_orderstatus")


def quadratic_nn(o):
    """The oracle's per-group argmin, in-engine (groups bounded ≤ 10)."""
    x = o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("okey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    a = x.select(F.col("cust"), F.col("okey"), F.col("cents"))
    b = x.select(
        F.col("cust"),
        F.col("okey").alias("pk"),
        F.col("cents").alias("pc"),
    )
    pairs = a.join(b, on="cust").filter(F.col("okey") != F.col("pk"))
    w = Window.partitionBy("okey").orderBy(
        F.abs(F.col("cents") - F.col("pc")), F.col("pc"), F.col("pk")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("okey", F.col("pk").alias("partner_key"))
    )


def synth_docs(spark, sf_dir: str, times: int):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = spark.range(times).select(F.col("id").cast("int").alias("rep"))
    return docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * times + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail"), F.col("rep").cast("string")).alias("text"),
        "lang",
        "source",
        F.col("n_chars"),
    )


def layered_2parent_dag(spark, width: int):
    ids = spark.range(LAYERS * width).select(F.col("id").alias("node"))
    kids = ids.filter(F.col("node") >= width)
    out = None
    for j in range(2):
        slot = (F.col("node") % width) * 2 + j
        e = kids.select(
            F.col("node").alias("child"),
            (F.col("node") - F.col("node") % width - width + slot % width).alias("parent"),
        )
        out = e if out is None else out.unionByName(e)
    return out.distinct()


def main() -> None:
    mults = [int(x) for x in sys.argv[1:]] or [1, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("frontier7-scale-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()

    import tempfile

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES, load_all

    load_all()

    for mult in mults:
        # -- A: nearest-value join, production vs quadratic, exact --------
        n_cust = BASE_CUST * mult
        d = tempfile.mkdtemp(prefix="nnv_")
        synth_orders(spark, n_cust).write.mode("overwrite").parquet(
            d + "/orders.parquet"
        )
        t0 = time.time()
        prod = QUERIES["join_nearest_value"](spark, d).localCheckpoint(eager=True)
        n_rows = prod.count()
        wall_prod = time.time() - t0
        t0 = time.time()
        o = spark.read.parquet(d + "/orders.parquet")
        quad = quadratic_nn(o).localCheckpoint(eager=True)
        quad.count()
        wall_quad = time.time() - t0
        mismatches = (
            prod.select("okey", F.col("partner_key").alias("p_key"))
            .join(quad.select("okey", F.col("partner_key").alias("q_key")), on="okey")
            .filter(~F.col("p_key").eqNullSafe(F.col("q_key")))
            .count()
        )
        print(
            json.dumps(
                {
                    "probe": "nearest_value",
                    "mult": mult,
                    "orders": n_rows,
                    "wall_production": round(wall_prod, 2),
                    "wall_quadratic": round(wall_quad, 2),
                    "mismatches": mismatches,
                }
            ),
            flush=True,
        )
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        spark.catalog.clearCache()

        # -- B: sequence fingerprint at replicated corpus -----------------
        d = tempfile.mkdtemp(prefix="fp_")
        synth_docs(spark, sf_dir, mult).write.mode("overwrite").parquet(
            d + "/documents.parquet"
        )
        t0 = time.time()
        fp = QUERIES["dedup_sequence_fingerprint"](spark, d).localCheckpoint(eager=True)
        fp_rows = fp.count()
        wall_fp = time.time() - t0
        bad = (
            fp.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("k"), F.count_distinct("fp").alias("u"))
            .filter((F.col("k") > 4) | (F.col("k") != F.col("u")))
            .count()
        )
        print(
            json.dumps(
                {
                    "probe": "sequence_fingerprint",
                    "mult": mult,
                    "fp_rows": fp_rows,
                    "wall": round(wall_fp, 2),
                    "bad_docs": bad,
                }
            ),
            flush=True,
        )
        shutil.rmtree(d, ignore_errors=True)
        spark.catalog.clearCache()

        # -- C: exponential path counts, linear rows ----------------------
        width = BASE_WIDTH * mult
        e = layered_2parent_dag(spark, width).localCheckpoint(eager=True)
        t0 = time.time()
        pc = dag_root_path_counts(e, max_rounds=LAYERS + 2).localCheckpoint(eager=True)
        n_nodes = pc.count()
        wall_pc = time.time() - t0
        # layer L > 0 has exactly 2^L paths; roots (layer 0) report 0 by
        # contract (no path from a root to a root)
        bad_pc = pc.filter(
            F.col("n_paths")
            != F.when(F.col("node") < width, F.lit(0)).otherwise(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(node DIV {width} AS INT))"
                )
            )
        ).count()
        print(
            json.dumps(
                {
                    "probe": "dag_path_count",
                    "mult": mult,
                    "width": width,
                    "nodes": n_nodes,
                    "max_count": 2 ** (LAYERS - 1),
                    "wall": round(wall_pc, 2),
                    "bad_rows": bad_pc,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
