"""10× scale probes for the round-8-new machinery (VERDICT r8 #5):

A. the two-pass ``with_global_rank`` / ``ntile_exact`` (operators/windows.py)
   — pass 1's boundary stats are |ranges|-row driver state and pass 2's
   bucket assignment is a codegen comparison chain over |ranges|-1 struct
   literals; claim under test: at O(100) ranges the chain stays
   codegen-friendly and total cost is ~linear in rows (no 64 KB-codegen
   cliff, no driver blowup) when rows grow 10×.

B. the frontier5 rank-correlation family — the Spearman shape (two global
   rank passes over per-customer metrics + join + 1-row reduce) and the
   gains-deciles shape (ntile_exact binning + 10-row cumulative window)
   with the entity id-space scaled 10× alongside rows (constant density,
   the corpus-growth axis).  rho at 10× uses the docstring's documented
   rescale (sum_d2 DIV n first) since 10× customers exceeds the exact
   gate tier's n<=16.6k ppm bound.

Usage: python tools/scale_probe_r9.py [mult ...]   # default 1 10
Prints one JSON line per probe; record ratios in SCALE.md §r9-at-10x.
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

from cell_kn_mvp_etl_ontologies_spark.io import load_table, parallelize
from cell_kn_mvp_etl_ontologies_spark.operators.windows import (
    ntile_exact,
    with_global_rank,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_RANGES = 100  # the O(100)-ranges regime the judge asked to prove


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _expanded_orders(spark, mult: int):
    """orders replicated mult× with the customer id-space scaled mult×
    (constant orders-per-customer density)."""
    o = parallelize(load_table(spark, SF_DIR, "orders")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    return o.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") * mult + F.col("rep")).alias("o_orderkey"),
        (F.col("o_custkey") * mult + F.col("rep")).alias("o_custkey"),
        (F.col("o_totalprice") * (1.0 + F.col("rep") / 100.0)).alias("o_totalprice"),
    )


def probe_global_rank(spark, mult: int):
    """with_global_rank + ntile_exact at N_RANGES ranges over mult× order
    rows under the (o_totalprice, o_orderkey) total order."""
    o = _expanded_orders(spark, mult)
    ranked = with_global_rank(
        o, ["o_totalprice", "o_orderkey"], "rnk", num_partitions=N_RANGES
    )
    tiled = ntile_exact(
        o, 10, ["o_totalprice", "o_orderkey"], "tile", num_partitions=N_RANGES
    )
    # materialize both + a correctness pin: max rank == row count, every
    # tile in 1..10
    _noop(ranked)
    _noop(tiled)
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.max("rnk").alias("max_rnk")
    ).collect()[0]
    assert agg.n == agg.max_rnk, (agg.n, agg.max_rnk)
    tiles = tiled.select(F.min("tile"), F.max("tile")).collect()[0]
    assert (tiles[0], tiles[1]) == (1, 10), tiles


def probe_spearman_shape(spark, mult: int):
    """The eval_spearman_rank DAG at mult× (rescaled rho past the ppm
    gate bound)."""
    per_cust = (
        _expanded_orders(spark, mult)
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    r1 = with_global_rank(per_cust, ["n_orders", "cust"], "r1").select("cust", "r1")
    r2 = with_global_rank(per_cust, ["cents", "cust"], "r2").select("cust", "r2")
    agg = (
        r1.join(r2, on="cust")
        .select(((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))).alias("d2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("d2").cast("long").alias("sum_d2"))
    )
    # documented large-n rescale: divide sum_d2 by n before the 6e6 blowup
    out = agg.select(
        "n",
        F.expr(
            "CAST(1000000 - 6 * (1000000 * (sum_d2 DIV n)) DIV (n * n - 1) AS BIGINT)"
        ).alias("rho_ppm_rescaled"),
    )
    [row] = out.collect()
    assert -1_000_000 <= row.rho_ppm_rescaled <= 1_000_000, row


def probe_gains_shape(spark, mult: int):
    """The eval_gains_deciles DAG at mult× documents (score + ntile_exact +
    cumulative window)."""
    from pyspark.sql import Window

    docs = parallelize(load_table(spark, SF_DIR, "documents")).select("doc_id", "text", "lang")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    docs = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"), "text", "lang"
    )
    scored = docs.select(
        "doc_id",
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("score_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    binned = ntile_exact(
        scored.withColumn("neg_score", -F.col("score_ppm")),
        10,
        ["neg_score", "doc_id"],
        "decile",
    )
    per = binned.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("y").cast("long").alias("n_pos")
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    rows = per.select(
        "decile", F.sum("n_pos").over(w_cum).cast("long").alias("cum_pos")
    ).collect()
    assert len(rows) == 10, rows


PROBES = {
    "global_rank_ntile_100ranges": probe_global_rank,
    "spearman_two_rank_passes": probe_spearman_shape,
    "gains_deciles_ntile": probe_gains_shape,
}


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale-probe-r9")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "lineitem").count()  # scan warmup

    for name, fn in PROBES.items():
        walls = {}
        for mult in mults:
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                spark._jvm.System.gc()
                t0 = time.time()
                fn(spark, mult)
                best = min(best, time.time() - t0)
            walls[str(mult)] = round(best, 2)
        ratio = (
            round(walls[str(mults[-1])] / walls[str(mults[0])], 2)
            if len(mults) > 1 and walls[str(mults[0])] > 0
            else None
        )
        print(json.dumps({"probe": name, "walls": walls, "ratio": ratio}))
    spark.stop()


if __name__ == "__main__":
    main()
