"""Scale probes for the round-12 frontier9 operators (SCALE.md §frontier9):

A. `dedup_minhash_weighted_capped`: the df-capped candidate join at
   60 → 600 → 1200 documents (sf0.1 corpus slices) — candidate pairs and
   wall vs the uncapped row's measured quadratic (SCALE.md
   §frontier8-at-10x: 1,200 docs → 699,378 pairs); the claim is the df-16
   cap bounds per-shingle fanout so candidates stay linear in census size.
B. `similarity_range_search_routed` at 80k corpus / |Q|=8: candidate
   volume and wall at n_cells=64 for nprobe ∈ {4, 64} vs the brute scan —
   the routed rung must cut refine work ~n_cells/nprobe× while staying a
   subset of brute hits (identity at nprobe=n_cells).

Usage: python tools/scale_probe_frontier9.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = "/root/testdata/sf0.1"
CAP = 16


def capped_candidates(spark, n_docs):
    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < n_docs)
        .select("doc_id", F.substring("text", 1, 60).alias("text"))
    )
    tf = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(text) - 4, 0)),"
                    " i -> substring(text, i, 5))"
                )
            ).alias("sh"),
        )
        .groupBy("id", "sh")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )
    kept = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    ).filter(F.col("df") <= CAP)
    x = kept.select(F.col("id").alias("a"), "sh", F.col("tf").alias("tfa"))
    y = kept.select(F.col("id").alias("b"), "sh", F.col("tf").alias("tfb"))
    t0 = time.monotonic()
    pairs = (
        x.join(y, on="sh")
        .filter(F.col("b") > F.col("a"))
        .groupBy("a", "b")
        .agg(F.sum(F.least("tfa", "tfb")).alias("min_sum"))
        .count()
    )
    return pairs, round(time.monotonic() - t0, 2)


def routed_range(spark, times, n_cells, nprobe, n_q=8):
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        quantize_vec,
        range_search_routed,
        sq_dist_long,
    )

    base = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    parts = [
        base.select((F.col("vec_id") + 100000 * k).alias("vec_id"), "embedding")
        for k in range(times)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    em = (
        corpus.select("vec_id", quantize_vec(F.col("embedding")).alias("qv"))
        .select(
            "vec_id",
            "qv",
            F.aggregate(
                F.zip_with("qv", "qv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("norm_sq"),
        )
        .localCheckpoint(eager=True)
    )
    q = em.filter(F.col("vec_id") < n_q)

    # candidate volume = Σ_q Σ_{probed cells} |cell| (pre-refine work)
    seeds = (
        em.select(
            "vec_id",
            "qv",
            F.row_number()
            .over(Window.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id")))
            .alias("_r"),
        )
        .filter(F.col("_r") <= n_cells)
        .select((F.col("_r") - 1).cast("long").alias("cell"), F.col("qv").alias("cv"))
    )

    def assign(side, keep, out_id):
        scored = side.join(F.broadcast(seeds), on=F.lit(True)).select(
            F.col("vec_id").alias(out_id),
            "cell",
            sq_dist_long(F.col("qv"), F.col("cv")).alias("_d"),
        )
        w = Window.partitionBy(out_id).orderBy(F.col("_d").asc(), F.col("cell").asc())
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep)
            .select(out_id, "cell")
        )

    n_cand = (
        assign(q, nprobe, "q_id")
        .join(assign(em, 1, "t_id"), on="cell")
        .filter(F.col("t_id") != F.col("q_id"))
        .count()
    )
    t0 = time.monotonic()
    hits = range_search_routed(em, q, n_cells=n_cells, nprobe=nprobe).count()
    return n_cand, hits, round(time.monotonic() - t0, 2)


def brute_range(spark, times, n_q=8):
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import quantize_vec

    base = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    parts = [
        base.select((F.col("vec_id") + 100000 * k).alias("vec_id"), "embedding")
        for k in range(times)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    em = (
        corpus.select("vec_id", quantize_vec(F.col("embedding")).alias("qv"))
        .select(
            "vec_id",
            "qv",
            F.aggregate(
                F.zip_with("qv", "qv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("norm_sq"),
        )
        .localCheckpoint(eager=True)
    )
    q = em.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm_sq").alias("q_norm"),
    )
    n_cand = em.count() * n_q - n_q
    t0 = time.monotonic()
    hits = (
        em.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            F.aggregate(
                F.zip_with("q_qv", "qv", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_q"),
            "q_norm",
            F.col("norm_sq").alias("t_norm"),
        )
        .filter(
            (F.col("dot_q") >= 0)
            & (
                F.expr("16 * CAST(dot_q AS DECIMAL(38,0)) * dot_q")
                >= F.expr("CAST(q_norm AS DECIMAL(38,0)) * t_norm")
            )
        )
        .count()
    )
    return n_cand, hits, round(time.monotonic() - t0, 2)


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
    load_table(spark, SF, "documents").count()

    out: dict = {}
    for n in (60, 600, 1200):
        pairs, sec = capped_candidates(spark, n)
        out[f"capped_candidates_{n}docs"] = {"pairs": pairs, "sec": sec}
        spark.catalog.clearCache()
    n_cand, hits, sec = brute_range(spark, 40)
    out["range_brute_80k_q8"] = {"candidates": n_cand, "hits": hits, "sec": sec}
    spark.catalog.clearCache()
    for nprobe in (64, 4):
        n_cand, hits, sec = routed_range(spark, 40, 64, nprobe)
        out[f"range_routed_80k_q8_nprobe{nprobe}"] = {
            "candidates": n_cand,
            "hits": hits,
            "sec": sec,
        }
        spark.catalog.clearCache()
    # amortization crossover: the seed-assignment cost is query-count-
    # independent, so at |Q|=512 routing must beat the brute scan on wall
    n_cand, hits, sec = brute_range(spark, 40, n_q=512)
    out["range_brute_80k_q512"] = {"candidates": n_cand, "hits": hits, "sec": sec}
    spark.catalog.clearCache()
    n_cand, hits, sec = routed_range(spark, 40, 64, 4, n_q=512)
    out["range_routed_80k_q512_nprobe4"] = {
        "candidates": n_cand,
        "hits": hits,
        "sec": sec,
    }
    spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()





# ---- round-12 batch probes (appended after the batch landed) ----------------


def bipartite_pairs(spark, sf, cap):
    from pyspark.sql import Window as W

    events = load_table(spark, sf, "events")
    item = F.get_json_object(F.col("props"), "$.k").cast("long")
    ui = (
        events.select(
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.col("ts").cast("date").cast("string"),
            ).alias("basket"),
            item.alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    uid = ui.withColumn("d", F.count(F.lit(1)).over(W.partitionBy("basket")))
    kept = uid.filter(F.col("d") <= cap).select("basket", "item") if cap else ui
    a = kept.select("basket", F.col("item").alias("ia"))
    b = kept.select("basket", F.col("item").alias("ib"))
    t0 = time.monotonic()
    n = (
        a.join(b, on="basket")
        .filter(F.col("ib") > F.col("ia"))
        .count()
    )
    return n, round(time.monotonic() - t0, 2)


def pettitt_wall(spark, sf):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    t0 = time.monotonic()
    n = entry.queries()["temporal_changepoint_pettitt"](spark, sf).count()
    return n, round(time.monotonic() - t0, 2)


def main_r12() -> None:
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
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        tag = sf.rsplit("sf", 1)[-1]
        for cap in (None, 7):
            n, sec = bipartite_pairs(spark, sf, cap)
            out[f"bipartite_{tag}_cap{cap}"] = {"pairs": n, "sec": sec}
            spark.catalog.clearCache()
        n, sec = pettitt_wall(spark, sf)
        out[f"pettitt_{tag}"] = {"days": n, "sec": sec}
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    import sys as _sys

    if "--r12" in _sys.argv:
        main_r12()
    else:
        main()
