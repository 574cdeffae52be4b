"""10× scale probes for the round-11 frontier8 operators whose cost shape
is worth pinning (SCALE.md §frontier8-at-10x):

A. `dedup_minhash_weighted`'s refine: the shared-shingle candidate join at
   60 → 600 → 1200 documents (sf0.1 corpus slices) — candidate pairs and
   wall; the claim is candidates track shared-shingle fanout (inverted-
   index shape), not |docs|².
B. `similarity_range_search`: corpus replicated 1× → 10× at fixed |Q|=8 —
   the brute gate tier must scale LINEARLY in corpus (it is one scan),
   which is exactly why production pre-buckets through the ANN rungs.
C. `pack_sequences_ffd`: 200 → 2000 documents over the same 4 shards —
   per-shard sequential packing; wall tracks shard size, bins track
   Σtokens/budget.

Usage: python tools/scale_probe_frontier8.py
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


def weighted_candidates(spark, n_docs):
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
    x = tf.select(F.col("id").alias("a"), "sh", F.col("tf").alias("tfa"))
    y = tf.select(F.col("id").alias("b"), "sh", F.col("tf").alias("tfb"))
    t0 = time.monotonic()
    pairs = (
        x.join(y, on="sh")
        .filter(F.col("b") > F.col("a"))
        .groupBy("a", "b")
        .agg(F.sum(F.least("tfa", "tfb")).alias("min_sum"))
        .count()
    )
    return pairs, round(time.monotonic() - t0, 2)


def range_search(spark, times):
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import quantize_vec

    base = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    parts = [
        base.select((F.col("vec_id") + 100000 * k).alias("vec_id"), "embedding")
        for k in range(times)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    em = corpus.select(
        "vec_id", quantize_vec(F.col("embedding")).alias("qv")
    ).select(
        "vec_id",
        "qv",
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("norm_sq"),
    ).localCheckpoint(eager=True)
    q = em.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm_sq").alias("q_norm"),
    )
    t0 = time.monotonic()
    n = (
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
            & (16 * F.col("dot_q") * F.col("dot_q") >= F.col("q_norm") * F.col("t_norm"))
        )
        .count()
    )
    return n, round(time.monotonic() - t0, 2)


def ffd(spark, n_docs):
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import _FFD_BUDGET

    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < n_docs)
        .select(
            (F.col("doc_id") % 4).cast("long").alias("shard"),
            F.col("doc_id").cast("long").alias("doc_id"),
            ((F.col("n_chars") / 16).cast("long") + 1).alias("tokens"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tokens", "doc_id"], ascending=[False, True]).reset_index(
            drop=True
        )
        fills: list[int] = []
        bins: list[int] = []
        for t in pdf["tokens"].astype("int64"):
            for i, fll in enumerate(fills):
                if fll + t <= _FFD_BUDGET:
                    fills[i] += t
                    bins.append(i + 1)
                    break
            else:
                fills.append(int(t))
                bins.append(len(fills))
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["shard", "doc_id", "tokens", "bin"]]

    schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("doc_id", LongType()),
            StructField("tokens", LongType()),
            StructField("bin", LongType()),
        ]
    )
    t0 = time.monotonic()
    out = docs.groupBy("shard").applyInPandas(pack, schema=schema)
    n_bins = out.select("shard", "bin").distinct().count()
    return n_bins, round(time.monotonic() - t0, 2)


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
        pairs, sec = weighted_candidates(spark, n)
        out[f"weighted_candidates_{n}docs"] = {"pairs": pairs, "sec": sec}
        spark.catalog.clearCache()
    for t in (1, 10):
        n, sec = range_search(spark, t)
        out[f"range_search_{t}x"] = {"hits": n, "sec": sec}
        spark.catalog.clearCache()
    for n in (200, 2000):
        bins, sec = ffd(spark, n)
        out[f"ffd_{n}docs"] = {"total_bins": bins, "sec": sec}
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
