"""10× scale probes for the round-7 heavy families (VERDICT r7 #6):
MaxSim routed serving, CDC content-defined chunking, and the iterative
graph pair k-truss + label propagation.

Claim under test, per family: the plan shape survives a 10× scale-up
with roughly linear cost on local[N] — a wall ratio far above 10 (or an
OOM/spill cliff) would mean the sf0.1 bench point is hiding a
super-linear stage.  Each probe scales BOTH row count and id-space
(entity cardinality grows with the corpus, as in the graph-build probe).

Usage: python tools/scale_probe_round7_families.py [mult ...]  # default 1 10
Prints one JSON line per family; record ratios in SCALE.md
§round7-families-at-10x.
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
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def maxsim_routed(spark, mult: int):
    """Bench maxsim_routed_10k shape at mult×: 10k·mult 8-token docs from
    the jitter-expanded embeddings, 50 query docs, 64 cells, nprobe=8."""
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        maxsim_topk_routed_vectorized,
    )

    em = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    times = 40 * mult
    reps = spark.range(times).select(F.col("id").cast("int").alias("rep"))
    corpus = em.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") * times + F.col("rep")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x * (1.0 + ((i + F.col("rep") * 7) % 13) / 40.0)).cast(
                "float"
            ),
        ).alias("embedding"),
    ).repartition(CPUS * 2)
    toks = corpus.select(
        F.expr("vec_id div 8").cast("long").alias("t_id"),
        (F.col("vec_id") % 8).cast("long").alias("t_tok"),
        F.col("embedding").alias("vec"),
    )
    q_tokens = toks.filter(F.col("t_id") < 50).select(
        F.col("t_id").alias("q_id"), F.col("t_tok").alias("q_tok"), "vec"
    )
    return maxsim_topk_routed_vectorized(
        q_tokens, toks, k=10, n_cells=64, nprobe=8, scale=1000
    )


def cdc_chunks(spark, mult: int):
    """Bench cdc_chunks_5k shape at mult×: the document corpus replicated
    with distinct ids and id-salted text (chunk sets stay diverse), plus
    500·mult planted middle-edit near-dups, screened against the corpus
    census via the Arrow chunker + chunk-hash equi-join."""
    from cell_kn_mvp_etl_ontologies_spark.operators.cdc import (
        cdc_chunk_hashes_arrow,
        cdc_dedup_vs_corpus,
    )

    docs0 = parallelize(load_table(spark, SF_DIR, "documents")).select(
        "doc_id", "text"
    )
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    docs = docs0.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")))
        .alias("text"),
    )
    planted = docs.filter(F.col("doc_id") % (11 * mult) == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 100),
            F.lit("XXEDITXX"),
            F.expr("substring(text, 111)"),
        ).alias("text"),
    )
    cset = cdc_chunk_hashes_arrow(docs, "doc_id", "text")
    counts = cset.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return cdc_dedup_vs_corpus(planted, cset, counts)


def ktruss(spark, mult: int):
    """graph_ktruss's co-purchase 5-truss (2-round peel) at mult× edges:
    lineitem replicated with order/part id-space scaled, same
    triangle_list + census + semi-filter rounds."""
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        canonical_undirected,
        triangle_list,
    )

    # Scale as mult DISJOINT COPIES of the 1× graph (filter on ORIGINAL
    # keys first, then replicate into disjoint id-spaces): edges ×mult at
    # CONSTANT density, the "more corpus, same structure" axis.  An
    # earlier version of this probe replicated ids without scaling the
    # per-copy part vocabulary, which DENSIFIED the graph instead —
    # triangle work is O(m^1.5)-ish in density, and the measured ratio
    # blew to 22× at 10× rows; that is the densification axis, not the
    # scale-up axis, and it is called out in SCALE.md rather than probed
    # here.
    li0 = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    li = (
        parallelize(li0)
        .filter(F.col("l_orderkey") % 5 == 0)
        .crossJoin(F.broadcast(reps))
        .select(
            (F.col("l_orderkey") * mult + F.col("rep")).alias("l_orderkey"),
            (F.col("l_partkey") * mult + F.col("rep")).alias("l_partkey"),
        )
        .distinct()
    )
    pairs = (
        li.alias("x")
        .join(li.alias("y"), on="l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    )
    edges = canonical_undirected(pairs)
    # the EXACT graph_ktruss_q round loop (frontier3.py), mult-scaled input
    k, n_rounds = 5, 2
    for _ in range(n_rounds):
        edges = edges.localCheckpoint(eager=True)
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
        edges = (
            edges.join(supp, ["a", "b"])
            .filter(F.col("supp") >= k - 2)
            .select("a", "b")
        )
    return edges


def lpa(spark, mult: int):
    """graph_label_propagation's 3-round vote at mult× edges (supplier and
    part id-spaces scaled with the corpus)."""
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import label_propagation

    li0 = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey"
    )
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    li = (
        parallelize(li0)
        .crossJoin(F.broadcast(reps))
        .filter((F.col("l_orderkey") * mult + F.col("rep")) % 3 == 0)
    )
    edges = li.select(
        (F.col("l_suppkey") * mult + F.col("rep")).cast("long").alias("src"),
        (
            F.lit(100000) * mult
            + (F.col("l_partkey") * mult + F.col("rep")) % (1500 * mult)
        ).cast("long").alias("dst"),
    )
    return label_propagation(edges, n_rounds=3)


FAMILIES = {"maxsim_routed": maxsim_routed, "cdc_chunks": cdc_chunks,
            "ktruss": ktruss, "lpa": lpa}


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("round7-families-scale-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "lineitem").count()  # scan warmup

    def _warm(batches):
        import numpy as np  # noqa: F401
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"]})

    _noop(spark.range(1000).mapInPandas(_warm, "id long"))  # Arrow warmup

    for fam, fn in FAMILIES.items():
        out = {"family": fam, "mults": {}}
        for m in mults:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                _noop(fn(spark, m))
                best = min(best, time.time() - t0)
            out["mults"][str(m)] = round(best, 2)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        if len(mults) == 2:
            a, b = (out["mults"][str(m)] for m in mults)
            out["ratio"] = round(b / a, 2)
            out["mult_ratio"] = mults[1] / mults[0]
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
