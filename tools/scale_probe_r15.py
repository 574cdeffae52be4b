"""Scale probes for the round-14 optimization claims (VERDICT r14 #6): the
removed O(rows) terms — the cdc single-pass checkpoint, the utf-32
codepoint decode, the bm25 tf single-pass, the state-commit rename — were
justified at sf0.1 by scale ARGUMENTS; this probe bends the actual curves
by re-measuring each A/B at ~1× and ~8× corpus/state grain in one warm
session (interleaved variants).  Results recorded in SCALE.md §r15-scale.

Run:  SPARK_GRAFT_CPUS=32 python tools/scale_probe_r15.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.io import (
    commit_state_parquet,
    load_table,
    parallelize,
)
from cell_kn_mvp_etl_ontologies_spark.operators.cdc import cdc_chunk_hashes_arrow
from cell_kn_mvp_etl_ontologies_spark.search import text_en_no_stem_tokens
from cell_kn_mvp_etl_ontologies_spark.search.ranking import bm25_rank_integer
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = "/tmp/r15_scale_probe"


def docs_at(spark, times: int):
    """Deterministic ~times× replication of the documents table with
    distinct ids (text perturbed by a replica tag so chunk/token content
    is not byte-identical across replicas)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    if times == 1:
        return parallelize(docs)
    reps = spark.range(times).select(F.col("id").alias("rep"))
    return parallelize(
        docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") * times + F.col("rep")).alias("doc_id"),
            F.concat(F.lit("rep"), F.col("rep").cast("string"), F.lit(" "), F.col("text")).alias("text"),
        ),
        CPUS * 4,
    )


def cdc_pipeline(corpus, ckpt: bool):
    cset = cdc_chunk_hashes_arrow(corpus, "doc_id", "text")
    if ckpt:
        cset = cset.localCheckpoint()
    nc = cset.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x = cset.select(F.col("doc_id").alias("a"), "ch")
    y = cset.select(F.col("doc_id").alias("b"), "ch")
    shared = (
        x.join(y, on="ch")
        .filter(F.col("b") > F.col("a"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(nc.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), on="a")
        .join(nc.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), on="b")
        .select(
            "a", "b",
            F.expr("CAST(1000000 * n_shared DIV (na + nb - n_shared) AS BIGINT)").alias("jaccard_ppm"),
        )
    )
    return out.filter(F.col("jaccard_ppm") >= 250000)


def cdc_ord_loop(df, id_col, text_col):
    """The pre-round-14 per-character ord() decode (M2's 'before' arm)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from cell_kn_mvp_etl_ontologies_spark.operators.cdc import (
        CDC_M, CDC_MOD, CDC_P, CDC_W,
    )

    weights = np.array(CDC_P, dtype=np.int64)

    def chunk_batch(batches):
        for pdf in batches:
            ids, hashes = [], []
            for pid, text in zip(pdf[id_col], pdf[text_col]):
                codes = np.array([ord(c) for c in text], dtype=np.int64)
                n = codes.shape[0]
                seen = set()
                if n >= CDC_W:
                    win = np.lib.stride_tricks.sliding_window_view(codes, CDC_W)
                    h = (win * weights).sum(axis=1) % CDC_M % CDC_MOD
                    bends = np.nonzero(h == 0)[0] + (CDC_W - 1)
                else:
                    bends = np.array([], dtype=np.int64)
                start = 0
                for b in bends:
                    seen.add(hashlib.md5(text[start : b + 1].encode()).hexdigest())
                    start = b + 1
                if start < n:
                    seen.add(hashlib.md5(text[start:].encode()).hexdigest())
                for ch in seen:
                    ids.append(pid)
                    hashes.append(ch)
            yield pd.DataFrame({id_col: ids, "ch": hashes})

    return df.select(id_col, text_col).mapInPandas(chunk_batch, f"{id_col} LONG, ch STRING")


def state_rows(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
        (F.col("id") % 1000).alias("grp"),
    )


def commit_double_write(df, path: str) -> None:
    """The pre-round-14 write+read+write commit (entry F's 'before' arm)."""
    spark = df.sparkSession
    staging = path.rstrip("/") + "_staging"
    df.write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(path)


def main() -> int:
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale-probe-r15")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "documents").count()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    suites: dict[str, dict[str, callable]] = {}
    for times, tag in ((1, "1x"), (8, "8x")):
        corpus = docs_at(spark, times)
        suites[f"cdc_ckpt[{tag}]"] = {
            "lazy": (lambda c=corpus: noop(cdc_pipeline(c, ckpt=False))),
            "ckpt": (lambda c=corpus: noop(cdc_pipeline(c, ckpt=True))),
        }
        suites[f"cdc_decode[{tag}]"] = {
            "ord-loop": (lambda c=corpus: noop(cdc_ord_loop(c, "doc_id", "text"))),
            "utf32": (lambda c=corpus: noop(cdc_chunk_hashes_arrow(c, "doc_id", "text"))),
        }
        suites[f"bm25_tf[{tag}]"] = {
            "lazy": (
                lambda c=corpus: noop(
                    bm25_rank_integer(
                        c, ["doc_id"], "text",
                        ["data", "processing", "pipeline", "model"],
                        text_en_no_stem_tokens, k=20, materialize_tf=False,
                    )
                )
            ),
            "ckpt": (
                lambda c=corpus: noop(
                    bm25_rank_integer(
                        c, ["doc_id"], "text",
                        ["data", "processing", "pipeline", "model"],
                        text_en_no_stem_tokens, k=20, materialize_tf=True,
                    )
                )
            ),
        }
    for n, tag in ((200_000, "200k"), (2_000_000, "2m")):
        st = state_rows(spark, n)
        suites[f"state_commit[{tag}]"] = {
            "double-write": (
                lambda s=st, t=tag: commit_double_write(s, f"{TMP}/dw_{t}")
            ),
            "rename": (
                lambda s=st, t=tag: commit_state_parquet(s, f"{TMP}/rn_{t}")
            ),
        }

    results: dict[str, dict[str, list[float]]] = {}
    for suite, variants in suites.items():
        for fn in variants.values():  # warm once
            fn()
        for rnd in range(3):
            order = list(variants) if rnd % 2 == 0 else list(reversed(list(variants)))
            for name in order:
                spark._jvm.System.gc()
                t0 = time.time()
                variants[name]()
                dt = time.time() - t0
                results.setdefault(suite, {}).setdefault(name, []).append(dt)
                print(f"{suite} {name}: {dt:.3f}s", flush=True)
        spark.catalog.clearCache()
    print()
    for suite, vs in results.items():
        parts = [
            f"{name} {['%.2f' % x for x in xs]} min {min(xs):.3f}"
            for name, xs in vs.items()
        ]
        print(f"{suite}: " + " | ".join(parts))
    spark.stop()
    shutil.rmtree(TMP, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
