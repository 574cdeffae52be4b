"""Interleaved A/B for the round-14 CDC codepoint vectorization: the old
``np.fromiter((ord(c) for c in text))`` per-character interpreter loop vs
the UTF-32-LE ``np.frombuffer`` decode now in ``cdc_chunk_hashes_arrow``,
at the exact cdc_chunks_5k bench shape (full 5.5k-doc corpus, planted
copies, chunk census + pair join).  Also asserts the two variants'
outputs are row-identical.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_cdc_codes_ab.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.io import load_table, parallelize
from cell_kn_mvp_etl_ontologies_spark.operators.cdc import CDC_M, CDC_MOD, CDC_P, CDC_W
from cell_kn_mvp_etl_ontologies_spark.operators.cdc import cdc_chunk_hashes_arrow
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def cdc_chunk_hashes_arrow_old(df, id_col, text_col):
    """Pre-round-14 body, verbatim: ord() generator per character."""
    import hashlib

    import numpy as np
    import pandas as pd

    out_schema = f"{id_col} LONG, ch STRING"
    weights = np.array(CDC_P, dtype=np.int64)

    def chunk_batch(batches):
        for pdf in batches:
            ids, hashes = [], []
            for pid, text in zip(pdf[id_col], pdf[text_col]):
                codes = np.fromiter(
                    (ord(c) for c in text), dtype=np.int64, count=len(text)
                )
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

    return df.select(id_col, text_col).mapInPandas(chunk_batch, out_schema)


def row_frame(spark, chunker):
    """bench.cdc_chunks_5k body with the chunker injected."""
    SF_DIR = bench.SF_DIR
    docs = parallelize(load_table(spark, SF_DIR, "documents")).select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 100),
            F.lit("XXEDITXX"),
            F.expr("substring(text, 111)"),
        ).alias("text"),
    )
    corpus = docs.unionByName(planted)
    cset = chunker(corpus, "doc_id", "text").localCheckpoint()
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
            F.expr(
                "CAST(1000000 * n_shared DIV (na + nb - n_shared) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )
    return out.filter(F.col("jaccard_ppm") >= 250000)


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-cdc-codes-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    a = sorted(row_frame(spark, cdc_chunk_hashes_arrow_old).collect())
    b = sorted(row_frame(spark, cdc_chunk_hashes_arrow).collect())
    print(f"identity: {a == b} ({len(a)} rows)", flush=True)
    assert a == b

    readings: dict[str, list[float]] = {"OLD": [], "NEW": []}
    for rnd in range(4):
        for var in ("OLD", "NEW") if rnd % 2 == 0 else ("NEW", "OLD"):
            chunker = (
                cdc_chunk_hashes_arrow_old if var == "OLD" else cdc_chunk_hashes_arrow
            )
            spark._jvm.System.gc()
            t0 = time.time()
            row_frame(spark, chunker).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            readings[var].append(dt)
            print(f"round {rnd} {var}: {dt:.3f}s", flush=True)
    print()
    for var in ("OLD", "NEW"):
        r = readings[var]
        print(f"{var}: {['%.2f' % x for x in r]} min {min(r):.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
