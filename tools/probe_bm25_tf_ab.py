"""Interleaved A/B of bm25_rank_integer's tf materialization (round 14).

Variant A: lazy tf (old shape, 4 tokenize passes).
Variant B: eager localCheckpoint on tf (one tokenize pass).

Alternates A and B in one warm session (host noise on this VM swings 4-5x
between windows, so never compare across sessions), min-of-N each, and
asserts the two variants' outputs are row-identical.

Usage: python tools/probe_bm25_tf_ab.py [--rounds 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import SparkSession

from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from cell_kn_mvp_etl_ontologies_spark.io import load_table, parallelize
    from cell_kn_mvp_etl_ontologies_spark.search import text_en_no_stem_tokens
    from cell_kn_mvp_etl_ontologies_spark.search.ranking import bm25_rank_integer

    def run(materialize: bool):
        docs = parallelize(load_table(spark, SF_DIR, "documents"))
        return bm25_rank_integer(
            docs,
            ["doc_id"],
            "text",
            ["data", "processing", "pipeline", "model"],
            text_en_no_stem_tokens,
            k=20,
            materialize_tf=materialize,
        )

    # semantics first: sorted rows identical
    a_rows = sorted(map(tuple, run(False).collect()))
    b_rows = sorted(map(tuple, run(True).collect()))
    assert a_rows == b_rows, "variant outputs differ!"
    print(f"semantics: {len(a_rows)} rows identical")

    best = {"lazy": float("inf"), "ckpt": float("inf")}
    readings: dict[str, list[float]] = {"lazy": [], "ckpt": []}
    for r in range(args.rounds):
        for label, flag in (("lazy", False), ("ckpt", True)):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.time()
            run(flag).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            readings[label].append(dt)
            best[label] = min(best[label], dt)
    for label in ("lazy", "ckpt"):
        print(label, [round(x, 3) for x in readings[label]], "min", round(best[label], 3))
    spark.stop()


if __name__ == "__main__":
    main()
