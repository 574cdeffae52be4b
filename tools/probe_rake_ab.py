"""Interleaved A/B of text_keyword_rake's phrases materialization (round 14).

Variant A: lazy phrases (old shape — corpus scan + 3-regex chain + phrase
explode replay per consumer branch: occ_words, phrase_words, n_occ agg).
Variant B: eager localCheckpoint on phrases (one phrase pass).

Alternates A and B in one warm session (host noise on this VM swings 4-5x
between windows, so never compare across sessions), min-of-N each, and
asserts the two variants' outputs are row-identical.

Usage: python tools/probe_rake_ab.py [--rounds 4]
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
from pyspark.sql import functions as F

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

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier2 import (
        _RAKE_STOPWORDS,
        _rake_rank_from_phrases,
        _t,
    )

    def build(materialize: bool):
        marked = _t(spark, SF_DIR, "documents").select(
            "doc_id",
            F.regexp_replace(
                F.concat(
                    F.lit(" "),
                    F.regexp_replace(
                        F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")),
                        " ",
                        "  ",
                    ),
                    F.lit(" "),
                ),
                f" ({_RAKE_STOPWORDS}) ",
                " | ",
            ).alias("s"),
        )
        phrases = (
            marked.select("doc_id", F.explode(F.split("s", "\\|")).alias("p"))
            .filter(F.trim("p") != "")
            .select(
                "doc_id",
                F.trim(F.regexp_replace("p", " +", " ")).alias("phrase"),
            )
        )
        if materialize:
            phrases = phrases.localCheckpoint(eager=True)
        return _rake_rank_from_phrases(phrases)

    # row-identity check first (order-insensitive)
    a_rows = sorted(map(tuple, build(False).collect()))
    b_rows = sorted(map(tuple, build(True).collect()))
    assert a_rows == b_rows, "variant outputs differ!"
    print(f"outputs identical: {len(a_rows)} rows")

    times = {"lazy": [], "ckpt": []}
    for r in range(args.rounds):
        for label, mat in (("lazy", False), ("ckpt", True)):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            build(mat).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            times[label].append(dt)
            print(f"round {r} {label}: {dt:.2f}s", flush=True)
    for label, ts in times.items():
        print(f"{label}: {['%.2f' % t for t in ts]} min {min(ts):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
