"""Round-13 100× scale probes (VERDICT r12 #5): push the heaviest r11/r12
claims from 10× to ~100× along their true scaling axes.

A. `dedup_minhash_weighted_capped` — candidate-count linearity under the
   df-16 cap, measured against SHINGLE-CENSUS size (the axis the cap
   bounds): doc counts 60 → 600 → 1,200 → 5,000 (the full sf0.1 corpus)
   and, at 5,000 docs, shingle windows 60 → 240 chars — ~2.3 decades of
   census size over the r12 baseline.  Claim: pairs/census-row stays
   bounded (per-shingle fanout ≤ cap, so candidates ≤ census · cap/2).

B. `graph_bipartite_projection_capped` — pair volume across THREE decades
   of events (sf0.001 → sf0.01 → sf0.1, 1k → 100k events = 100×), via the
   registered row unmodified.  Claim: pair volume linear in events (the
   natural per-basket degree ceiling + the df-7 cap bound fanout).

C. The two round-12 IVM maintainers not yet state-probed
   (`stream_drawdown_maintain`, `stream_vocab_coverage_maintain`) — state
   census cardinality at the same three decades, batch-derived (the
   registered rows clean their scratch — the scale_probe_ivm_state_r12
   method).  Claims: drawdown state = (user, day) entity×calendar grain
   (events fold into it, never accumulate); vocab state = token-census
   grain on the contract slice (flat by construction) and VOCABULARY
   grain on the production shape (sublinear in tokens — measured
   census/token ratio per decade).

Run:  python tools/scale_probe_r13_100x.py
"""

from __future__ import annotations

import importlib.util
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
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
CAP = 16


def capped_candidates(spark, n_docs: int, prefix_chars: int = 60) -> dict:
    """The dedup_minhash_weighted_capped candidate join at (n_docs,
    prefix_chars), returning census size, candidate pairs, and wall —
    the scale_probe_frontier9 shape with the census axis widened."""
    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < n_docs)
        .select("doc_id", F.substring("text", 1, prefix_chars).alias("text"))
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
    census = tf.count()
    kept = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
    ).filter(F.col("df") <= CAP)
    kept_census = kept.count()
    t0 = time.monotonic()
    pairs = (
        kept.select(F.col("id").alias("a"), "sh", F.col("tf").alias("tfa"))
        .join(kept.select(F.col("id").alias("b"), "sh", F.col("tf").alias("tfb")), on="sh")
        .filter(F.col("b") > F.col("a"))
        .groupBy("a", "b")
        .agg(F.sum(F.least("tfa", "tfb")).alias("min_sum"))
        .count()
    )
    return {
        "n_docs": n_docs,
        "prefix_chars": prefix_chars,
        "census": census,
        "kept_census": kept_census,
        "pairs": pairs,
        "pairs_per_kept_row": round(pairs / max(kept_census, 1), 2),
        "wall_s": round(time.monotonic() - t0, 2),
    }


def vocab_state(spark, sf: str) -> dict:
    """stream_vocab_coverage_maintain state grain: contract slice (two
    (tok, c) censuses over doc_id<100 / 100..199) and the production
    shape (full-corpus token census vs token count)."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"[\s\x1f]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    contract = (
        toks.filter(F.col("doc_id") < 200)
        .select(F.when(F.col("doc_id") < 100, 1).otherwise(2).alias("half"), "tok")
        .distinct()
        .count()
    )
    n_tokens = toks.count()
    vocab = toks.select("tok").distinct().count()
    return {
        "contract_census": contract,
        "corpus_tokens": n_tokens,
        "corpus_vocab_census": vocab,
        "vocab_per_1k_tokens": round(1000 * vocab / max(n_tokens, 1), 1),
    }


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()

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

    # A — weighted-capped census axis
    out["weighted_capped"] = [
        capped_candidates(spark, n, w)
        for n, w in [(60, 60), (600, 60), (1200, 60), (5000, 60), (5000, 240)]
    ]

    # B — bipartite projection across three decades
    out["bipartite"] = []
    for sf in SFS:
        n_events = load_table(spark, sf, "events").count()
        t0 = time.monotonic()
        n_pairs = qs["graph_bipartite_projection_capped"](spark, sf).count()
        out["bipartite"].append(
            {
                "sf": sf.rsplit("sf", 1)[-1],
                "events": n_events,
                "pairs": n_pairs,
                "wall_s": round(time.monotonic() - t0, 2),
            }
        )

    # C — r12 maintainer state grain
    out["drawdown_state"] = []
    out["vocab_state"] = []
    for sf in SFS:
        tag = sf.rsplit("sf", 1)[-1]
        ev = load_table(spark, sf, "events")
        census = (
            ev.select("user_id", F.col("ts").cast("date").alias("day"))
            .distinct()
            .count()
        )
        out["drawdown_state"].append(
            {"sf": tag, "events": ev.count(), "user_day_census": census}
        )
        out["vocab_state"].append({"sf": tag, **vocab_state(spark, sf)})

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
