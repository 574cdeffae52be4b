"""Fixed-overhead audit for the sub-linear small bench rows (VERDICT r14
#7): inverted_index / bm25_documents / cosine_topk read 8→32-core scaling
ratios of 0.60 / 0.75 / 0.78 — 32 cores SLOWER than 8 on sub-2 s rows.

Hypothesis: nothing driver-side serializes (entry-L census: no collects in
these paths) and partition counts already derive from $SPARK_GRAFT_CPUS —
the inversion is per-task fixed cost: at CPUS=32 every stage runs 32-64
tiny tasks over KB-scale partitions, so scheduling + shuffle-block overhead
grows with the core count while the work per row doesn't.

Test: ONE 32-core session; each row timed with the shuffle fan-out at 32
(the bench posture) vs pinned to 8 (runtime conf + parallelize override).
If the 8-fanout variant on the SAME 32-core box reproduces the 8-core
speed, the inversion is task-count overhead, not contention or a
driver-side serialization — partitioning stays scale-adaptive and the
conclusion is documented, per the VERDICT item.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_small_row_overhead.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.io import load_table
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import similarity_topk
from cell_kn_mvp_etl_ontologies_spark.search import (
    build_inverted_index,
    text_en_no_stem_tokens,
)
from cell_kn_mvp_etl_ontologies_spark.search.ranking import bm25_rank_integer
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-small-row-overhead")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "documents").count()

    def docs(fanout: int):
        return load_table(spark, SF_DIR, "documents").repartition(fanout * 2)

    def inverted(fanout: int):
        return build_inverted_index(docs(fanout), ["doc_id"], "text", text_en_no_stem_tokens)

    def bm25(fanout: int):
        return bm25_rank_integer(
            docs(fanout), ["doc_id"], "text",
            ["data", "processing", "pipeline", "model"],
            text_en_no_stem_tokens, k=20,
        )

    def cosine(fanout: int):
        em = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        q = em.filter(F.col("vec_id") < 50)
        return similarity_topk(q, em.repartition(fanout * 2), k=10, quantized=False)

    rows = {"inverted_index": inverted, "bm25_documents": bm25, "cosine_topk": cosine}
    readings: dict[tuple[str, int], list[float]] = {}
    for fanout in (CPUS, 8):  # warm both fan-outs
        spark.conf.set("spark.sql.shuffle.partitions", str(fanout))
        for fn in rows.values():
            fn(fanout).write.mode("overwrite").format("noop").save()
    for rnd in range(5):
        for fanout in (CPUS, 8) if rnd % 2 == 0 else (8, CPUS):
            spark.conf.set("spark.sql.shuffle.partitions", str(fanout))
            for name, fn in rows.items():
                spark._jvm.System.gc()
                t0 = time.time()
                fn(fanout).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                readings.setdefault((name, fanout), []).append(dt)
                print(f"round {rnd} fanout={fanout} {name}: {dt:.3f}s", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))
    print()
    for name in rows:
        hi = readings[(name, CPUS)]
        lo = readings[(name, 8)]
        print(
            f"{name}: fanout{CPUS} {['%.2f' % x for x in hi]} min {min(hi):.3f} | "
            f"fanout8 {['%.2f' % x for x in lo]} min {min(lo):.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
