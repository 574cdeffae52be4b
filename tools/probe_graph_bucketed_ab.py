"""Interleaved A/B for round-15's graph_build_full bucketed-landing question
(VERDICT r14 #2): does landing the triples in a SUBJECT-bucketed table make
the build's keyed joins cheap enough to beat the current
build-from-expression shape?

Three timed variants, same build_graph DAG and same output:

  expr          — the shipped bench body: triples derived from lineitem by
                  expressions, build runs on them directly.
  bucketed(+w)  — per iteration: write the same triples to a table bucketed
                  by subject (the landing write is INSIDE the timing — the
                  bench contract forbids precomputation across runs), then
                  build from spark.table(...).
  bucketed(ro)  — build from the already-written table (write excluded) —
                  NOT a legal bench shape, measured only to isolate how much
                  the bucketed layout helps the joins themselves (the 100 TB
                  landing-table story), separate from the write cost.

Identity asserted on the edges output.

Run:  SPARK_GRAFT_CPUS=32 python tools/probe_graph_bucketed_ab.py
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

from cell_kn_mvp_etl_ontologies_spark.fixtures import OBO, RDFS, fixture_ro_terms
from cell_kn_mvp_etl_ontologies_spark.io import load_table, parallelize
from cell_kn_mvp_etl_ontologies_spark.plans import build_graph
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WH = "/tmp/r15_graph_bucketed_wh"


def make_triples(spark):
    li = parallelize(load_table(spark, SF_DIR, "lineitem"))
    subj = F.concat(
        F.lit(OBO + "CL_"), F.lpad((F.col("l_orderkey") % 100000).cast("string"), 7, "0")
    )
    obj = F.concat(
        F.lit(OBO + "GO_"), F.lpad((F.col("l_partkey") % 50000).cast("string"), 7, "0")
    )
    is_edge = (F.col("l_linenumber") % 3) != 0
    return li.select(
        F.lit("synthetic.owl").alias("src_file"),
        subj.alias("subject"),
        F.when(is_edge, F.lit(RDFS + "subClassOf"))
        .otherwise(F.lit(RDFS + "label"))
        .alias("predicate"),
        F.when(is_edge, F.lit("iri")).otherwise(F.lit("literal")).alias("object_kind"),
        F.when(is_edge, obj).alias("object_iri"),
        F.when(~is_edge, F.concat(F.lit("label for "), subj)).alias("object_lexical"),
        F.lit(None).cast("string").alias("object_lang"),
        F.lit(None).cast("string").alias("object_datatype"),
    )


def main() -> int:
    shutil.rmtree(WH, ignore_errors=True)
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe-graph-bucketed-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", WH)
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "lineitem").count()  # warm scan path

    ro = fixture_ro_terms(spark)

    def write_bucketed():
        (
            make_triples(spark)
            .repartition(CPUS, "subject")
            .write.bucketBy(CPUS, "subject")
            .sortBy("subject")
            .mode("overwrite")
            .saveAsTable("triples_landing")
        )

    def build_from(triples):
        spark.catalog.clearCache()
        g = build_graph(triples, ro, persist_clean=True)
        g.edges.write.mode("overwrite").format("noop").save()

    # identity check
    write_bucketed()
    spark.catalog.clearCache()
    a = sorted(map(tuple, build_graph(make_triples(spark), ro, persist_clean=True).edges.collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, build_graph(spark.table("triples_landing"), ro, persist_clean=True).edges.collect()))
    print(f"identity: {a == b} ({len(a)} edges)", flush=True)
    assert a == b

    variants = {
        "expr": lambda: build_from(make_triples(spark)),
        "bucketed(+w)": lambda: (write_bucketed(), build_from(spark.table("triples_landing"))),
        "bucketed(ro)": lambda: build_from(spark.table("triples_landing")),
    }
    for fn in variants.values():  # warm
        fn()
    readings: dict[str, list[float]] = {}
    order = list(variants)
    for rnd in range(4):
        for name in order if rnd % 2 == 0 else reversed(order):
            spark._jvm.System.gc()
            t0 = time.time()
            variants[name]()
            dt = time.time() - t0
            readings.setdefault(name, []).append(dt)
            print(f"round {rnd} {name}: {dt:.3f}s", flush=True)
    print()
    for name, xs in readings.items():
        print(f"{name}: {['%.2f' % x for x in xs]} min {min(xs):.3f}")
    spark.stop()
    shutil.rmtree(WH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
