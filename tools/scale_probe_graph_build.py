"""Scale probe for the flagship graph build (VERDICT r3 #4): run the
bench's synthetic-triples build_graph DAG at 1× (~600k triples, the sf0.1
bench point) and at 10× (~6M triples — the sf1-equivalent), and report the
wall-time ratio.

The claim under test: the plan shape (single-pass URI parse over *distinct*
URIs, pivot confined to the vertices branch, MEMORY_AND_DISK persists as
codegen barriers) survives a 10× scale-up with roughly linear cost — a
ratio far above 10 would indicate a spill/skew cliff the sf0.1 bench can't
see.  Usage:

    python tools/scale_probe_graph_build.py [mult ...]   # default: 1 10
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

from cell_kn_mvp_etl_ontologies_spark.fixtures import OBO, RDFS, fixture_ro_terms
from cell_kn_mvp_etl_ontologies_spark.io import load_table, parallelize
from cell_kn_mvp_etl_ontologies_spark.plans import build_graph
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def synthetic_triples(spark, mult: int):
    """The bench's graph_build_full triple generator, scaled ``mult``× in
    BOTH row count and id-space (vertex cardinality grows with the corpus,
    as it does for real ontologies)."""
    li = parallelize(load_table(spark, SF_DIR, "lineitem"))
    if mult > 1:
        reps = spark.range(mult).select(F.col("id").alias("rep"))
        li = li.crossJoin(reps).withColumn(
            "l_orderkey", F.col("l_orderkey") * mult + F.col("rep")
        ).withColumn("l_partkey", F.col("l_partkey") * mult + F.col("rep"))
    subj = F.concat(
        F.lit(OBO + "CL_"),
        F.lpad((F.col("l_orderkey") % (100000 * mult)).cast("string"), 8, "0"),
    )
    obj = F.concat(
        F.lit(OBO + "GO_"),
        F.lpad((F.col("l_partkey") % (50000 * mult)).cast("string"), 8, "0"),
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


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    builder = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("graph-build-scale-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "lineitem").count()  # warm scan path

    results = {}
    for mult in mults:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.time()
        g = build_graph(synthetic_triples(spark, mult), fixture_ro_terms(spark), persist_clean=True)
        g.vertices.write.mode("overwrite").format("noop").save()
        g.edges.write.mode("overwrite").format("noop").save()
        results[f"x{mult}"] = round(time.time() - t0, 3)
    if len(results) >= 2:
        keys = sorted(results, key=lambda k: int(k[1:]))
        results["ratio"] = round(results[keys[-1]] / results[keys[0]], 2)
    print(json.dumps({"metric": "graph_build_scale_probe", "sf_dir": SF_DIR, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
