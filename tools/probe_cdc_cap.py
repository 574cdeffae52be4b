"""A/B the CDC hot-chunk cap at sf0.1 grain (VERDICT r10 #5).

Builds a 1,000-payload corpus with a fixed boilerplate footer appended to
every third payload (the template-mass failure mode: footer-interior chunks
hash identically across ~333 payloads), then measures the census self-join's
candidate-pair volume and wall time capped (max_freq=8) vs uncapped.

Usage: python tools/probe_cdc_cap.py  (prints a JSON line; paste numbers
into SCALE.md §cdc-cap)
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

from cell_kn_mvp_etl_ontologies_spark.catalog.frontier4 import (  # noqa: E402
    _CDC_FOOTER,
)
from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.operators.cdc import (  # noqa: E402
    cdc_census_cap,
    cdc_chunk_hashes_arrow,
)
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def candidate_pairs(cset):
    x = cset.select(F.col("doc_id").alias("a"), "ch")
    y = cset.select(F.col("doc_id").alias("b"), "ch")
    return x.join(y, on="ch").filter(F.col("b") > F.col("a")).count()


def main() -> None:
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 1000)
        .select("doc_id", "text")
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit(_CDC_FOOTER)),
            ).otherwise(F.col("text")),
        )
    )
    # production chunker (Arrow), census materialized once per arm
    cset = cdc_chunk_hashes_arrow(docs, "doc_id", "text").localCheckpoint(
        eager=True
    )

    freq = cset.groupBy("ch").agg(F.count(F.lit(1)).alias("f"))
    hot = freq.filter(F.col("f") > 8).count()
    max_f = freq.agg(F.max("f")).collect()[0][0]

    t0 = time.monotonic()
    n_unc = candidate_pairs(cset)
    t_unc = time.monotonic() - t0

    t0 = time.monotonic()
    capped = cdc_census_cap(cset, "doc_id", max_freq=8).localCheckpoint(
        eager=True
    )
    n_cap = candidate_pairs(capped)
    t_cap = time.monotonic() - t0

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "docs": docs.count(),
                "chunks": cset.count(),
                "hot_chunks_gt8": hot,
                "max_chunk_freq": max_f,
                "pairs_uncapped": n_unc,
                "pairs_capped": n_cap,
                "reduction_x": round(n_unc / max(n_cap, 1), 2),
                "sec_uncapped_join": round(t_unc, 2),
                "sec_capped_filter_plus_join": round(t_cap, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
