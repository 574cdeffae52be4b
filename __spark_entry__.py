"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check;
``queries()``/``oracle_sql()`` expose the full operator catalog
(cell_kn_mvp_etl_ontologies_spark.catalog) for the sf0.01 DuckDB differential
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from cell_kn_mvp_etl_ontologies_spark import catalog  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402

catalog.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-nation order digest.

    Exercises the engine's core shapes — broadcast dimension join (nation is
    the 'ro dictionary'), filter pushdown, hash aggregation with exact
    decimal arithmetic, and sorted map assembly (the vertex-document pivot
    shape from OntologyGraphBuilder.java:194-234) — on the synthetic star
    schema.
    """
    sf_dir = "/root/testdata/sf0.001"
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    enriched = (
        orders.filter(F.col("o_totalprice") > 0)
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    per_status = enriched.groupBy("n_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("total_price"),
    )
    return (
        per_status.groupBy("n_name")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("o_orderstatus", "total_price")))
            ).alias("price_by_status"),
        )
        .orderBy("n_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omissions get rows-only checks."""
    return dict(catalog.ORACLES)
