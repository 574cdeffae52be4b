from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF


@pytest.fixture(scope="session")
def spark():
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("cell-kn-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for key, value in ENGINE_SQL_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    yield spark
    spark.stop()


def rows_set(df, *cols):
    """Order-insensitive result set for golden assertions."""
    sel = df.select(*cols) if cols else df
    return {tuple(r) for r in sel.collect()}
