"""Bucketed co-located join: one write-time shuffle, zero read-time
exchanges — the plan property SCALE.md claims for repeated fact-to-fact
joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.sinks.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") + 7).alias("vb"))
    write_bucketed(a, "bk_a", ["k"], 4, sort_cols=["k"])
    write_bucketed(b, "bk_b", ["k"], 4, sort_cols=["k"])
    yield "bk_a", "bk_b"
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ta, tb = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, ta).join(read_table(spark, tb), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    ta, _ = bucketed_tables
    agg = read_table(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 1000
