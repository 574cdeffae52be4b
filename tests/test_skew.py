"""Salted aggregation / salted join equivalence with the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.skew import (
    salted_collect_set,
    salted_join,
)


def _hot_df(spark):
    # one pathologically hot key ('hot' = 90% of rows) plus a uniform tail
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 137).alias("v"),
    )


def test_salted_collect_set_equals_unsalted(spark):
    df = _hot_df(spark)
    salted = {
        r.k: r.values for r in salted_collect_set(df, ["k"], "v", n_salts=8).collect()
    }
    plain = {
        r.k: r.values
        for r in df.groupBy("k").agg(F.sort_array(F.collect_set("v")).alias("values")).collect()
    }
    assert salted == plain
    assert len(salted["hot"]) == 137


def test_salted_join_equals_plain_join(spark):
    big = _hot_df(spark).withColumnRenamed("v", "payload")
    small = spark.createDataFrame([("hot", 1), ("cold", 2), ("absent", 3)], "k string, dim int")
    # force the shuffle path so the salt actually shapes an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(big, small, ["k"], n_salts=4).groupBy("k", "dim").count()
        want = big.join(small, on="k").groupBy("k", "dim").count()
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("zzz", 2)], "k string, payload int")
    small = spark.createDataFrame([("a", 10)], "k string, dim int")
    rows = {
        (r.k, r.payload, r.dim)
        for r in salted_join(big, small, ["k"], n_salts=4, how="left").collect()
    }
    assert rows == {("a", 1, 10), ("zzz", 2, None)}
