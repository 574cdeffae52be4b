"""A/B the vertex-attrs pivot's object pressure (VERDICT r10 #3 / r9 #4b).

`agg_pivot_vertex_attrs` builds MAP<attr, ARRAY<value>> per vertex as ONE
ObjectHashAggregate (collect_set of (attr, value) structs) followed by a
codegen HOF regroup.  Driver windows have flagged the graph rows four
rounds running; the hypothesis is the object-heavy aggregation state.
Variants measured on the bench `graph_pivot` input (600k lineitem rows →
100k vertices, same single exchange satisfies every variant's grouping):

  A current      — collect_set(struct) → map_from_entries(HOF regroup)
  C unmapped     — same aggregate, sorted struct array kept UNMAPPED
                   (isolates the HOF+map cost from the aggregate cost)
  D two-level    — groupBy(id,number,attr).collect_set(value) →
                   groupBy(id,number).map_from_entries(collect_list) —
                   two ObjectHashAggregates, but per-group state is
                   (value) strings then (attr, values) pairs, never the
                   full (attr, value) pair multiset
  E agg-only     — collect_set(struct) with NO regroup at all (isolates
                   pure aggregation-state cost)

min-of-5 per variant with inter-iteration GC; sentinels first.  Also runs
`build_vertices` end-to-end (the pivot's real consumer) under A and D.

Run:  python tools/probe_pivot_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cell_kn_mvp_etl_ontologies_spark.io import load_table  # noqa: E402
from cell_kn_mvp_etl_ontologies_spark.session import ENGINE_SQL_CONF  # noqa: E402


def _mintime(spark, fn, n=5):
    best = float("inf")
    for _ in range(n):
        spark._jvm.System.gc()
        t0 = time.time()
        fn(spark).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    return round(best, 3)


def _rows(spark):
    li = load_table(spark, bench.SF_DIR, "lineitem").repartition(
        bench.CPUS * 2, "l_orderkey"
    )
    return li.select(
        F.col("l_orderkey").alias("id"),
        F.col("l_linenumber").cast("string").alias("number"),
        F.concat(F.lit("P"), (F.col("l_partkey") % 20).cast("string")).alias("attr"),
        F.col("l_extendedprice").cast("string").alias("value"),
    ).dropDuplicates(["id", "number", "attr", "value"])


def variant_a(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import (
        agg_pivot_vertex_attrs,
    )

    return agg_pivot_vertex_attrs(_rows(spark))


def variant_c(spark):
    entries = F.sort_array(F.collect_set(F.struct("attr", "value")))
    return _rows(spark).groupBy("id", "number").agg(entries.alias("entries"))


def variant_d(spark):
    rows = _rows(spark)
    per_attr = rows.groupBy("id", "number", "attr").agg(
        F.sort_array(F.collect_set("value")).alias("values")
    )
    return (
        per_attr.groupBy("id", "number")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("attr", "values")))
            ).alias("attrs")
        )
    )


def variant_e(spark):
    return (
        _rows(spark)
        .groupBy("id", "number")
        .agg(F.collect_set(F.struct("attr", "value")).alias("entries"))
    )


def main() -> None:
    builder = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, bench.SF_DIR, "lineitem").count()

    out: dict = {}
    out["sentinel_q1"] = _mintime(spark, bench.q1_pricing_summary, 3)
    out["sentinel_running_windows"] = _mintime(spark, bench.running_windows, 3)

    # equality check first: A == D on the full output (the swap must be
    # hash-neutral before any timing matters)
    a = variant_a(spark).withColumnRenamed("attrs", "a_attrs")
    d = variant_d(spark)
    diff = (
        a.join(d, on=["id", "number"], how="full")
        .filter(
            F.col("a_attrs").isNull()
            | F.col("attrs").isNull()
            | (F.map_entries("a_attrs").cast("string") != F.map_entries("attrs").cast("string"))
        )
        .count()
    )
    out["a_vs_d_diff_rows"] = diff

    out["pivot_A_current"] = _mintime(spark, variant_a, 5)
    out["pivot_C_unmapped"] = _mintime(spark, variant_c, 5)
    out["pivot_D_two_level"] = _mintime(spark, variant_d, 5)
    out["pivot_E_agg_only"] = _mintime(spark, variant_e, 5)
    out["bench_graph_pivot_row"] = _mintime(
        spark, bench.BENCH_QUERIES["graph_pivot"], 5
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
