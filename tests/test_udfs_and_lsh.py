"""Tests for the Python extension surface (operators/udfs.py), the quantized
hyperplane LSH, and the single-pass vertex-attribute pivot rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.functions import fn_uri_basename
from cell_kn_mvp_etl_ontologies_spark.operators.aggregates import agg_pivot_vertex_attrs
from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
    hyperplane_lsh_bucket_quantized,
)
from cell_kn_mvp_etl_ontologies_spark.operators.udfs import (
    TokenizeUDTF,
    cents_sum_udf,
    uri_basename_udf,
)

def rows_set(df, *cols):
    sel = df.select(*cols) if cols else df
    return {tuple(r) for r in sel.collect()}


def test_pivot_merges_multivalued_attrs(spark):
    """Multiple values for one attr merge into a sorted array; attrs sorted."""
    rows = spark.createDataFrame(
        [
            ("CL", "1", "hasDbXref", "FMA:83585"),
            ("CL", "1", "hasDbXref", "BTO:0000801"),
            ("CL", "1", "hasDbXref", "FMA:83585"),  # duplicate collapses
            ("CL", "1", "label", "macrophage"),
            ("GO", "2", "label", "phagocytosis"),
        ],
        "id string, number string, attr string, value string",
    )
    out = {(r.id, r.number): r.attrs for r in agg_pivot_vertex_attrs(rows).collect()}
    assert out[("CL", "1")] == {
        "hasDbXref": ["BTO:0000801", "FMA:83585"],
        "label": ["macrophage"],
    }
    assert list(out[("CL", "1")].keys()) == ["hasDbXref", "label"]  # attr-sorted
    assert out[("GO", "2")] == {"label": ["phagocytosis"]}


def test_pivot_empty_input(spark):
    empty = spark.createDataFrame([], "id string, number string, attr string, value string")
    assert agg_pivot_vertex_attrs(empty).count() == 0


def test_lsh_bucket_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, [0.1, -0.2, 0.3]), (2, [0.1, -0.2, 0.3]), (3, [-0.5, 0.4, -0.1])],
        "vec_id long, embedding array<double>",
    )
    a = {r.vec_id: r.lsh_bucket for r in hyperplane_lsh_bucket_quantized(df, n_planes=6).collect()}
    b = {r.vec_id: r.lsh_bucket for r in hyperplane_lsh_bucket_quantized(df, n_planes=6).collect()}
    assert a == b  # deterministic across runs
    assert a[1] == a[2]  # identical vectors share a bucket
    assert all(0 <= v < 2**6 for v in a.values())


def test_uri_basename_udf_matches_column_path(spark):
    uris = [
        ("http://purl.obolibrary.org/obo/CL_0000235",),
        ("http://www.w3.org/2000/01/rdf-schema#subClassOf",),
        ("http://example.org/a/b/",),
    ]
    df = spark.createDataFrame(uris, "uri string")
    got = rows_set(
        df.select(
            uri_basename_udf(F.col("uri")).alias("u"), fn_uri_basename(F.col("uri")).alias("c")
        )
    )
    assert all(u == c for u, c in got)


def test_cents_sum_udf_exact(spark):
    df = spark.createDataFrame(
        [("a", 1.10), ("a", 2.05), ("b", 0.07)], "k string, v double"
    )
    got = rows_set(df.groupBy("k").agg(cents_sum_udf("v").alias("cents")))
    assert got == {("a", 315), ("b", 7)}


def test_tokenize_udtf_positions(spark):
    spark.udtf.register("tokenize_udtf_test", TokenizeUDTF)
    rows = spark.sql("SELECT * FROM tokenize_udtf_test('a bc  d')").collect()
    assert [(r.pos, r.token) for r in rows] == [(1, "a"), (2, "bc"), (3, ""), (4, "d")]
