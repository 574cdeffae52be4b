"""Golden unit tests for the §2.8 expression library, ported from
OntologyGraphBuilderTest.java:42-298 and OntologyDownloaderTest.java:18-44."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.functions import (
    fn_doc_collection_name,
    fn_doc_key,
    fn_extract_version_date,
    fn_make_edge_key,
    fn_make_vertex_id,
    fn_normalize_edge_label,
    fn_normalize_edge_source,
    fn_predicate_label,
    fn_uri_basename,
    fn_uri_fragment,
    fn_uri_rewrite_special,
    fn_version_from_info_or_iri,
    fn_version_newer,
    fn_vtuple,
)

OBO = "http://purl.obolibrary.org/obo/"


def one(spark, expr_fn, value):
    df = spark.createDataFrame([(value,)], "v: string")
    return df.select(expr_fn(F.col("v")).alias("out")).first()["out"]


# --- createVTuple golden cases (OntologyGraphBuilderTest.java:42-138) ---
@pytest.mark.parametrize(
    "uri,term,ident,number,valid",
    [
        (OBO + "CL_0000235", "CL_0000235", "CL", "0000235", True),
        (OBO + "GO_0031268", "GO_0031268", "GO", "0031268", True),
        (OBO + "UBERON_0000062", "UBERON_0000062", "UBERON", "0000062", True),
        (OBO + "NCBITaxon_9606", "NCBITaxon_9606", "NCBITaxon", "9606", True),
        (OBO + "HP_0001945", "HP_0001945", "HP", "0001945", True),
        (OBO + "MONDO_0004979", "MONDO_0004979", "MONDO", "0004979", True),
        # BFO is not in the valid-vertex whitelist (id/number still parsed,
        # matching the reference which only gates the validity flag)
        (OBO + "BFO_0000004", "BFO_0000004", "BFO", "0000004", False),
        # fragment-only URI: term has no separator -> early return, ALL null
        ("http://www.w3.org/2000/01/rdf-schema#subClassOf", None, None, None, False),
        # colon-separated final segment
        ("http://example.org/stuff/CL:0000235", "CL:0000235", "CL", "0000235", True),
        # provisional cell ontology rewrite
        ("http://purl.obolibrary.org/obo/pcl/CS202002013", "PCLCS_202002013", "PCLCS", "202002013", False),
        # no hierarchical path -> invalid
        ("mailto:nobody@example.org", None, None, None, False),
    ],
)
def test_vtuple_golden(spark, uri, term, ident, number, valid):
    row = (
        spark.createDataFrame([(uri,)], "v: string")
        .select(fn_vtuple(F.col("v")).alias("vt"))
        .select("vt.*")
        .first()
    )
    assert row["term"] == term
    assert row["id"] == ident
    assert row["number"] == number
    assert row["is_valid_vertex"] == valid


def test_vtuple_non_uri_literal(spark):
    row = (
        spark.createDataFrame([("macrophage", False)], "v: string, u: boolean")
        .select(fn_vtuple(F.col("v"), F.col("u")).alias("vt"))
        .select("vt.*")
        .first()
    )
    assert row["term"] is None and not row["is_valid_vertex"]


# --- parsePredicate (OntologyGraphBuilderTest.java:142-181) ---
def test_predicate_label_fragment(spark):
    assert one(spark, fn_predicate_label, "http://www.w3.org/2000/01/rdf-schema#subClassOf") == "subClassOf"


def test_predicate_label_last_path(spark):
    assert one(spark, fn_predicate_label, OBO + "RO_0002202") == "RO_0002202"


def test_uri_basename_and_fragment(spark):
    assert one(spark, fn_uri_basename, OBO + "CL_0000235") == "CL_0000235"
    assert one(spark, fn_uri_basename, OBO + "CL_0000235#frag") == "CL_0000235"
    assert one(spark, fn_uri_fragment, "http://x/y#frag") == "frag"
    assert one(spark, fn_uri_fragment, "http://x/y") is None


def test_uri_rewrite_special(spark):
    assert (
        one(spark, fn_uri_rewrite_special, "http://purl.obolibrary.org/obo/pcl/CS202002013")
        == "http://purl.obolibrary.org/obo/PCLCS_202002013"
    )
    assert (
        one(spark, fn_uri_rewrite_special, "http://identifiers.org/ensembl/ENSG00000170458")
        == "http://identifiers.org/ENSG_00000170458"
    )
    assert one(spark, fn_uri_rewrite_special, OBO + "CL_0000235") == OBO + "CL_0000235"


# --- normalization case maps (OntologyGraphBuilderTest.java:185-254) ---
@pytest.mark.parametrize(
    "raw,normalized",
    [
        ("subClassOf", "SUB_CLASS_OF"),
        ("disjointWith", "DISJOINT_WITH"),
        ("crossSpeciesExactMatch", "CROSS_SPECIES_EXACT_MATCH"),
        ("exactMatch", "EXACT_MATCH"),
        ("equivalentClass", "EQUIVALENT_CLASS"),
        ("seeAlso", "SEE_ALSO"),
        ("develops from", "DEVELOPS_FROM"),
        ("capable of", "CAPABLE_OF"),
        ("present in taxon", "PRESENT_IN_TAXON"),
    ],
)
def test_normalize_edge_label(spark, raw, normalized):
    assert one(spark, fn_normalize_edge_label, raw) == normalized


@pytest.mark.parametrize(
    "raw,normalized",
    [
        ("mondo-simple", "MONDO"),
        ("taxslim", "NCBITAXON"),
        ("go-plus", "GO"),
        ("uberon-base", "UBERON"),
        ("CL", "CL"),
        ("hsapdv", "HSAPDV"),
    ],
)
def test_normalize_edge_source(spark, raw, normalized):
    assert one(spark, fn_normalize_edge_source, raw) == normalized


# --- document id helpers (OntologyGraphBuilderTest.java:256-298) ---
def test_doc_helpers(spark):
    assert one(spark, fn_doc_collection_name, "CL-GO/0000235-0031268") == "CL-GO"
    assert one(spark, fn_doc_key, "CL-GO/0000235-0031268") == "0000235-0031268"
    assert one(spark, fn_doc_collection_name, "nokeyhere") is None
    assert one(spark, fn_doc_key, "nokeyhere") is None


def test_make_ids(spark):
    df = spark.createDataFrame([("CL", "0000235", "0031268")], "i: string, a: string, b: string")
    row = df.select(
        fn_make_vertex_id(F.col("i"), F.col("a")).alias("vid"),
        fn_make_edge_key(F.col("a"), F.col("b")).alias("ek"),
    ).first()
    assert row["vid"] == "CL/0000235"
    assert row["ek"] == "0000235-0031268"


# --- version extraction (OntologyDownloaderTest.java:18-44) ---
def test_version_extraction(spark):
    assert one(spark, fn_extract_version_date, "releases/2024-01-15 build") == "2024-01-15"
    assert one(spark, fn_extract_version_date, "no date here") is None
    df = spark.createDataFrame(
        [
            ("2024-01-15", "http://purl.obolibrary.org/obo/cl/releases/2023-12-01/cl.owl"),
            (None, "http://purl.obolibrary.org/obo/cl/releases/2023-12-01/cl.owl"),
            (None, None),
        ],
        "vi: string, viri: string",
    )
    out = [
        r["v"]
        for r in df.select(
            fn_version_from_info_or_iri(F.col("vi"), F.col("viri")).alias("v")
        ).collect()
    ]
    assert out == ["2024-01-15", "2023-12-01", None]


def test_version_newer(spark):
    df = spark.createDataFrame(
        [("2024-02-01", "2024-01-15"), ("2024-01-15", "2024-01-15"), (None, "2024-01-15")],
        "new: string, cur: string",
    )
    out = [r["x"] for r in df.select(fn_version_newer(F.col("new"), F.col("cur")).alias("x")).collect()]
    assert out == [True, False, False]


def test_label_lang_preferred_property(spark):
    """Property pin for the round-6 language-fallback selection: against a
    brute-force python reference over a grid of label sets covering every
    priority bucket, tie, and multi-label shape."""
    import itertools

    from cell_kn_mvp_etl_ontologies_spark.fixtures import RDFS, TRIPLES_SCHEMA
    from cell_kn_mvp_etl_ontologies_spark.operators.filters import (
        label_lang_preferred,
    )

    langs = ("en", "de")
    # label pool: (lexical, lang) — includes duplicates-by-priority and ties
    pool = [
        ("a", "en"), ("b", "en"), ("a", "de"), ("c", "de"),
        ("a", None), ("d", None), ("a", "fr"), ("e", "fr"), ("a", "zz"),
    ]

    def ref_pick(labels):
        def prio(lang):
            if lang in langs:
                return langs.index(lang)
            if lang is None:
                return len(langs)
            return len(langs) + 1
        return min(
            labels,
            key=lambda lv: (prio(lv[1]), lv[0], "" if lv[1] is None else "\x01" + lv[1]),
        )

    rows, expected = [], {}
    sid = 0
    for r in (1, 2, 3):
        for combo in itertools.combinations(pool, r):
            subj = f"http://x/S{sid}"
            sid += 1
            for lex, lang in combo:
                rows.append(("f", subj, RDFS + "label", "literal", None, lex, lang, None))
            expected[subj] = ref_pick(combo)[:2]
    triples = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    got = {
        r.subject: (r.label, r.lang)
        for r in label_lang_preferred(triples, RDFS + "label", langs=langs).collect()
    }
    assert got == expected
