"""Property-based tests (hypothesis) for the §2.8 expression library.

Each property checks the Column implementation against an independent pure-
Python reimplementation of the reference's Java semantics (String.split with
trailing-empty drop, java.net.URI path extraction, first-'/' document id
split, the normalization case maps).  Inputs are generated, not golden — the
layer SURVEY.md §5 notes the reference lacks.

Examples are batched into one DataFrame per case so each hypothesis example
costs one Spark job, and example counts are kept small (Spark round-trips
are ~100 ms each).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.functions import (
    fn_doc_collection_name,
    fn_doc_key,
    fn_normalize_edge_label,
    fn_term_split,
    fn_uri_basename,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# -- pure-Python references ------------------------------------------------


def _java_split(s: str, sep: str) -> list[str]:
    """Java String.split(regex-less separator): trailing empties dropped."""
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def ref_term_split(term: str) -> tuple[str | None, str | None]:
    if "_" in term:
        parts = _java_split(term, "_")
    elif ":" in term:
        parts = _java_split(term, ":")
    else:
        return (None, None)
    if len(parts) == 2 and parts[1] != "":
        return (parts[0], parts[1])
    return (None, None)


def ref_doc_split(doc_id: str) -> tuple[str | None, str | None]:
    if "/" not in doc_id:
        return (None, None)
    coll, key = doc_id.split("/", 1)
    return (coll, key)


_LABEL_MAP = {
    "subClassOf": "SUB_CLASS_OF",
    "disjointWith": "DISJOINT_WITH",
    "crossSpeciesExactMatch": "CROSS_SPECIES_EXACT_MATCH",
    "exactMatch": "EXACT_MATCH",
    "equivalentClass": "EQUIVALENT_CLASS",
    "seeAlso": "SEE_ALSO",
}


def ref_normalize_label(label: str) -> str:
    return _LABEL_MAP.get(label, label.replace(" ", "_").upper())


def ref_uri_basename(scheme: str, host: str, segs: list[str], frag: str | None) -> str | None:
    # structured by construction: scheme://host/seg1/seg2[#frag]
    last = None
    for s in segs:
        if s:
            last = s
    return last


# -- strategies ------------------------------------------------------------

term_alpha = st.text(alphabet="ABC_:0123456789", max_size=12)
label_text = st.text(
    alphabet="abcdefgh XYZ", max_size=15
) | st.sampled_from(list(_LABEL_MAP))
docid_text = st.text(alphabet="ABC/0123456789-", max_size=12)
seg_text = st.text(alphabet="abcZ019_.-", max_size=6)


def _batch(spark, values: list[str]):
    return spark.createDataFrame([(v,) for v in values], "s string")


# -- properties ------------------------------------------------------------


@SETTINGS
@given(st.lists(term_alpha, min_size=1, max_size=25))
def test_term_split_matches_java_semantics(spark, terms):
    got = (
        _batch(spark, terms)
        .select("s", fn_term_split(F.col("s")).alias("st"))
        .select("s", "st.id", "st.number")
        .collect()
    )
    for r in got:
        assert (r.id, r.number) == ref_term_split(r.s), r.s


@SETTINGS
@given(st.lists(docid_text, min_size=1, max_size=25))
def test_doc_id_helpers_match_first_slash_split(spark, ids):
    got = (
        _batch(spark, ids)
        .select(
            "s",
            fn_doc_collection_name(F.col("s")).alias("coll"),
            fn_doc_key(F.col("s")).alias("key"),
        )
        .collect()
    )
    for r in got:
        assert (r.coll, r.key) == ref_doc_split(r.s), r.s


@SETTINGS
@given(st.lists(label_text, min_size=1, max_size=25))
def test_normalize_label_matches_case_map(spark, labels):
    got = (
        _batch(spark, labels)
        .select("s", fn_normalize_edge_label(F.col("s")).alias("n"))
        .collect()
    )
    for r in got:
        assert r.n == ref_normalize_label(r.s), r.s


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["http", "https"]),
            st.sampled_from(["purl.obolibrary.org", "x.org"]),
            st.lists(seg_text, min_size=1, max_size=4),
            st.none() | st.sampled_from(["frag", "f1"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_uri_basename_on_structured_uris(spark, specs):
    uris, want = [], []
    for scheme, host, segs, frag in specs:
        uri = f"{scheme}://{host}/" + "/".join(segs)
        if frag is not None:
            uri += f"#{frag}"
        uris.append(uri)
        want.append(ref_uri_basename(scheme, host, segs, frag))
    got = [
        r.b
        for r in _batch(spark, uris)
        .select(fn_uri_basename(F.col("s")).alias("b"))
        .collect()
    ]
    assert got == want, list(zip(uris, got, want))


@SETTINGS
@given(st.lists(st.text(max_size=20), min_size=1, max_size=25))
def test_uri_basename_total_on_arbitrary_text(spark, junk):
    """Never throws on arbitrary input; returns NULL or a non-empty string."""
    got = (
        _batch(spark, junk).select(fn_uri_basename(F.col("s")).alias("b")).collect()
    )
    for r in got:
        assert r.b is None or (isinstance(r.b, str) and r.b != "")
