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


# ---------------------------------------------------------------------------
# RDF/XML split-parse property: split == whole for generated documents
# ---------------------------------------------------------------------------
_nmtoken = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


@st.composite
def _rdf_documents(draw):
    """Random RDF/XML documents over the constructs the parser supports:
    literals, resource refs, nodeID refs, nested named/anonymous nodes,
    parseType Resource/Collection/Literal, rdf:ID — nested up to 3 levels."""

    def node_element(depth: int) -> str:
        tag = draw(st.sampled_from(["owl:Class", "owl:Restriction", "rdf:Description"]))
        naming = draw(st.sampled_from(["about", "id", "anon"]))
        attr = ""
        if naming == "about":
            attr = f' rdf:about="http://x/{draw(_nmtoken)}"'
        elif naming == "id":
            attr = f' rdf:ID="{draw(_nmtoken)}"'
        n_props = draw(st.integers(0, 2 if depth < 2 else 0))
        props = "".join(prop_element(depth + 1) for _ in range(n_props))
        return f"<{tag}{attr}>{props}</{tag}>"

    def prop_element(depth: int) -> str:
        kind = draw(
            st.sampled_from(
                ["literal", "resource", "nodeid", "nested", "ptres", "ptcoll", "ptlit"]
            )
        )
        if kind == "literal":
            return f"<rdfs:label>{draw(_nmtoken)}</rdfs:label>"
        if kind == "resource":
            return f'<rdfs:seeAlso rdf:resource="http://y/{draw(_nmtoken)}"/>'
        if kind == "nodeid":
            return f'<rdfs:seeAlso rdf:nodeID="n{draw(_nmtoken)}"/>'
        if kind == "nested":
            return f"<rdfs:subClassOf>{node_element(depth + 1)}</rdfs:subClassOf>"
        if kind == "ptres":
            inner = "".join(prop_element(depth + 1) for _ in range(draw(st.integers(0, 2))))
            return f'<obo:meta rdf:parseType="Resource">{inner}</obo:meta>'
        if kind == "ptcoll":
            members = "".join(node_element(depth + 1) for _ in range(draw(st.integers(0, 3))))
            return f'<owl:unionOf rdf:parseType="Collection">{members}</owl:unionOf>'
        return f'<rdfs:comment rdf:parseType="Literal">x<b>{draw(_nmtoken)}</b></rdfs:comment>'

    n_top = draw(st.integers(1, 6))
    body = "\n  ".join(node_element(0) for _ in range(n_top))
    return (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xml:base="http://example.org/b"'
        ' xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"'
        ' xmlns:owl="http://www.w3.org/2002/07/owl#"'
        ' xmlns:obo="http://purl.obolibrary.org/obo/">\n'
        f"  {body}\n"
        "</rdf:RDF>\n"
    )


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(doc=_rdf_documents(), split_bytes=st.sampled_from([64, 200, 700, 10**6]))
def test_split_parse_equals_whole_parse_on_generated_docs(doc, split_bytes):
    """For any generated document and any fragment size, reassembled
    fragment parses (seeded bnode counters) must equal the whole-file parse
    bit-for-bit — the invariant the driver's scan_rdf_triples_split gate
    checks on fixtures, here over the full construct space.  Pure-Python
    (no Spark), so hypothesis can afford real example counts."""
    import xml.etree.ElementTree as ET

    from cell_kn_mvp_etl_ontologies_spark.sources.owl import (
        _emit_from_root,
        _index_top_level,
        _parse_triples,
        _plan_fragments,
    )

    data = doc.encode()
    whole = _parse_triples("t.owl", data)
    starts, header_end, footer_start = _index_top_level(data)
    frags = _plan_fragments(starts, footer_start, split_bytes)
    rows = []
    for a, b, bn in frags:
        frag_doc = data[:header_end] + data[a:b] + data[footer_start:]
        rows.extend(_emit_from_root("t.owl", ET.fromstring(frag_doc), bn))
    assert sorted(map(str, rows)) == sorted(map(str, whole))
