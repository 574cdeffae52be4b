"""URI / term dissection expression library (SURVEY.md §2.8).

Every function here is a pure ``Column -> Column`` expression built entirely
from JVM-side ``pyspark.sql.functions`` — no UDFs — so all of it stays inside
whole-stage codegen and is usable in both batch and streaming plans.

Semantics match the reference's ``java.net.URI``-based dissection:
  - OntologyGraphBuilder.java:72-102  (createVTuple)
  - OntologyGraphBuilder.java:105-131 (parsePredicate)
  - OntologyElementParser.java:77-87  (createURI special rewrites)
  - OntologyGraphBuilder.java:415-436 (document id helpers)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import VALID_VERTICES

# Matches an absolute hierarchical URI and captures its path component
# (what java.net.URI.getPath() returns for http(s)-style URIs).
_URI_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(/[^?#]*)"


def fn_uri_rewrite_special(uri: Column) -> Column:
    """Rewrite provisional-cell-ontology URIs before parsing.

    ``/pcl/CS`` -> ``/PCLCS_`` and ``/ensembl/ENSG`` -> ``/ENSG_`` (first
    occurrence only).  Ref: OntologyElementParser.java:41-44,77-87.
    """
    # regexp_replace replaces every occurrence; these markers appear at most
    # once in real OBO URIs, and first-occurrence semantics for repeated
    # markers are preserved by anchoring on the non-greedy prefix.
    uri = F.regexp_replace(uri, r"^(.*?)/pcl/CS", r"$1/PCLCS_")
    uri = F.regexp_replace(uri, r"^(.*?)/ensembl/ENSG", r"$1/ENSG_")
    return uri


def fn_uri_strip_fragment(uri: Column) -> Column:
    """Drop a ``#fragment`` suffix if present."""
    return F.substring_index(uri, "#", 1)


def fn_uri_path(uri: Column) -> Column:
    """The path component of an absolute hierarchical URI, else NULL.

    Mirrors ``java.net.URI.getPath()`` for the ``scheme://authority/path``
    shape the reference consumes; opaque URIs (no ``//``) yield NULL.
    """
    return F.nullif(F.regexp_extract(fn_uri_strip_fragment(uri), _URI_PATH_RE, 1), F.lit(""))


def fn_uri_basename(uri: Column) -> Column:
    """Last path segment of a URI (``.../obo/CL_0000235`` -> ``CL_0000235``).

    NULL when the URI has no path or the path has no final segment.
    Ref: OntologyGraphBuilder.java:81-85; OntologyElementParser.java:111.
    """
    path = fn_uri_path(uri)
    # Paths.get(path).getFileName(): strip trailing slashes, take last segment.
    trimmed = F.regexp_replace(path, r"/+$", "")
    return F.nullif(F.substring_index(trimmed, "/", -1), F.lit(""))


def fn_uri_fragment(uri: Column) -> Column:
    """Fragment after ``#`` (``...rdf-schema#subClassOf`` -> ``subClassOf``),
    NULL when there is no fragment.  Ref: OntologyGraphBuilder.java:115."""
    return F.when(uri.contains("#"), F.substring_index(uri, "#", -1))


def fn_pred_last_path(uri: Column) -> Column:
    """Substring after the last ``/`` of the URI path (used for predicates
    without a fragment).  Ref: OntologyGraphBuilder.java:117-119."""
    return F.substring_index(fn_uri_path(uri), "/", -1)


# Exactly-2-token split patterns mirroring Java String.split semantics (which
# drops trailing empty tokens): the first token may be empty, the second must
# be non-empty, trailing separators are ignored.  A single regexp_extract per
# field keeps the Catalyst expression *tree* small — Columns are trees, not
# DAGs, so nested reuse duplicates subtrees multiplicatively and previously
# overflowed the JVM's 64 KB codegen method limit (whole stage fell back to
# interpreted execution).
_SPLIT_US_RE = r"^([^_]*)_([^_]+)_*$"
_SPLIT_COLON_RE = r"^([^:]*):([^:]+):*$"


def _term_token(term: Column, group: int) -> Column:
    return F.when(term.contains("_"), F.regexp_extract(term, _SPLIT_US_RE, group)).when(
        term.contains(":"), F.regexp_extract(term, _SPLIT_COLON_RE, group)
    )


def fn_term_split(term: Column) -> Column:
    """Split a term on ``_`` (else ``:``) into a struct (id, number); NULL
    fields unless the split yields exactly 2 tokens.
    Ref: OntologyGraphBuilder.java:86-99."""
    number = F.nullif(_term_token(term, 2), F.lit(""))
    ident = F.when(number.isNotNull(), _term_token(term, 1))
    return F.struct(ident.alias("id"), number.alias("number"))


def vtuple_raw_term(node_uri: Column, is_uri: Column | None = None) -> Column:
    """Step 1 of the staged VTuple parse: the raw last-path-segment term."""
    term = fn_uri_basename(fn_uri_rewrite_special(node_uri))
    return F.when(is_uri, term) if is_uri is not None else term


def vtuple_raw_number(term: Column) -> Column:
    """Step 2: the number token, NULL unless the 2-token split matches."""
    return F.nullif(_term_token(term, 2), F.lit(""))


def vtuple_raw_id(term: Column) -> Column:
    """Step 2b: the id token ('' allowed, e.g. for terms like ``_A``)."""
    return _term_token(term, 1)


def vtuple_valid(raw_id: Column, raw_number: Column) -> Column:
    """Step 3: validity = split matched AND id in the 20-element whitelist."""
    return F.coalesce(raw_number.isNotNull() & raw_id.isin(VALID_VERTICES), F.lit(False))


def vtuple_columns(node_uri: Column, is_uri: Column | None = None) -> dict[str, Column]:
    """The four VTuple fields as separate Column expressions.

    Prefer this over ``fn_vtuple`` inside plans: selecting individual fields
    avoids materializing the full struct expression per field reference.
    """
    term = vtuple_raw_term(node_uri, is_uri)
    # number != '' distinguishes "matched with empty id" from "no match":
    # the second capture group is non-empty whenever the pattern matches.
    number = vtuple_raw_number(term)
    matched = number.isNotNull()
    ident = vtuple_raw_id(term)
    return {
        "term": F.when(matched, term),
        "id": F.when(matched, ident),
        "number": number,
        "is_valid_vertex": vtuple_valid(ident, number),
    }


def fn_vtuple(node_uri: Column, is_uri: Column | None = None) -> Column:
    """Parse a node into the VTuple struct (term, id, number, is_valid_vertex).

    Pure-Column re-expression of ``createVTuple``:
      1. special URI rewrites (pcl/CS, ensembl/ENSG)
      2. term = last segment of the URI path (NULL for non-hierarchical URIs)
      3. (id, number) = 2-token split on ``_`` else ``:``
      4. is_valid_vertex = id ∈ VALID_VERTICES
    Non-URI nodes (literals, bnodes) are invalid, as are terms whose split is
    not exactly 2 tokens — in that case ALL fields are NULL (the reference
    discards the parsed term on the early-return path,
    OntologyGraphBuilder.java:86-99,629-631).
    """
    cols = vtuple_columns(node_uri, is_uri)
    return F.struct(*[expr.alias(name) for name, expr in cols.items()])


def fn_predicate_label(pred_uri: Column) -> Column:
    """Predicate label before dictionary lookup: the ``#fragment`` if present,
    else the last path segment.  The ro-dictionary mapping of that token to a
    human label is a broadcast join (operators.joins.join_ro_label_lookup),
    not a scalar function.  Ref: OntologyGraphBuilder.java:105-131."""
    rewritten = fn_uri_rewrite_special(pred_uri)
    return F.coalesce(fn_uri_fragment(rewritten), fn_pred_last_path(rewritten))


def fn_doc_collection_name(doc_id: Column) -> Column:
    """Prefix of a document id before the first ``/``; NULL without ``/``.
    Ref: OntologyGraphBuilder.java:415-421."""
    return F.when(doc_id.contains("/"), F.substring_index(doc_id, "/", 1))


def fn_doc_key(doc_id: Column) -> Column:
    """Suffix of a document id after the first ``/``; NULL without ``/``.
    Ref: OntologyGraphBuilder.java:430-436."""
    return F.when(doc_id.contains("/"), doc_id.substr(F.instr(doc_id, "/") + 1, F.length(doc_id)))


def fn_make_vertex_id(ident: Column, number: Column) -> Column:
    """Compose the ``{id}/{number}`` vertex document id (``_from``/``_to``).
    Ref: OntologyGraphBuilder.java:387-389."""
    return F.concat_ws("/", ident, number)


def fn_make_edge_key(from_number: Column, to_number: Column) -> Column:
    """Compose the ``{fromNum}-{toNum}`` edge key.
    Ref: OntologyGraphBuilder.java:382."""
    return F.concat_ws("-", from_number, to_number)
