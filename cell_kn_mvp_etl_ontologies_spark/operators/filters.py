"""Projection / filter operators over the long triples schema (SURVEY.md §2.2).

All are narrow, pushdown-friendly ``DataFrame -> DataFrame`` transforms: plain
``filter`` on Column predicates, so Catalyst pushes them into the parquet scan
(PushedFilters) and partition-prunes when the store is partitioned by
``src_file``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import DICTIONARY_ONLY_FILE, KIND_IRI, KIND_LITERAL, PREDICATE_NAMESPACES, VALID_VERTICES
from ..functions.uri import vtuple_raw_id, vtuple_raw_number, vtuple_raw_term, vtuple_valid


def filter_root_ns_class(triples: DataFrame, root_ns: str | Column) -> DataFrame:
    """Keep triples whose subject starts with the file's root namespace.
    Ref: OntologyTripleParser.java:74-77."""
    return triples.filter(F.col("subject").startswith(root_ns))


def filter_predicate_ns_whitelist(triples: DataFrame) -> DataFrame:
    """Keep triples whose predicate starts with any whitelisted namespace —
    OR-of-StartsWith, folded by Catalyst.  Ref: OntologyTripleParser.java:37-40,82."""
    pred = F.col("predicate")
    cond = None
    for ns in PREDICATE_NAMESPACES:
        c = pred.startswith(ns)
        cond = c if cond is None else (cond | c)
    return triples.filter(cond)


def valid_triple_predicate(root_ns: str | Column, test_object: bool) -> Column:
    """``subject CONTAINS rootNS AND (NOT testObject OR object is not URI OR
    object CONTAINS rootNS)``.  Ref: OntologyTripleParser.java:42-49."""
    subject_ok = F.col("subject").contains(root_ns)
    if not test_object:
        return subject_ok
    object_is_named = F.col("object_kind") == KIND_IRI
    object_ok = F.coalesce(F.col("object_iri").contains(root_ns), F.lit(False))
    return subject_ok & (~object_is_named | object_ok)


def filter_valid_triple(triples: DataFrame, root_ns: str | Column, test_object: bool = False) -> DataFrame:
    return triples.filter(valid_triple_predicate(root_ns, test_object))


def filter_object_is_literal(triples: DataFrame) -> DataFrame:
    """Keep triples carrying a literal object (vertex attribute updates).
    Ref: OntologyGraphBuilder.java:205-208."""
    return triples.filter(F.col("object_kind") == KIND_LITERAL)


def filter_isin_valid_vertices(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Vertex identity valid iff ontology ID ∈ the 20-element whitelist —
    a broadcast-folded ``In`` predicate.  Ref: OntologyGraphBuilder.java:45-64,100."""
    return df.filter(F.col(id_col).isin(VALID_VERTICES))


def deprecated_obsolete_predicate(attrs_col: str = "attrs") -> Column:
    """True for vertices with ``deprecated`` containing 'true' or ``label``
    containing 'obsolete' (null-safe).  Ref: OntologyGraphBuilder.java:255-261.

    ``attrs`` is the MAP<STRING, ARRAY<STRING>> attribute column; the reference
    checks the stringified scalar, our array form checks any element.
    """
    attrs = F.col(attrs_col)
    dep = F.exists(
        F.coalesce(attrs.getItem("deprecated"), F.array()), lambda v: v.contains("true")
    )
    obs = F.exists(
        F.coalesce(attrs.getItem("label"), F.array()), lambda v: v.contains("obsolete")
    )
    return dep | obs


def filter_deprecated_obsolete(vertices: DataFrame, attrs_col: str = "attrs") -> DataFrame:
    """Drop deprecated/obsolete vertices (the kept side of the split; the
    dropped side goes to the deprecated-terms side output)."""
    return vertices.filter(~deprecated_obsolete_predicate(attrs_col))


def filter_skip_file(triples: DataFrame, file_name: str = DICTIONARY_ONLY_FILE) -> DataFrame:
    """Skip the dictionary-only file (partition-pruned when partitioned by
    src_file).  Ref: OntologyTripleParser.java:164."""
    return triples.filter(F.col("src_file") != file_name)


def project_triple_nodes(triples: DataFrame) -> DataFrame:
    """Explode each triple into its subject and object nodes for vertex
    construction.  Emits (node_uri, is_uri); literal/bnode objects carry
    is_uri=false so the vtuple parse marks them invalid.
    Ref: OntologyGraphBuilder.java:158-159."""
    nodes = F.array(
        F.struct(F.col("subject").alias("node_uri"), F.lit(True).alias("is_uri")),
        F.struct(
            F.coalesce(F.col("object_iri"), F.col("object_lexical")).alias("node_uri"),
            (F.col("object_kind") == KIND_IRI).alias("is_uri"),
        ),
    )
    return triples.select(F.explode(nodes).alias("node")).select("node.*")


def with_vtuple(df: DataFrame, uri_col: str, prefix: str, is_uri: Column | None = None) -> DataFrame:
    """Attach flattened VTuple columns {prefix}term/{prefix}id/{prefix}number/
    {prefix}valid parsed from ``uri_col``.

    Built as a SEQUENCE of withColumn steps so each intermediate (raw term,
    raw tokens) is a materialized alias referenced multiple times —
    CollapseProject keeps those as separate Projects instead of inlining
    (expensive, multiply-referenced expressions are not collapsed), which
    keeps the Catalyst expression *tree* linear.  Building the whole parse as
    one nested Column previously duplicated the regex chain ~30× per stage
    and overflowed the JVM's 64 KB codegen method limit.
    """
    return (
        df.withColumn("_vt_term", vtuple_raw_term(F.col(uri_col), is_uri))
        .withColumn("_vt_number", vtuple_raw_number(F.col("_vt_term")))
        .withColumn("_vt_id", vtuple_raw_id(F.col("_vt_term")))
        .withColumn(prefix + "term", F.when(F.col("_vt_number").isNotNull(), F.col("_vt_term")))
        .withColumn(prefix + "id", F.when(F.col("_vt_number").isNotNull(), F.col("_vt_id")))
        .withColumn(prefix + "number", F.col("_vt_number"))
        .withColumn(prefix + "valid", vtuple_valid(F.col("_vt_id"), F.col("_vt_number")))
        .drop("_vt_term", "_vt_number", "_vt_id")
    )


def label_lang_preferred(
    triples: DataFrame,
    label_predicate: str,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Per-subject preferred label with language fallback (round 6 — the
    query the ``object_lang`` column exists to answer): for each subject
    carrying ``label_predicate`` literals, keep ONE label by priority
    (a) the first language in ``langs``, then the next, ...; (b) an
    untagged literal; (c) any remaining tag — ties broken (lexical ASC,
    lang ASC NULLS FIRST) so the pick is deterministic cross-engine.

    Jena consumers do exactly this scan over ``getLiteralLanguage()``;
    the reference sidesteps it only because its OBO inputs are untagged
    (OntologyGraphBuilder.java:206-218 stringifies).  One window over one
    keyed shuffle on subject; at 100 TB this is label-cardinality work.

    Output: (subject, label, lang, src) where src is the priority bucket
    ('lang:<tag>', 'untagged', 'other')."""
    from pyspark.sql import Window

    labels = triples.filter(
        (F.col("predicate") == label_predicate) & (F.col("object_kind") == KIND_LITERAL)
    ).select("subject", F.col("object_lexical").alias("label"), F.col("object_lang").alias("lang"))
    prio = F.lit(len(langs) + 1)
    for i in range(len(langs) - 1, -1, -1):
        prio = F.when(F.col("lang") == langs[i], F.lit(i)).otherwise(prio)
    prio = F.when(F.col("lang").isNull(), F.lit(len(langs))).otherwise(prio)
    w = Window.partitionBy("subject").orderBy(
        prio.asc(), F.col("label").asc(), F.col("lang").asc_nulls_first()
    )
    ranked = labels.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    src = (
        F.when(prio < len(langs), F.concat(F.lit("lang:"), F.col("lang")))
        .when(F.col("lang").isNull(), F.lit("untagged"))
        .otherwise(F.lit("other"))
    )
    return ranked.select("subject", "label", "lang", src.alias("src"))
