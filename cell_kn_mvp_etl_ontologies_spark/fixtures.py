"""Macrophage-shaped fixture data (FIXTURES.md / SURVEY.md §5).

Reconstructed from the reference's golden test assertions
(OntologyTripleParserTest.java:38-96, OntologyGraphBuilderTest.java:363-399,
OntologyElementParserTest.java:77-191) so the ontology-specific operators can be
exercised — and oracle-checked via constant SQL — without OWL inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

OBO = "http://purl.obolibrary.org/obo/"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OIO = "http://www.geneontology.org/formats/oboInOwl#"
OWL = "http://www.w3.org/2002/07/owl#"

TRIPLES_SCHEMA = StructType(
    [
        StructField("src_file", StringType()),
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object_kind", StringType()),
        StructField("object_iri", StringType()),
        StructField("object_lexical", StringType()),
        StructField("object_lang", StringType()),
        StructField("object_datatype", StringType()),
    ]
)

_MAC = OBO + "CL_0000235"  # macrophage
_MONO = OBO + "CL_0000576"  # monocyte

# Raw (pre-flattening) statements: named-object triples plus the three
# subClassOf-restriction bnode patterns the flattener must collapse.
RAW_TRIPLES = [
    # subClassOf with named objects (OntologyTripleParserTest.java:38-55)
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "iri", OBO + "CL_0000113", None),
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "iri", OBO + "CL_0000145", None),
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "iri", OBO + "CL_0000766", None),
    # restriction 1: develops from monocyte (RO_0002202)
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "bnode", "_:b0", None),
    ("macrophage.owl", "_:b0", OWL + "onProperty", "iri", OBO + "RO_0002202", None),
    ("macrophage.owl", "_:b0", OWL + "someValuesFrom", "iri", _MONO, None),
    # restriction 2: capable of phagocytosis, engulfment (GO_0031268) (RO_0002215)
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "bnode", "_:b1", None),
    ("macrophage.owl", "_:b1", OWL + "onProperty", "iri", OBO + "RO_0002215", None),
    ("macrophage.owl", "_:b1", OWL + "someValuesFrom", "iri", OBO + "GO_0031268", None),
    # restriction 3: present in taxon Homo sapiens (RO_0002175)
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "bnode", "_:b2", None),
    ("macrophage.owl", "_:b2", OWL + "onProperty", "iri", OBO + "RO_0002175", None),
    ("macrophage.owl", "_:b2", OWL + "someValuesFrom", "iri", OBO + "NCBITaxon_9606", None),
    # incomplete restriction: only onProperty — must be dropped by the flattener
    # (OntologyTripleParser.java:109: both onProperty and someValuesFrom required)
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "bnode", "_:b3", None),
    ("macrophage.owl", "_:b3", OWL + "onProperty", "iri", OBO + "RO_0002202", None),
    # literal attributes (OntologyGraphBuilderTest.java:363-369)
    ("macrophage.owl", _MAC, RDFS + "label", "literal", None, "macrophage"),
    (
        "macrophage.owl",
        _MAC,
        OBO + "IAO_0000115",
        "literal",
        None,
        "A mononuclear phagocyte present in variety of tissues.",
    ),
    ("macrophage.owl", _MAC, RDFS + "comment", "literal", None, "Morphology: Diameter 30_M-80 _M."),
    ("macrophage.owl", _MAC, OIO + "hasDbXref", "literal", None, "ZFA:0009141"),
    ("macrophage.owl", _MAC, OIO + "hasDbXref", "literal", None, "CALOHA:TS-0587"),
    ("macrophage.owl", _MAC, OIO + "hasDbXref", "literal", None, "MESH:D008264"),
    ("macrophage.owl", _MAC, OIO + "hasDbXref", "literal", None, "FMA:83585"),
    ("macrophage.owl", _MAC, OIO + "hasDbXref", "literal", None, "BTO:0000801"),
    ("macrophage.owl", _MAC, OIO + "hasDbXref", "literal", None, "FMA:63261"),
    ("macrophage.owl", _MAC, OIO + "hasExactSynonym", "literal", None, "histiocyte"),
    ("macrophage.owl", _MAC, OIO + "id", "literal", None, "CL:0000235"),
    # monocyte label so its vertex carries attributes too
    ("macrophage.owl", _MONO, RDFS + "label", "literal", None, "monocyte"),
    # a deprecated/obsolete vertex to exercise filter_deprecated_obsolete
    ("macrophage.owl", OBO + "CL_0000999", RDFS + "label", "literal", None, "obsolete nurse cell"),
    ("macrophage.owl", OBO + "CL_0000999", OWL + "deprecated", "literal", None, "true"),
    ("macrophage.owl", OBO + "CL_0000999", RDFS + "subClassOf", "iri", _MAC, None),
    # duplicate row (exercises agg_distinct_triples)
    ("macrophage.owl", _MAC, RDFS + "subClassOf", "iri", OBO + "CL_0000113", None),
    # second file: same triple again (cross-file dedup) + a BFO subject
    # (BFO not in VALID_VERTICES -> invalid vertex, OntologyGraphBuilderTest.java:42-138)
    ("cl.owl", _MAC, RDFS + "subClassOf", "iri", OBO + "CL_0000113", None),
    ("cl.owl", OBO + "BFO_0000004", RDFS + "label", "literal", None, "independent continuant"),
    # ro.owl rows are dictionary-only and skipped by the graph build
    # (OntologyTripleParser.java:164)
    ("ro.owl", OBO + "RO_0002202", RDFS + "label", "literal", None, "develops from"),
]

TERMS_SCHEMA = StructType(
    [
        StructField("src_ontology", StringType()),
        StructField("term", StringType()),
        StructField("purl", StringType()),
        StructField("label", StringType()),
    ]
)

# ro.owl dictionary entries (OntologyElementParserTest.java:110-116;
# present-in-taxon label asserted at OntologyGraphBuilderTest.java:399).
RO_TERMS = [
    ("ro", "RO_0002202", OBO + "RO_0002202", "develops from"),
    ("ro", "RO_0002215", OBO + "RO_0002215", "capable of"),
    ("ro", "RO_0002175", OBO + "RO_0002175", "present in taxon"),
    ("ro", "RO_0002162", OBO + "RO_0002162", "in taxon"),
]


def fixture_triples(spark: SparkSession) -> DataFrame:
    # RAW_TRIPLES stays 6-wide (the golden literals carry no lang/datatype);
    # pad to the round-6 8-column triples schema
    return spark.createDataFrame(
        [r + (None, None) for r in RAW_TRIPLES], TRIPLES_SCHEMA
    )


def fixture_ro_terms(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RO_TERMS, TERMS_SCHEMA)
