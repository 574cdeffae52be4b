"""Engine constants mirroring the reference's static configuration.

Citations refer to the read-only reference at /root/reference.
"""

# Ontology IDs whose terms become graph vertices.
# Ref: OntologyGraphBuilder.java:45-64 (validVertices).
VALID_VERTICES = [
    "BGS",
    "BMC",
    "CHEBI",
    "CHEMBL",
    "CL",
    "CS",
    "CSD",
    "GO",
    "GS",
    "HP",
    "HsapDv",
    "MONDO",
    "NCBITaxon",
    "NCT",
    "Orphanet",
    "PATO",
    "PR",
    "PUB",
    "RS",
    "UBERON",
]

# Predicate namespaces kept when collecting triples.
# Ref: OntologyTripleParser.java:37-40 (predicateNameSpaces).
PREDICATE_NAMESPACES = [
    "http://www.w3.org/2000/01/rdf-schema#",
    "http://purl.obolibrary.org/obo/",
    "http://purl.org/dc/",
    "http://www.geneontology.org/formats/oboInOwl#",
]

# Well-known RDF/OWL IRIs used by the flattening and root-namespace logic.
RDFS_SUBCLASS_OF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
OWL_ON_PROPERTY = "http://www.w3.org/2002/07/owl#onProperty"
OWL_SOME_VALUES_FROM = "http://www.w3.org/2002/07/owl#someValuesFrom"
IAO_ROOT_TERM = "http://purl.obolibrary.org/obo/IAO_0000700"

# OBO Foundry PURLs downloaded by the acquisition step.
# Ref: OntologyDownloader.java:25-33 (OBO_PURLS).
OBO_PURLS = [
    "http://purl.obolibrary.org/obo/cl.owl",
    "http://purl.obolibrary.org/obo/ro.owl",
    "http://purl.obolibrary.org/obo/go.owl",
    "http://purl.obolibrary.org/obo/uberon/uberon-base.owl",
    "http://purl.obolibrary.org/obo/ncbitaxon/subsets/taxslim.owl",
    "http://purl.obolibrary.org/obo/mondo/mondo-simple.owl",
    "http://purl.obolibrary.org/obo/hp.owl",
    "http://purl.obolibrary.org/obo/pato.owl",
    "http://purl.obolibrary.org/obo/hsapdv.owl",
]

# Edge-label special cases. Ref: OntologyGraphBuilder.java:309-326.
EDGE_LABEL_MAP = {
    "subClassOf": "SUB_CLASS_OF",
    "disjointWith": "DISJOINT_WITH",
    "crossSpeciesExactMatch": "CROSS_SPECIES_EXACT_MATCH",
    "exactMatch": "EXACT_MATCH",
    "equivalentClass": "EQUIVALENT_CLASS",
    "seeAlso": "SEE_ALSO",
}

# Edge-source special cases. Ref: OntologyGraphBuilder.java:287-300.
EDGE_SOURCE_MAP = {
    "mondo-simple": "MONDO",
    "taxslim": "NCBITAXON",
    "go-plus": "GO",
    "uberon-base": "UBERON",
}

# File excluded from the triple-collection pass (dictionary-only).
# Ref: OntologyTripleParser.java:164.
DICTIONARY_ONLY_FILE = "ro.owl"

# Object-kind tags for the long triples schema (replaces Jena's node-type union).
KIND_IRI = "iri"
KIND_LITERAL = "literal"
KIND_BNODE = "bnode"
