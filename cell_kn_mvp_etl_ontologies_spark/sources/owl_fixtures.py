"""Fixture OWL/RDF-XML documents reconstructing the reference's test data
(src/test/data/obo/ — absent from the snapshot; content rebuilt from the
golden assertions in OntologyTripleParserTest.java:38-147,
OntologyElementParserTest.java:77-191, OntologyDownloaderTest.java:18-44)."""

MACROPHAGE_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://purl.obolibrary.org/obo/"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#"
         xmlns:dc="http://purl.org/dc/elements/1.1/">
  <owl:Ontology rdf:about="http://purl.obolibrary.org/obo/cl.owl">
    <owl:versionIRI rdf:resource="http://purl.obolibrary.org/obo/cl/releases/2024-09-26/cl.owl"/>
    <obo:IAO_0000700 rdf:resource="http://purl.obolibrary.org/obo/CL_0000000"/>
  </owl:Ontology>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/CL_0000235">
    <rdfs:label xml:lang="en">macrophage</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/CL_0000113"/>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/CL_0000145"/>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/CL_0000766"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/RO_0002202"/>
        <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/CL_0000576"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/RO_0002215"/>
        <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/GO_0031268"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://purl.obolibrary.org/obo/RO_0002175"/>
        <owl:someValuesFrom rdf:resource="http://purl.obolibrary.org/obo/NCBITaxon_9606"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <obo:IAO_0000115>A mononuclear phagocyte present in variety of tissues.</obo:IAO_0000115>
    <rdfs:comment>Morphology: Diameter 30_M-80 _M.</rdfs:comment>
    <oboInOwl:hasDbXref>ZFA:0009141</oboInOwl:hasDbXref>
    <oboInOwl:hasDbXref>CALOHA:TS-0587</oboInOwl:hasDbXref>
    <oboInOwl:hasDbXref>MESH:D008264</oboInOwl:hasDbXref>
    <oboInOwl:hasDbXref>FMA:83585</oboInOwl:hasDbXref>
    <oboInOwl:hasDbXref>BTO:0000801</oboInOwl:hasDbXref>
    <oboInOwl:hasDbXref>FMA:63261</oboInOwl:hasDbXref>
    <oboInOwl:hasExactSynonym>histiocyte</oboInOwl:hasExactSynonym>
    <oboInOwl:id>CL:0000235</oboInOwl:id>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/CL_0000576">
    <rdfs:label>monocyte</rdfs:label>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/CL_0000999">
    <rdfs:label>obsolete nurse cell</rdfs:label>
    <owl:deprecated rdf:datatype="http://www.w3.org/2001/XMLSchema#boolean">true</owl:deprecated>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/CL_0000235"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/BFO_0000004">
    <rdfs:label>independent continuant</rdfs:label>
  </owl:Class>
</rdf:RDF>
"""

RO_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Ontology rdf:about="http://purl.obolibrary.org/obo/ro.owl">
    <owl:versionIRI rdf:resource="http://purl.obolibrary.org/obo/ro/releases/2024-04-24/ro.owl"/>
  </owl:Ontology>
  <owl:ObjectProperty rdf:about="http://purl.obolibrary.org/obo/RO_0002202">
    <rdfs:label>develops from</rdfs:label>
  </owl:ObjectProperty>
  <owl:ObjectProperty rdf:about="http://purl.obolibrary.org/obo/RO_0002215">
    <rdfs:label>capable of</rdfs:label>
  </owl:ObjectProperty>
  <owl:ObjectProperty rdf:about="http://purl.obolibrary.org/obo/RO_0002175">
    <rdfs:label>present in taxon</rdfs:label>
  </owl:ObjectProperty>
  <owl:ObjectProperty rdf:about="http://purl.obolibrary.org/obo/RO_0002162">
    <rdfs:label>in taxon</rdfs:label>
  </owl:ObjectProperty>
</rdf:RDF>
"""

VERSION_INFO_TEST_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Ontology rdf:about="http://example.org/version-info-test.owl">
    <owl:versionInfo>2024-01-15</owl:versionInfo>
    <owl:versionIRI rdf:resource="http://example.org/releases/2023-12-01/version-info-test.owl"/>
  </owl:Ontology>
</rdf:RDF>
"""

NO_VERSION_TEST_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Ontology rdf:about="http://example.org/no-version-test.owl"/>
</rdf:RDF>
"""

NO_IAO_TEST_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Ontology rdf:about="http://example.org/no-IAO_0000700-test.owl"/>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/XAO_0000001">
    <rdfs:label>anatomical entity</rdfs:label>
  </owl:Class>
</rdf:RDF>
"""

FIXTURE_FILES = {
    "macrophage.owl": MACROPHAGE_OWL,
    "ro.owl": RO_OWL,
    "version-info-test.owl": VERSION_INFO_TEST_OWL,
    "no-version-test.owl": NO_VERSION_TEST_OWL,
    "no-IAO_0000700-test.owl": NO_IAO_TEST_OWL,
}


def write_fixture_dir(path: str) -> str:
    import os

    os.makedirs(path, exist_ok=True)
    for name, content in FIXTURE_FILES.items():
        with open(os.path.join(path, name), "w") as f:
            f.write(content)
    return path
