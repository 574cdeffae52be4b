"""OWL/RDF-XML sources (SURVEY.md §2.1 scan_xml_elements / scan_rdf_triples).

``spark.read.format('binaryFile')`` lists and reads files distributively;
parsing runs as Arrow-batched ``mapInPandas`` stages over (path, content)
rows, one Python parse per file on the executor — the Spark-native shape of
the reference's per-file DOM/Jena loops (OntologyElementParser.java:52-184,
OntologyTripleParser.java:62-121).  rdflib/Jena are not available in this
container, so triple extraction uses a stdlib ElementTree RDF/XML reader
covering the OBO-style subset the reference consumes: typed node elements
with rdf:about, property elements with rdf:resource / literal text / nested
anonymous nodes (owl:Restriction bnodes).

Scale: parsing parallelism = number of files; each file is independent.  For
multi-GB single files, swap the per-file parse for a SAX split by top-level
element — the downstream triples schema is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
OBO_NS = "http://purl.obolibrary.org/obo/"
DC_NSS = ("http://purl.org/dc/elements/1.1/", "http://purl.org/dc/terms/")

ABOUT = f"{{{RDF_NS}}}about"
RESOURCE = f"{{{RDF_NS}}}resource"
DATATYPE = f"{{{RDF_NS}}}datatype"
NODE_ID = f"{{{RDF_NS}}}nodeID"

TRIPLES_SCHEMA = StructType(
    [
        StructField("src_file", StringType()),
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("object_kind", StringType()),
        StructField("object_iri", StringType()),
        StructField("object_lexical", StringType()),
    ]
)

TERMS_SCHEMA = StructType(
    [
        StructField("src_ontology", StringType()),
        StructField("term", StringType()),
        StructField("purl", StringType()),
        StructField("label", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("src_ontology", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("purl", StringType()),
        StructField("version_iri", StringType()),
        StructField("version_info", StringType()),
        StructField("root", StringType()),
    ]
)


def _split_tag(tag: str) -> tuple[str, str]:
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns, local
    return "", tag


def _rewrite_special(uri: str) -> str:
    """pcl/CS and ensembl/ENSG rewrites (OntologyElementParser.java:77-87)."""
    if "/pcl/CS" in uri:
        return uri.replace("/pcl/CS", "/PCLCS_", 1)
    if "/ensembl/ENSG" in uri:
        return uri.replace("/ensembl/ENSG", "/ENSG_", 1)
    return uri


def _uri_basename(uri: str) -> str | None:
    u = _rewrite_special(uri).split("#", 1)[0].split("?", 1)[0]
    if "://" in u:
        rest = u.split("://", 1)[1]
        if "/" not in rest:
            return None
        path = rest.split("/", 1)[1]
    elif "/" in u and ":" not in u.split("/", 1)[0]:
        path = u  # relative hierarchical URI
    else:
        return None  # opaque URI: no path component
    segs = [s for s in path.split("/") if s]
    return segs[-1] if segs else None


def _file_stem(path: str) -> str:
    name = path.rstrip("/").rsplit("/", 1)[-1]
    return name.rsplit(".", 1)[0] if "." in name else name


def _file_name(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]


# ---------------------------------------------------------------------------
# scan_xml_elements — term dictionary + per-file metadata
# ---------------------------------------------------------------------------
def _parse_elements(content: bytes) -> tuple[list[tuple[str, str, str]], dict]:
    """All owl:* elements with non-empty rdf:about and ≥1 rdfs:label
    descendant → (term, purl, label); plus file-level metadata.
    Ref: OntologyElementParser.java:97-184."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    terms: list[tuple[str, str, str]] = []
    meta = {
        "title": None,
        "description": None,
        "purl": None,
        "version_iri": None,
        "version_info": None,
        "root": None,
    }
    for elem in root.iter():
        ns, local = _split_tag(elem.tag)
        if meta["title"] is None and ns in DC_NSS and local == "title":
            meta["title"] = (elem.text or "").strip() or None
        if meta["description"] is None and ns in DC_NSS and local == "description":
            meta["description"] = (elem.text or "").strip() or None
        if ns == OWL_NS and local == "Ontology" and meta["purl"] is None:
            meta["purl"] = elem.get(ABOUT)
            for child in elem.iter():
                cns, clocal = _split_tag(child.tag)
                if cns == OWL_NS and clocal == "versionIRI" and meta["version_iri"] is None:
                    meta["version_iri"] = child.get(RESOURCE)
                if cns == OWL_NS and clocal == "versionInfo" and meta["version_info"] is None:
                    meta["version_info"] = (child.text or "").strip() or None
        if ns == OBO_NS and local == "IAO_0000700" and meta["root"] is None:
            meta["root"] = elem.get(RESOURCE)
        if ns != OWL_NS:
            continue
        about = elem.get(ABOUT, "")
        if not about:
            continue
        term = _uri_basename(about)
        if term is None:
            continue
        label = None
        for child in elem.iter():
            cns, clocal = _split_tag(child.tag)
            if cns == RDFS_NS and clocal == "label":
                label = child.text or ""
                break
        if label is not None:
            terms.append((term, _rewrite_special(about), label))
    return terms, meta


def scan_xml_elements(spark: SparkSession, path: str, glob: str = "*.owl") -> DataFrame:
    """Term-dictionary scan: (src_ontology, term, purl, label)."""
    files = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                stem = _file_stem(p)
                for term, purl, label in _parse_elements(bytes(content))[0]:
                    out.append((stem, term, purl, label))
            yield pd.DataFrame(out, columns=["src_ontology", "term", "purl", "label"])

    return files.select("path", "content").mapInPandas(run, TERMS_SCHEMA)


def scan_ontology_meta(spark: SparkSession, path: str, glob: str = "*.owl") -> DataFrame:
    """Per-file ontology metadata (FIXTURES.md §3)."""
    files = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                meta = _parse_elements(bytes(content))[1]
                out.append(
                    (
                        _file_stem(p),
                        meta["title"],
                        meta["description"],
                        meta["purl"],
                        meta["version_iri"],
                        meta["version_info"],
                        meta["root"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "src_ontology", "title", "description", "purl",
                    "version_iri", "version_info", "root",
                ],
            )

    return files.select("path", "content").mapInPandas(run, META_SCHEMA)


# ---------------------------------------------------------------------------
# scan_rdf_triples — raw triple extraction (bnodes preserved)
# ---------------------------------------------------------------------------
def _parse_triples(src_file: str, content: bytes) -> list[tuple]:
    """RDF/XML subset reader: typed node elements with rdf:about; property
    children as rdf:resource refs, literals, or nested anonymous nodes
    (emitted as file-local bnodes, recursively).  Mirrors what Jena yields
    for OBO-style OWL (OntologyTripleParser.java:62-121)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    triples: list[tuple] = []
    counter = [0]

    def new_bnode() -> str:
        counter[0] += 1
        return f"_:b{counter[0] - 1}"

    def emit(subject: str, elem) -> None:
        # elem is a typed node element; its children are property elements
        for prop in list(elem):
            pns, plocal = _split_tag(prop.tag)
            pred = pns + plocal
            resource = prop.get(RESOURCE)
            node_id = prop.get(NODE_ID)
            children = list(prop)
            if resource is not None:
                triples.append((src_file, subject, pred, "iri", resource, None))
            elif node_id is not None:
                triples.append((src_file, subject, pred, "bnode", f"_:{node_id}", None))
            elif children:
                # nested node element (an RDF/XML property element has at
                # most one node child); anonymous -> file-local bnode
                child = children[0]
                cns, clocal = _split_tag(child.tag)
                about = child.get(ABOUT)
                if about:
                    node = about
                    triples.append((src_file, subject, pred, "iri", about, None))
                else:
                    node = new_bnode()
                    triples.append((src_file, subject, pred, "bnode", node, None))
                triples.append((src_file, node, RDF_NS + "type", "iri", cns + clocal, None))
                emit(node, child)
            else:
                triples.append((src_file, subject, pred, "literal", None, prop.text or ""))

    for elem in list(root):
        ns, local = _split_tag(elem.tag)
        about = elem.get(ABOUT)
        if about is None:
            continue
        subject = about
        # rdf:type from the element tag itself (owl:Class, owl:Ontology, ...)
        triples.append((src_file, subject, RDF_NS + "type", "iri", ns + local, None))
        emit(subject, elem)
    return triples


def scan_rdf_triples(
    spark: SparkSession, path: str, glob: str = "*.owl", on_error: str = "fail"
) -> DataFrame:
    """Raw triples scan in the long triples schema (bnodes preserved for the
    downstream flattening join).

    ``on_error``: 'fail' aborts on a malformed file (reference-faithful —
    Jena throws, OntologyTripleParser.java:68-69); 'skip' drops the file and
    keeps the job alive — the right posture for web-scale corpora where a
    single corrupt input must not kill a 1000-executor run.
    """
    assert on_error in ("fail", "skip")
    files = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows: list[tuple] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.extend(_parse_triples(_file_name(p), bytes(content)))
                except ET.ParseError:
                    if on_error == "fail":
                        raise
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_file", "subject", "predicate",
                    "object_kind", "object_iri", "object_lexical",
                ],
            )

    return files.select("path", "content").mapInPandas(run, TRIPLES_SCHEMA)
