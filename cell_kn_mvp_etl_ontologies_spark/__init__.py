"""cell_kn_mvp_etl_ontologies_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of NIH-NLM/cell-kn-mvp-etl-ontologies.

The reference is a single-threaded Java batch ETL (OWL ontologies → RDF triples →
property graph → ArangoDB).  This engine re-expresses every behavior as lazy,
declarative Spark DataFrame plans so Catalyst/Tungsten/AQE pick the physical
strategy, and the same code scales from local[32] to a 1000-executor cluster.

Layout:
  constants    — namespace whitelists, valid-vertex list, OBO PURLs
  functions/   — pure Column expression library (SURVEY.md §2.8)
  operators/   — DataFrame -> DataFrame relational operators (§2.2-2.7, §2.12)
  sources/     — OWL/XML/RDF scans, directory listing, HTTP versioned ingest (§2.1)
  sinks/       — parquet graph store, JSONL export, side outputs, upsert (§2.1)
  plans/       — composed pipelines: triples → vertices/edges, two-pass driver (§2.10)
  search/      — n-gram / edge-n-gram analyzers + inverted index (§2.9)
  streaming/   — Structured Streaming variants of append-compatible operators (§2.11)
"""

__version__ = "0.1.0"
