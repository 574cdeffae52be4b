"""Parquet property-graph store (SURVEY.md §2.1 sink_graph_upsert).

Layout: ``{root}/{database}/{graph}/vertices`` partitioned by collection and
``.../edges`` partitioned by (from_collection, to_collection) — partition
values ARE the reference's dynamic collection DDL
(ArangoDbUtilities.java:80-212): a new ontology id simply materializes as a
new partition directory, no runtime DDL.

Upsert replaces the reference's one-HTTP-round-trip-per-document
exists/insert/update loop (OntologyGraphBuilder.java:254-273,463-479) with a
single distributed MERGE join.  The reference drops and recreates its
databases at the start of every run (OntologyGraphBuilder.java:511-517), so
mode='overwrite' reproduces its semantics; ``upsert_parquet`` covers the
incremental path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_state_parquet, replace_parquet_dir
from ..operators.joins import join_upsert


def _vertices_path(root: str, database: str, graph: str) -> str:
    return f"{root}/{database}/{graph}/vertices"


def _edges_path(root: str, database: str, graph: str) -> str:
    return f"{root}/{database}/{graph}/edges"


def write_graph(
    vertices: DataFrame,
    edges: DataFrame,
    root: str,
    database: str,
    graph: str,
    mode: str = "overwrite",
) -> None:
    vertices.write.mode(mode).partitionBy("collection").parquet(
        _vertices_path(root, database, graph)
    )
    edges.write.mode(mode).partitionBy("from_collection", "to_collection").parquet(
        _edges_path(root, database, graph)
    )


def read_graph_vertices(spark: SparkSession, root: str, database: str, graph: str) -> DataFrame:
    return spark.read.parquet(_vertices_path(root, database, graph))


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """MERGE-style upsert into a parquet path: full-outer join of incoming vs
    existing with incoming-wins semantics, rewritten atomically via a staging
    path.  (With a transactional table format this is a single MERGE INTO;
    plain parquet needs the rewrite.)"""
    existing = read_state_parquet(spark, path)
    if existing is not None:
        merged = join_upsert(incoming, existing.select(*incoming.columns), keys)
    else:  # first write: nothing to merge
        merged = incoming
    # two-phase: a source path cannot be overwritten while being read, so
    # materialize the merge to a staging dir, then rename it into place
    staging = path.rstrip("/") + "__staging"

    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    replace_parquet_dir(spark, staging, path.rstrip("/"))
