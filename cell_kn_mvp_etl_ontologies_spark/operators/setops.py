"""Set operations (SURVEY.md §2.7)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def setop_union_files(dfs: list[DataFrame], dedup_keys: list[str] | None = None) -> DataFrame:
    """Bag union of per-file DataFrames, then set dedup.
    Ref: OntologyTripleParser.java:163-167.  (A single multi-file scan with a
    src_file column makes this union implicit — preferred at scale.)"""
    out = reduce(DataFrame.unionByName, dfs)
    return out.dropDuplicates(dedup_keys) if dedup_keys else out


def setop_union_label_sets(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of edge-label sets from two passes.
    Ref: OntologyGraphBuilder.java:541-543,610-616."""
    return a.unionByName(b).distinct()


def setop_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def setop_except(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
