"""Materialized inverted index (SURVEY.md §2.9 text_inverted_index_view).

The ArangoSearch view (`indexed`, ArangoDbUtilities.java:280-312) becomes a
token-posting DataFrame: per configured (collection, field), tokenize with an
analyzer and aggregate postings per token.  Batch overwrite replaces the 1 s
commit/consolidate cadence; a query is a join on token.

Scale: one shuffle keyed by token; postings lists are collect_set-bounded by
document frequency — for web-scale corpora swap the list for a count/top-k
summary or bucket postings by (token, shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame,
    key_cols: list[str],
    field_col: str,
    analyzer: "callable[[Column], Column]",
    analyzer_name: str = "text_en_no_stem",
) -> DataFrame:
    """(token, analyzer, field, n_docs, postings sorted array of keys)."""
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    tokens = docs.select(
        key.alias("doc_key"), F.explode(analyzer(F.col(field_col))).alias("token")
    ).filter(F.col("token") != "")
    # n_docs = size(postings), NOT countDistinct: count(distinct) alongside
    # collect_set makes Spark plan a two-exchange distinct-aggregate
    # (shuffle by (token, doc_key), re-shuffle by token); the set is already
    # distinct, so sizing it afterwards keeps the plan at ONE exchange.
    return (
        tokens.groupBy("token")
        .agg(F.sort_array(F.collect_set("doc_key")).alias("postings"))
        .select(
            "token",
            F.size("postings").cast("long").alias("n_docs"),
            "postings",
            F.lit(analyzer_name).alias("analyzer"),
            F.lit(field_col).alias("field"),
        )
    )


def build_positional_index(
    docs: DataFrame,
    key_cols: list[str],
    field_col: str,
    analyzer: "callable[[Column], Column]",
    analyzer_name: str = "text_en_no_stem",
) -> DataFrame:
    """Position-aware postings (the analyzer's `position` feature,
    ArangoDbUtilities.java:229): (token, n_docs, postings ARRAY<STRUCT<
    doc_key, positions ARRAY<INT>>>).

    Positions are 0-based indices into the analyzer's token array — for the
    \\s+ tokenizers consecutive whitespace collapses to one slot, so offsets
    are token distances (what phrase queries need), not character columns.
    Same single-exchange shape as build_inverted_index: ONE collect per
    token, the per-doc regroup runs JVM-side over the collected array."""
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    tokens = docs.select(
        key.alias("doc_key"),
        F.posexplode(analyzer(F.col(field_col))).alias("pos", "token"),
    ).filter(F.col("token") != "")
    entries = F.sort_array(F.collect_list(F.struct("doc_key", "pos")))
    regroup = F.transform(
        F.array_distinct(F.transform(F.col("entries"), lambda e: e["doc_key"])),
        lambda d: F.struct(
            d.alias("doc_key"),
            F.transform(
                F.filter(F.col("entries"), lambda e: e["doc_key"] == d),
                lambda e: e["pos"],
            ).alias("positions"),
        ),
    )
    return (
        tokens.groupBy("token")
        .agg(entries.alias("entries"))
        .select(
            "token",
            F.size(F.array_distinct(F.transform(F.col("entries"), lambda e: e["doc_key"])))
            .cast("long")
            .alias("n_docs"),
            regroup.alias("postings"),
            F.lit(analyzer_name).alias("analyzer"),
            F.lit(field_col).alias("field"),
        )
    )
