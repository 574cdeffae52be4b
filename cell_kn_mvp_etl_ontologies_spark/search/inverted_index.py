"""Materialized inverted index (SURVEY.md §2.9 text_inverted_index_view).

The ArangoSearch view (`indexed`, ArangoDbUtilities.java:280-312) becomes a
token-posting DataFrame: per configured (collection, field), tokenize with an
analyzer and aggregate postings per token.  Batch overwrite replaces the 1 s
commit/consolidate cadence; a query is a join on token.

Scale: one shuffle keyed by token; postings lists are collect_set-bounded by
document frequency.  For web-scale corpora pass ``max_postings`` — the
salted two-level build keeps the true df but caps stored postings at the K
first doc_keys, so a stop-word-grade hot token can no longer concentrate
its whole document set in one reducer's aggregation state.
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
    max_postings: int | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """(token, analyzer, field, n_docs, postings sorted array of keys).

    ``max_postings=None`` keeps exact full postings (one exchange on token —
    fine while every token's document set fits a reducer).  With
    ``max_postings=K`` the build is hot-token-skew-guarded (VERDICT r3 #5):
    a stop-word-grade token matching most of a web-scale corpus would
    otherwise funnel its whole document set through ONE reducer's
    collect_set state.  The guarded plan salts by ``crc32(doc_key) %
    n_salts`` first, so a hot token's set builds on ``n_salts`` reducers in
    parallel with per-group state ≤ its share, each salt group keeps only
    its K smallest keys, and the final per-token combine handles at most
    ``n_salts×K`` entries.  ``n_docs`` stays the TRUE document frequency
    (the per-salt sets partition the documents, so their sizes sum
    exactly); ``postings`` becomes the K lexicographically-first doc_keys —
    the count-plus-head summary, which is what ranked retrieval needs (BM25
    uses df, not the full list) while membership queries fall back to the
    positional/bucketed index."""
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    tokens = docs.select(
        key.alias("doc_key"), F.explode(analyzer(F.col(field_col))).alias("token")
    ).filter(F.col("token") != "")
    if max_postings is None:
        # n_docs = size(postings), NOT countDistinct: count(distinct)
        # alongside collect_set makes Spark plan a two-exchange
        # distinct-aggregate (shuffle by (token, doc_key), re-shuffle by
        # token); the set is already distinct, so sizing it afterwards
        # keeps the plan at ONE exchange.
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
    if max_postings < 1 or n_salts < 1:
        raise ValueError("max_postings and n_salts must be >= 1")
    per_salt = (
        tokens.withColumn("salt", F.crc32(F.col("doc_key")) % n_salts)
        .groupBy("token", "salt")
        .agg(F.sort_array(F.collect_set("doc_key")).alias("part"))
        .select(
            "token",
            F.size("part").alias("n_part"),
            # global K smallest ⊆ union of per-salt K smallest
            F.slice("part", 1, max_postings).alias("head"),
        )
    )
    return (
        per_salt.groupBy("token")
        .agg(
            F.sum("n_part").cast("long").alias("n_docs"),
            F.slice(
                F.sort_array(F.flatten(F.collect_list("head"))), 1, max_postings
            ).alias("postings"),
        )
        .select(
            "token",
            "n_docs",
            "postings",
            F.lit(analyzer_name).alias("analyzer"),
            F.lit(field_col).alias("field"),
        )
    )


def phrase_search(positional_index: DataFrame, phrase: list[str]) -> DataFrame:
    """Documents containing ``phrase`` as adjacent tokens, via the positional
    index: join the per-term postings on doc_key and check offset adjacency
    with array expressions (positions of term i+1 must contain pos+1 for some
    pos of term i).  Returns (doc_key, start_pos) per occurrence.

    This is the query side the ArangoSearch view served; each additional
    phrase term is one more broadcast-sized join against the index."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    # explode each term's postings to (doc_key, positions) and join on doc
    terms = []
    for i, term in enumerate(phrase):
        t = (
            positional_index.filter(F.col("token") == term)
            .select(F.explode("postings").alias("p"))
            .select(
                F.col("p.doc_key").alias("doc_key"),
                F.col("p.positions").alias(f"pos_{i}"),
            )
        )
        terms.append(t)
    joined = terms[0]
    for i in range(1, len(phrase)):
        joined = joined.join(terms[i], on="doc_key")
    # start positions: p in pos_0 such that p+i is in pos_i for all i
    def adjacent(p: Column) -> Column:
        cond = F.lit(True)
        for i in range(1, len(phrase)):
            cond = cond & F.array_contains(F.col(f"pos_{i}"), p + i)
        return cond

    start = F.filter(F.col("pos_0"), adjacent)
    return (
        joined.select("doc_key", F.explode(start).alias("start_pos"))
        .select("doc_key", F.col("start_pos").cast("long").alias("start_pos"))
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

    Shape: ONE explicit exchange on token; both aggregations reuse it
    (hash-partitioning on {token} satisfies grouping by (token, doc_key) —
    subset rule).  The regroup is two-level aggregation, NOT an array
    nested-loop over collected entries: a stop-word-grade token matches most
    documents, so any per-token O(n_docs x n_entries) expression is
    quadratic exactly where the index is hottest."""
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    tokens = (
        docs.select(
            key.alias("doc_key"),
            F.posexplode(analyzer(F.col(field_col))).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
        .repartition("token")
    )
    per_doc = tokens.groupBy("token", "doc_key").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    return (
        per_doc.groupBy("token")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_key", "positions"))).alias("postings")
        )
        .select(
            "token",
            F.size("postings").cast("long").alias("n_docs"),
            "postings",
            F.lit(analyzer_name).alias("analyzer"),
            F.lit(field_col).alias("field"),
        )
    )
