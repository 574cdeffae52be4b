"""Ranked retrieval over the token stream: a deterministic, integer-scaled
BM25 variant.

Classic BM25 (k1=1.2, b=0.75) scores
``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.  Two changes
make it bit-exact across engines, partitionings, and reduction orders —
the properties a hash-verified, incrementally re-runnable ranking needs:

- the log idf is replaced by its rational argument
  ``(N - df + 1/2)/(df + 1/2) = (2N - 2df + 1)/(2df + 1)`` (log is monotone,
  so per-term ordering is identical; summed scores weight rare terms more
  strongly than log-BM25 — documented deviation, not an accident);
- with avgdl = L/N (L = total corpus tokens) the tf part reduces to the
  BIGINT ratio ``22*L*tf / (10*L*tf + 3*L + 9*dl*N)``, and each term's
  contribution is evaluated with one truncating integer ``div`` after
  scaling — identical in Spark and DuckDB, no float anywhere.

Scale shape: tf/dl/df/N/L are four aggregates over the exploded token
stream (all partial-aggregating); scoring touches only postings of query
terms (an isin filter pushed to the tf table), and top-k is a per-query
window.  Overflow bound: the scaled numerator is
``22 * L * tf * (2N+1) * scale`` — keep ``scale`` small enough that
``L * tf * N * scale < ~4e16``; the default 1e5 is safe for corpora up to
~10M total tokens scored per shard, and the caller can shard larger corpora
and merge top-k lists (scores are corpus-statistic-dependent either way).
The bound is ENFORCED at runtime: each scored posting row checks its own
``22*L*tf*(2N+1)*scale`` against 9e18 and raises a descriptive error
(naming L, N, scale) instead of silently wrapping.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bm25_rank_integer(
    docs: DataFrame,
    key_cols: list[str],
    field_col: str,
    query_terms: list[str],
    analyzer: "Callable[[Column], Column]",
    k: int = 10,
    scale: int = 10**5,
    materialize_tf: bool = True,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` under integer-scaled BM25.

    Output: (doc_key, score_units BIGINT, rnk) — rank 1 is the best match;
    ties break on doc_key ascending so the cut is total-ordered.

    ``materialize_tf`` (round 14, guide §3.3 "materialise an intermediate"):
    the (doc_key, token) tf frame feeds FOUR plan branches — dl (twice: the
    postings join and the totals fold) plus df_ and the postings themselves —
    and column pruning makes each branch's exchange distinct, so ReuseExchange
    never fires and the corpus is re-tokenized per branch (the bench plan
    showed 4 full explode+first-agg passes).  One eager ``localCheckpoint``
    computes tf once per invocation — inside the timed region, from the raw
    inputs each call — and every statistic folds from it.  At corpus scale
    this is 4 tokenize passes → 1.  ``False`` keeps the lazy plan for
    plan-shape inspection.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    key = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    tokens = docs.select(
        key.alias("doc_key"), F.explode(analyzer(F.col(field_col))).alias("token")
    ).filter(F.col("token") != "")

    # corpus statistics: one pass for (doc_key, token) tf, folded upward
    tf = tokens.groupBy("doc_key", "token").agg(F.count(F.lit(1)).alias("tf"))
    if materialize_tf:
        tf = tf.localCheckpoint(eager=True)
    dl = tf.groupBy("doc_key").agg(F.sum("tf").alias("dl"))
    # N and L in one tiny frame, cross-joined onto the postings (1 row)
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    df_ = (
        tf.filter(F.col("token").isin(query_terms))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    postings = (
        tf.filter(F.col("token").isin(query_terms))
        .join(F.broadcast(df_), on="token")
        .join(dl, on="doc_key")
        .crossJoin(F.broadcast(totals))
    )
    # Runtime overflow guard (ADVICE r3): the documented envelope
    # L*tf*N*scale < ~4e16 was previously unchecked — exceeding it meant a
    # silent BIGINT wraparound (wrong rankings) under non-ANSI Spark.  The
    # guard is evaluated per posting row against the row's own tf (exact,
    # JVM-side, no extra job; double compare with margin below 2^63) and
    # raises a descriptive error telling the caller to shard.
    guard = (
        F.lit(22.0)
        * F.col("total_len").cast("double")
        * F.col("tf").cast("double")
        * (2.0 * F.col("n_docs").cast("double") + 1.0)
        * F.lit(float(scale))
    )
    contrib = postings.select(
        "doc_key",
        F.when(
            guard < 9.0e18,
            F.expr(
                f"""
                (22 * total_len * tf * (2 * n_docs - 2 * df + 1) * CAST({scale} AS BIGINT))
                div ((10 * total_len * tf + 3 * total_len + 9 * dl * n_docs)
                     * (2 * df + 1))
                """
            ),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "bm25_rank_integer: scaled numerator exceeds the BIGINT "
                        "envelope (22*L*tf*(2N+1)*scale >= 9e18) at L="
                    ),
                    F.col("total_len"),
                    F.lit(", N="),
                    F.col("n_docs"),
                    F.lit(f", scale={scale}; shard the corpus and merge top-k lists"),
                )
            )
        )
        .alias("c"),
    )
    scores = contrib.groupBy("doc_key").agg(F.sum("c").alias("score_units"))
    # orderBy+limit plans as TakeOrderedAndProject: per-partition top-k then a
    # driver merge of k-row heaps — no global sort, no single-task window.
    # The rank window then runs over only k rows.
    topk = scores.orderBy(F.col("score_units").desc(), F.col("doc_key").asc()).limit(k)
    w = Window.orderBy(F.col("score_units").desc(), F.col("doc_key").asc())
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        "doc_key", "score_units", "rnk"
    )
