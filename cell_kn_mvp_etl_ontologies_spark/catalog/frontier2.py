"""Round-7 continuation batch 2: Pareto skyline, prefix-filtered set
similarity join, and further analytics-frontier operators — each with an
exactly-equivalent DuckDB oracle (integer quantization keeps every score
bit-exact across engines; see catalog/__init__ cross-engine rules).

These extend the SURVEY §2.12/§2.13 training-data / analytics surface
beyond the reference's own operator set (the brief's "operations a
large-scale training-data pipeline would need"):

- skyline_pareto is the multi-objective dominance filter (Börzsönyi et
  al., ICDE 2001) every data-curation tradeoff screen needs (quality vs
  length, cost vs coverage).  The engine-side plan is the O(n log n)
  sort-sweep expressed as two window passes — NOT the quadratic
  NOT-EXISTS the oracle uses, so the gate proves the sweep equals the
  definition.
- join_set_similarity_prefix is the AllPairs/PPJoin prefix filter
  (Bayardo et al., WWW 2007): candidate pairs are generated ONLY from the
  rare-token prefixes of each document's shingle set, never from the full
  inverted index, and verification is an exact integer Jaccard test.  The
  oracle computes the FULL shared-shingle join, so the gate proves the
  prefix filter is lossless at threshold t.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# skyline_pareto — multi-objective dominance frontier via window sort-sweep
# --------------------------------------------------------------------------
@register(
    "skyline_pareto",
    oracle="""
    WITH base AS (
      SELECT p_brand AS brand, CAST(p_partkey AS BIGINT) AS p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT brand, p_partkey, price_c, size
    FROM base a
    WHERE NOT EXISTS (
      SELECT 1 FROM base b
      WHERE b.brand = a.brand
        AND b.price_c <= a.price_c AND b.size <= a.size
        AND (b.price_c < a.price_c OR b.size < a.size)
    )
    """,
)
def skyline_pareto_q(spark, sf_dir):
    """Per-brand Pareto skyline of parts minimizing (price, size) — the
    multi-objective screen a curation pipeline runs to shortlist
    non-dominated tradeoffs (no other same-brand part is <= on both
    objectives and < on one).  The ORACLE states the quadratic dominance
    definition (NOT EXISTS over all pairs); the ENGINE runs the
    O(n log n) sort-sweep instead: after ordering by price, a part is
    dominated iff some strictly-cheaper part has size <= its size
    (running-min window with RANGE ... 1 PRECEDING) or some same-price
    part has strictly smaller size (per-(brand,price) min) — so the gate
    proves the sweep implements the definition.  Exactly-equal duplicate
    points dominate nothing and survive together, matching NOT EXISTS.

    100 TB shape: one exchange on the skyline group key, two window
    passes over each group's sort — never the pairwise self-join.  For
    ungrouped skylines the classic distributed recipe (partition-local
    sweep, then a sweep over the survivor union — dominance is
    transitive so local losers can't be global winners) drops in via the
    same operator applied twice.
    """
    base = _t(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    w_cheaper = (
        Window.partitionBy("brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_price = Window.partitionBy("brand", "price_c")
    flagged = base.select(
        "brand",
        "p_partkey",
        "price_c",
        "size",
        F.min("size").over(w_cheaper).alias("min_size_cheaper"),
        F.min("size").over(w_same_price).alias("min_size_same"),
    )
    return flagged.filter(
        (F.col("min_size_cheaper").isNull() | (F.col("min_size_cheaper") > F.col("size")))
        & (F.col("min_size_same") >= F.col("size"))
    ).select("brand", "p_partkey", "price_c", "size")


# --------------------------------------------------------------------------
# join_set_similarity_prefix — AllPairs/PPJoin prefix-filtered Jaccard join
# --------------------------------------------------------------------------
_SSJ_T_NUM, _SSJ_T_DEN = 7, 10  # Jaccard threshold t = 0.7 as an exact rational


@register(
    "join_set_similarity_prefix",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id,
             tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] || ' ' || tl[i+3] AS shingle
      FROM toks, generate_series(1, 4000) t(i)
      WHERE i + 3 <= len(tl)
    ),
    sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY id),
    common AS (
      SELECT x.id AS a, y.id AS b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
      GROUP BY x.id, y.id
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           n_inter, sa.n AS n_a, sb.n AS n_b
    FROM common
    JOIN sizes sa ON sa.id = a
    JOIN sizes sb ON sb.id = b
    WHERE 10 * n_inter >= 7 * (sa.n + sb.n - n_inter)
    """,
)
def join_set_similarity_prefix_q(spark, sf_dir):
    """Set-similarity self-join (word-4-shingle Jaccard >= 0.7) with
    AllPairs prefix filtering (Bayardo et al., WWW 2007): order every
    document's shingle set by GLOBAL rarity (freq asc, shingle asc), keep
    only the first |d| - ceil(t*|d|) + 1 shingles as the "prefix", and
    generate candidate pairs ONLY from prefix-shingle collisions — any
    pair with Jaccard >= t must collide there, so the filter is lossless.
    Candidates then pass a length filter (t*max <= min, exact integers)
    and exact verification (10*inter >= 7*union — rational threshold, no
    floats anywhere).  The ORACLE joins the FULL shingle index (every
    shared shingle), so a hash-match proves losslessness, not just
    plausibility.

    100 TB shape: the full-index join's fanout is sum over shingles of
    df(s)^2 — quadratic in the document frequency of COMMON shingles; the
    prefix join touches only each doc's rarest (1-t)|d|+1 shingles, where
    df is by construction small, which is THE published scale fix for
    similarity self-joins.  The rarity ranking is a dimension build
    (shingle -> rank) joined back shuffle-wise; its global row_number
    sort is over the distinct-shingle dim, not the corpus.
    """
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id"),
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
        ).alias("tl"),
    )
    sh = (
        docs.filter(F.size("tl") >= 4)
        .select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tl) - 3),"
                    " i -> concat_ws(' ', tl[i-1], tl[i], tl[i+1], tl[i+2]))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    # Global rarity order over the distinct-shingle dimension (not the corpus).
    rank = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "shingle",
            F.row_number().over(Window.orderBy("df", "shingle")).alias("rnk"),
        )
    )
    ranked = sh.join(rank, "shingle").select("id", "rnk")
    # Per-doc sorted rank-set; n derived here (no second join against a
    # sizes aggregate — one exchange instead of two).  Verification later
    # intersects these arrays codegen-side instead of re-exploding the
    # inverted index into a per-pair shuffle.
    # Persisted: consumed three times (prefix explode + both verify sides);
    # without the barrier each consumer re-derives the index build.  At
    # 100 TB this is the StorageLevel.DISK_ONLY materialization of the
    # sorted-set dim every published AllPairs implementation keeps.
    docs_sorted = ranked.groupBy("id").agg(
        F.sort_array(F.collect_list("rnk")).alias("rnks"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).persist()
    # prefix length = n - ceil(t*n) + 1, ceil as exact integer arithmetic
    pre = docs_sorted.select(
        "id",
        "n",
        F.explode(
            F.slice(
                "rnks",
                F.lit(1),
                (
                    F.col("n")
                    - F.floor((_SSJ_T_NUM * F.col("n") + _SSJ_T_DEN - 1) / _SSJ_T_DEN)
                    + 1
                ).cast("int"),
            )
        ).alias("rnk"),
    )
    pa = pre.select(F.col("id").alias("a"), F.col("n").alias("n_a"), "rnk")
    pb = pre.select(F.col("id").alias("b"), F.col("n").alias("n_b"), "rnk")
    cand = (
        pa.join(pb, "rnk")
        .filter(
            (F.col("a") < F.col("b"))
            & (
                _SSJ_T_DEN * F.least("n_a", "n_b")
                >= _SSJ_T_NUM * F.greatest("n_a", "n_b")
            )
        )
        .select("a", "b", "n_a", "n_b")
        .distinct()
    )
    ra = docs_sorted.select(F.col("id").alias("a"), F.col("rnks").alias("rnks_a"))
    rb = docs_sorted.select(F.col("id").alias("b"), F.col("rnks").alias("rnks_b"))
    inter = (
        cand.join(ra, "a")
        .join(rb, "b")
        .select(
            "a",
            "b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("rnks_a", "rnks_b")).cast("long").alias("n_inter"),
        )
    )
    return inter.filter(
        _SSJ_T_DEN * F.col("n_inter")
        >= _SSJ_T_NUM * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    ).select("a", "b", "n_inter", "n_a", "n_b")
