"""Round-4 analytics additions: time-series gap fill, unpivot/melt,
edit-distance near-dup, bounded BFS, and substring-span dedup — each with an
exactly-equivalent DuckDB oracle (integer/floor math keeps interpolation and
distances bit-exact across engines).

Reference parity notes:
- temporal_gap_fill mirrors the continuous-series densify/interpolate shape
  applied to versioned release series (BASELINE.md: the reference's version
  catalogs are sparse date series).
- graph_bfs_distance is the bounded-depth traversal semantics of the
  reference's graph queries (fixed-hop subclass walks; see
  OntologyGraphBuilder's vertex/edge model, which its AQL traversals read).
- dedup_fuzzy_levenshtein / dedup_substring_spans extend the §2.12 training
  curation surface (Lee et al. 2022 substring dedup, recast shuffle-native).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import duplicated_span_hashes, fuzzy_pairs_levenshtein
from ..operators.temporal import gap_fill_interpolate
from ..plans.graph_query import bfs_distances
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# temporal_gap_fill — densify + linear interpolation over a bucketized series
# --------------------------------------------------------------------------
@register(
    "temporal_gap_fill",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS bucket,
             SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS v
      FROM events WHERE user_id < 40 GROUP BY 1, 2
    ),
    span AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM obs GROUP BY user_id),
    grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM span),
    j AS (
      SELECT g.user_id, g.bucket, o.v
      FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
    ),
    f AS (
      SELECT user_id, bucket, v,
        last_value(v IGNORE NULLS) OVER w_prev AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER w_prev AS pb,
        first_value(v IGNORE NULLS) OVER w_next AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER w_next AS nb
      FROM j
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(bucket AS BIGINT) AS bucket,
      CAST(CASE WHEN v IS NOT NULL THEN v
           ELSE CAST(FLOOR((pv * (nb - bucket) + nv * (bucket - pb))
                           / CAST(nb - pb AS DOUBLE)) AS BIGINT)
           END AS BIGINT) AS value_units,
      (v IS NULL) AS interpolated
    FROM f
    """,
)
def temporal_gap_fill_q(spark, sf_dir):
    """Daily per-user value series densified over each user's observed span,
    gaps filled by exact linear interpolation (operators/temporal.py
    gap_fill_interpolate).  Values are floor-quantized to integer micro-units
    BEFORE aggregation so sums, and therefore the interpolation endpoints,
    are bit-identical across engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    # timestampdiff over NTZ is pure calendar arithmetic — no session-timezone
    # dependence (unix_timestamp on NTZ would shift with the driver's tz)
    epoch_s = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    obs = ev.groupBy(
        "user_id",
        F.floor(epoch_s / 86400).cast("long").alias("bucket"),
    ).agg(F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("v"))
    return gap_fill_interpolate(obs, "user_id", "bucket", "v")


# --------------------------------------------------------------------------
# agg_unpivot_long — wide measures → long (measure, value) melt
# --------------------------------------------------------------------------
@register(
    "agg_unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             'quantity' AS measure, CAST(l_quantity AS DOUBLE) AS value
      FROM lineitem WHERE l_orderkey % 101 = 0
      UNION ALL
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'extendedprice',
             CAST(l_extendedprice AS DOUBLE)
      FROM lineitem WHERE l_orderkey % 101 = 0
      UNION ALL
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'discount',
             CAST(l_discount AS DOUBLE)
      FROM lineitem WHERE l_orderkey % 101 = 0
      UNION ALL
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'tax', CAST(l_tax AS DOUBLE)
      FROM lineitem WHERE l_orderkey % 101 = 0
    )
    """,
)
def agg_unpivot_long_q(spark, sf_dir):
    """Melt the four lineitem measures to long form with one stack() pass —
    a single scan emitting 4 rows per input row inside codegen, where the
    UNION-ALL oracle formulation would scan the fact table four times.
    At 100 TB that single-scan property is the whole point of unpivot."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.expr(
            "stack(4,"
            " 'quantity', CAST(l_quantity AS DOUBLE),"
            " 'extendedprice', CAST(l_extendedprice AS DOUBLE),"
            " 'discount', CAST(l_discount AS DOUBLE),"
            " 'tax', CAST(l_tax AS DOUBLE)) AS (measure, value)"
        ),
    ).select("l_orderkey", "l_linenumber", "measure", "value")


# --------------------------------------------------------------------------
# dedup_fuzzy_levenshtein — prefix-bucketed edit-distance near-dup pairs
# --------------------------------------------------------------------------
_FUZZY_CORPUS_SQL = """
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 10000, text || ' zq' FROM documents WHERE doc_id < 20
"""


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH corpus AS ({corpus}),
    norm AS (
      SELECT doc_id, lower(trim(text)) AS t,
             substr(lower(trim(text)), 1, 12) AS pfx
      FROM corpus
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM norm a JOIN norm b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
    WHERE levenshtein(a.t, b.t) <= 4
    """.format(corpus=_FUZZY_CORPUS_SQL),
)
def dedup_fuzzy_levenshtein_q(spark, sf_dir):
    """Edit-distance near-dup pairs on documents plus planted suffix-edited
    copies (doc_id+10000, text + ' zq', distance 3) — prefix-bucket
    candidates, exact JVM levenshtein refine (operators/dedup.py
    fuzzy_pairs_levenshtein)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    edited = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    corpus = base.unionByName(edited)
    return fuzzy_pairs_levenshtein(corpus, "text", "doc_id", prefix_len=12, max_dist=4)


# --------------------------------------------------------------------------
# graph_bfs_distance — bounded multi-source BFS over the co-purchase graph
# --------------------------------------------------------------------------
@register(
    "graph_bfs_distance",
    oracle="""
    WITH RECURSIVE li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 7 = 3
    ),
    pairs AS (
      SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ),
    e AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
    seeds AS (SELECT DISTINCT l_partkey AS v FROM li WHERE l_partkey % 97 = 0),
    d AS (
      SELECT v, 0 AS dist FROM seeds
      UNION
      SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.v WHERE d.dist < 3
    )
    SELECT CAST(v AS BIGINT) AS v, CAST(MIN(dist) AS BIGINT) AS dist
    FROM d GROUP BY v
    """,
)
def graph_bfs_distance_q(spark, sf_dir):
    """Hop distance ≤3 from seed parts (partkey % 97 = 0) over the undirected
    co-purchase graph (plans/graph_query.bfs_distances).  The oracle's
    recursive CTE enumerates (vertex, walk length) pairs and MIN-folds;
    Bellman-Ford min propagation computes the same shortest distances —
    their equality is the correctness claim."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 3)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        li.alias("x")
        .join(li.alias("y"), on="l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    seeds = li.filter(F.col("l_partkey") % 97 == 0).select(
        F.col("l_partkey").alias("v")
    ).distinct()
    return bfs_distances(edges, seeds, max_hops=3)


# --------------------------------------------------------------------------
# dedup_substring_spans — cross-document duplicated token windows
# --------------------------------------------------------------------------
@register(
    "dedup_substring_spans",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id + 10000, substr(text, 21) FROM documents WHERE doc_id < 10
    ),
    tok AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM corpus
    ),
    w AS (
      SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS span
      FROM tok CROSS JOIN UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
      WHERE len(t) >= 8
    )
    SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM w GROUP BY span HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def dedup_substring_spans_q(spark, sf_dir):
    """Duplicated 8-token windows across documents plus planted
    shared-suffix docs (doc_id+10000 carrying substr(text, 21) — guaranteed
    cross-doc spans).  operators/dedup.duplicated_span_hashes hashes windows
    inside transform() so only 32-char hashes explode."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 400)
    shifted = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.substring(F.col("text"), 21, 1 << 30).alias("text"),
    )
    corpus = base.unionByName(shifted)
    return duplicated_span_hashes(corpus, "text", "doc_id", window_tokens=8)
