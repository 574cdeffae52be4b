"""Round-7 extension surface, part 1 of 4 (split from frontier3.py per
VERDICT r12 #7 — zero behavior change, sections moved verbatim): the
GRAPH / EMBEDDING / CLUSTERING / MULTIMODAL families — link prediction
(Jaccard/RA), clustering coefficient, k-truss, assortativity, two-hop
reach, deterministic uniform + node2vec-biased walks with skip-gram pair
generation, degree Gini, modularity audit; embedding health audits
(norms, pairwise-distance histogram, label separation, scaler params),
farthest-point seeding + k-means inertia A/B; binary-payload exact dedup
and cross-video frame dedup.  Shared doctrines in frontier3.py's hub
docstring."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table, read_state_parquet
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# graph_jaccard_neighbors — set-overlap link prediction on the same graph
# --------------------------------------------------------------------------
@register(
    "graph_jaccard_neighbors",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS a, 100000 + l_partkey % 1500 AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
    adj0 AS (SELECT src AS anchor, dst AS v FROM und),
    da AS (SELECT anchor, CAST(COUNT(*) AS BIGINT) AS d FROM adj0 GROUP BY anchor),
    adj AS (
      SELECT adj0.anchor, adj0.v FROM adj0 JOIN da USING (anchor)
      WHERE da.d <= 40
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dv FROM adj0 GROUP BY v),
    pairs AS (
      SELECT a1.v AS a, a2.v AS b, CAST(COUNT(*) AS BIGINT) AS common
      FROM adj a1 JOIN adj a2 USING (anchor)
      WHERE a1.v < a2.v
      GROUP BY a1.v, a2.v
      HAVING COUNT(*) >= 35
    )
    SELECT p.a, p.b, p.common,
           CAST(dx.dv + dy.dv - p.common AS BIGINT) AS union_sz,
           CAST(1000000 * p.common // (dx.dv + dy.dv - p.common) AS BIGINT)
             AS jac_ppm
    FROM pairs p JOIN deg dx ON dx.v = p.a JOIN deg dy ON dy.v = p.b
    """,
)
def graph_jaccard_neighbors_q(spark, sf_dir):
    """Jaccard-coefficient link prediction on the supplier-part
    co-purchase graph — |N(a) ∩ N(b)| / |N(a) ∪ N(b)| as the exact
    integer triple (common, union_sz, truncating ppm), completing the
    link-prediction family: `graph_common_neighbors` counts overlap,
    `graph_resource_allocation` weights it by anchor rarity, Jaccard
    normalizes it by the endpoints' own degrees (a hub sharing 35
    anchors is far less similar than a leaf sharing 35).

    Degrees are the FULL pre-cap neighbor counts (the endpoints' true
    set sizes); intersection counts over hub-capped anchors only — the
    stop-word doctrine shared with the whole family, stated in the
    oracle so both engines compute the identical capped semantics.
    common <= true intersection <= min(da, db) keeps union_sz >= common,
    so the ppm is always a valid [0, 1e6] share.

    100 TB shape: identical wedge plan to the family (anchor-keyed
    self-join bounded by cap^2 per anchor) plus two keyed joins against
    the vertex-degree table — degree tables are vertex-cardinality,
    orders of magnitude below the edge set, and the join keys are the
    pair endpoints the aggregation already partitioned by."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    adj0 = und.select(F.col("src").alias("anchor"), F.col("dst").alias("v"))
    # One materialization feeds the degree table, the cap filter, and both
    # self-join sides (the _pareto/HITS lineage doctrine).
    adj0 = adj0.localCheckpoint(eager=True)
    da = adj0.groupBy("anchor").agg(F.count(F.lit(1)).cast("long").alias("d"))
    deg = adj0.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("dv"))
    adj = adj0.join(da, "anchor").filter(F.col("d") <= 40).select("anchor", "v")
    a1 = adj.select("anchor", F.col("v").alias("a"))
    a2 = adj.select("anchor", F.col("v").alias("b"))
    pairs = (
        a1.join(a2, "anchor")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
        .filter(F.col("common") >= 35)
    )
    dx = deg.select(F.col("v").alias("a"), F.col("dv").alias("da_"))
    dy = deg.select(F.col("v").alias("b"), F.col("dv").alias("db_"))
    return (
        pairs.join(dx, "a")
        .join(dy, "b")
        .select(
            "a",
            "b",
            "common",
            (F.col("da_") + F.col("db_") - F.col("common"))
            .cast("long")
            .alias("union_sz"),
            F.expr("CAST(1000000 * common DIV (da_ + db_ - common) AS BIGINT)")
            .alias("jac_ppm"),
        )
    )


# --------------------------------------------------------------------------
# graph_clustering_coefficient — per-vertex LCC over the co-purchase graph
# --------------------------------------------------------------------------
@register(
    "graph_clustering_coefficient",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0
    ),
    e AS (
      SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM li x JOIN li y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tri_v AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS tri FROM (
        SELECT x AS v FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY v
    ),
    deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
      ) GROUP BY v
    )
    SELECT CAST(d.v AS BIGINT) AS v, d.deg,
           CAST(COALESCE(t.tri, 0) AS BIGINT) AS tri,
           CAST(2000000 * COALESCE(t.tri, 0)
                // (d.deg * (d.deg - 1)) AS BIGINT) AS lcc_ppm
    FROM deg d LEFT JOIN tri_v t ON t.v = d.v
    WHERE d.deg >= 2
    """,
)
def graph_clustering_coefficient_q(spark, sf_dir):
    """Per-vertex local clustering coefficient on the `graph_triangle_count`
    co-purchase graph: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the
    community-density profile (a vertex whose neighbors all know each
    other vs a pure broker), emitted as truncating ppm on exact integer
    triangle and degree counts.  Vertices with deg < 2 have no defined
    coefficient and are excluded rather than zero-filled.

    Engine side reuses the degree-oriented `triangle_list` enumeration
    (plans/graph_query.py — each triangle once under the (degree, id)
    total order, out-degrees bounded O(sqrt(m)) so hub skew cannot square),
    explodes the 3 vertices of each triangle, and joins the degree table;
    the oracle replays the naive a<b<c formulation plus the same census —
    equality of the two enumerations is itself the correctness claim.

    100 TB shape: triangle_list's three keyed shuffles + a vertex-keyed
    count and one degree join — all on vertex/edge cardinality frames; the
    explode is exactly 3x the triangle count, the operator's honest
    output-side lower bound."""
    from ..plans.graph_query import canonical_undirected, triangle_list

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        li.alias("x")
        .join(li.alias("y"), on="l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    )
    edges = canonical_undirected(pairs).localCheckpoint(eager=True)
    tri = triangle_list(edges)
    tri_v = (
        tri.select(F.col("u").alias("v"))
        .unionByName(tri.select(F.col("v").alias("v")))
        .unionByName(tri.select(F.col("w").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return (
        deg.join(tri_v, "v", "left")
        .filter(F.col("deg") >= 2)
        .select(
            F.col("v").cast("long").alias("v"),
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
            F.expr(
                "CAST(2000000 * coalesce(tri, 0) DIV (deg * (deg - 1)) AS BIGINT)"
            ).alias("lcc_ppm"),
        )
    )


# --------------------------------------------------------------------------
# embedding_norm_profile — vector-column quality audit
# --------------------------------------------------------------------------
@register(
    "embedding_norm_profile",
    oracle="""
    WITH corpus AS (SELECT vec_id, label, embedding FROM embeddings),
    quant AS (
      SELECT vec_id, label, len(embedding) AS dim, i,
             CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM corpus, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    ),
    norms AS (
      SELECT vec_id, label, MIN(dim) AS dim,
             CAST(SUM(v * v) AS BIGINT) AS norm_sq
      FROM quant GROUP BY vec_id, label
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(dim) AS BIGINT) AS dim_min,
           CAST(MAX(dim) AS BIGINT) AS dim_max,
           CAST(SUM(CASE WHEN norm_sq = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           CAST(MIN(norm_sq) AS BIGINT) AS min_norm_sq,
           CAST(MAX(norm_sq) AS BIGINT) AS max_norm_sq,
           CAST(SUM(norm_sq) AS BIGINT) AS sum_norm_sq
    FROM norms GROUP BY label
    """,
)
def embedding_norm_profile_q(spark, sf_dir):
    """Vector-column quality audit per label: dimension uniformity
    (dim_min == dim_max or the column is corrupt), zero-vector count (a
    zero embedding breaks cosine and usually means an upstream encoder
    failure), and the quantized squared-norm range — the profile run
    before any ANN build (`profile_numeric`'s doctrine applied to the
    embedding column).  Norms quantize through the SAME HALF_UP
    `quantize_vec` contract as every similarity rung, so the stats are
    bit-comparable with the ANN chain's internal scores.

    100 TB shape: per-vector norm is a HOF aggregate inside the row (no
    explode in the engine — F.aggregate over the array, corpus-linear,
    whole-stage codegen); the label rollup is a tiny hash agg.  The
    ORACLE explodes via generate_series because DuckDB's lambda sums
    float-typed; the engine never materializes element rows."""
    from ..operators.similarity import quantize_vec

    em = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("long").alias("label"),
        F.size("embedding").cast("long").alias("dim"),
        F.aggregate(
            quantize_vec(F.col("embedding")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ).alias("norm_sq"),
    )
    return em.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.min("dim").alias("dim_min"),
        F.max("dim").alias("dim_max"),
        F.sum((F.col("norm_sq") == 0).cast("long")).cast("long").alias("n_zero"),
        F.min("norm_sq").alias("min_norm_sq"),
        F.max("norm_sq").alias("max_norm_sq"),
        F.sum("norm_sq").cast("long").alias("sum_norm_sq"),
    )


# --------------------------------------------------------------------------
# graph_ktruss — fixed-round truss peel with an unrolled-CTE oracle
# --------------------------------------------------------------------------
def _ktruss_oracle(k: int = 5, n_rounds: int = 2) -> str:
    """Unroll the fixed-round truss peel as chained CTEs (the kcore /
    pq_train unroll doctrine): per round, a triangle enumeration, a
    per-edge support census (each a<b<c triangle supports its 3 edges),
    and the support filter."""
    parts = [
        """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 5 = 0
    ),
    e0 AS (
      SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM li x JOIN li y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    )"""
    ]
    for r in range(n_rounds):
        parts.append(
            f""",
    tri{r} AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e{r} e1
      JOIN e{r} e2 ON e1.b = e2.a
      JOIN e{r} e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    supp{r} AS (
      SELECT a, b, COUNT(*) AS supp FROM (
        SELECT x AS a, y AS b FROM tri{r}
        UNION ALL SELECT y, z FROM tri{r}
        UNION ALL SELECT x, z FROM tri{r}
      ) GROUP BY a, b
    ),
    e{r + 1} AS (
      SELECT e.a, e.b FROM e{r} e
      JOIN supp{r} s ON s.a = e.a AND s.b = e.b
      WHERE s.supp >= {k - 2}
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b FROM e{n_rounds}"""
    )
    return "".join(parts)


@register("graph_ktruss", oracle=_ktruss_oracle())
def graph_ktruss_q(spark, sf_dir):
    """5-truss of the co-purchase graph: edges supported by >= 3 triangles
    after a FIXED 2-round peel — the edge-cohesion refinement of
    `graph_kcore` (a k-core keeps well-connected VERTICES; a truss keeps
    edges embedded in dense triangle neighborhoods, the community-core
    screen).  The bounded-loop doctrine: the engine peels in a driver
    loop with per-round localCheckpoint lineage cuts, the oracle unrolls
    the SAME rounds as chained CTEs, so every intermediate support census
    is pinned, not just the fixpoint.

    Engine rounds reuse the degree-oriented `triangle_list` (each
    triangle once, O(m^1.5) under hub skew); each triangle's 3 edges are
    recovered as canonical (least, greatest) pairs — the explode is 3x
    the triangle count, the census's honest input size.

    100 TB shape: per round, triangle_list's three keyed shuffles + an
    edge-keyed census + an edge-keyed semi-filter — all edge/triangle
    cardinality; rounds strictly shrink the edge set, so round 1 is the
    cost ceiling."""
    from ..plans.graph_query import canonical_undirected, triangle_list

    k, n_rounds = 5, 2
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = (
        li.alias("x")
        .join(li.alias("y"), on="l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    )
    edges = canonical_undirected(pairs)
    for _ in range(n_rounds):
        edges = edges.localCheckpoint(eager=True)
        tri = triangle_list(edges)
        tri_edges = (
            tri.select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
            .unionByName(
                tri.select(F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b"))
            )
            .unionByName(
                tri.select(F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b"))
            )
        )
        supp = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("supp"))
        edges = (
            edges.join(supp, ["a", "b"])
            .filter(F.col("supp") >= k - 2)
            .select("a", "b")
        )
    return edges.select(
        F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b")
    )


# --------------------------------------------------------------------------
# graph_degree_assortativity — float-free degree-degree correlation
# --------------------------------------------------------------------------
@register(
    "graph_degree_assortativity",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS a, 100000 + l_partkey % 1500 AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
    deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY src),
    ed AS (
      SELECT da.d AS da, db.d AS db
      FROM raw e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS m,
           CAST(SUM(da * db) AS BIGINT) AS s1,
           CAST(SUM(da + db) AS BIGINT) AS s2,
           CAST(SUM(da * da + db * db) AS BIGINT) AS s3,
           CAST(4 * COUNT(*) * SUM(da * db)
                - SUM(da + db) * SUM(da + db) AS BIGINT) AS r_num,
           CAST(2 * COUNT(*) * SUM(da * da + db * db)
                - SUM(da + db) * SUM(da + db) AS BIGINT) AS r_den
    FROM ed
    """,
)
def graph_degree_assortativity_q(spark, sf_dir):
    """Degree assortativity of the co-purchase graph (Newman 2002): the
    Pearson correlation of endpoint degrees across edges — positive means
    hubs attach to hubs (social shape), negative means hubs attach to
    leaves (technological/bipartite shape; this supplier-part projection
    is strongly negative).  The correlation is emitted as the exact
    integer pair r_num = 4m·S1 − S2², r_den = 2m·S3 − S2² (r = num/den) —
    NO division at all: r_num is signed, and Spark's DIV truncates toward
    zero while DuckDB's // floors, so a signed ppm would diverge between
    engines on negative values — the division-semantics trap stated
    instead of stepped in.  All sums bounded: deg <= ~2e3, m ~2e4 keeps
    every term under 1e16.

    100 TB shape: one degree aggregate, two vertex-keyed joins to attach
    endpoint degrees, one global sum — no window, no self-join; the edge
    row count is the operator's linear cost."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ed = (
        raw.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
    )
    m, s1 = F.count(F.lit(1)), F.sum(F.col("da") * F.col("db"))
    s2 = F.sum(F.col("da") + F.col("db"))
    s3 = F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db"))
    return ed.agg(
        m.cast("long").alias("m"),
        s1.cast("long").alias("s1"),
        s2.cast("long").alias("s2"),
        s3.cast("long").alias("s3"),
        (4 * m * s1 - s2 * s2).cast("long").alias("r_num"),
        (2 * m * s3 - s2 * s2).cast("long").alias("r_den"),
    )


# --------------------------------------------------------------------------
# multimodal_dedup_exact — binary-payload content dedup
# --------------------------------------------------------------------------
@register(
    "multimodal_dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 25
    )
    -- DuckDB's sha256 signature is VARCHAR-only, but it digests the
    -- string's utf-8 BYTES — the exact bytes Spark's sha2(binary) sees,
    -- so hashing the text IS hashing the payload.
    SELECT sha256(text) AS payload_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS n_bytes
    FROM corpus GROUP BY sha256(text)
    """,
)
def multimodal_dedup_exact_q(spark, sf_dir):
    """Exact content dedup over OPAQUE BINARY payloads — the multimodal
    twin of `dedup_exact_hash`: image/audio/video blobs dedup by
    sha2(bytes) without ever decoding (the only content operation that is
    always safe on undecodable data), keeping the smallest id as
    canonical and carrying the byte length for the size histogram.
    Payloads here are the `multimodal_columns` synthetic binaries
    (UTF-8-encoded text) with planted byte-identical copies.

    100 TB shape: ONE hash aggregate keyed on the 32-byte digest — the
    map side reduces every partition to its distinct digests, so the
    exchange carries digests + counters, never payload bytes; the
    digest-key distribution is uniform by construction (no skew
    defense needed)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300).unionByName(
        docs.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    # the attach_binary_payload payload contract (utf-8 bytes of text),
    # without its metadata struct — dedup never reads metadata
    payload = corpus.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payload.groupBy(F.sha2("payload", 256).alias("payload_hash")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min(F.octet_length("payload")).cast("long").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# graph_two_hop_reach — friend-of-friend reach per vertex
# --------------------------------------------------------------------------
@register(
    "graph_two_hop_reach",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS a, 100000 + l_partkey % 1500 AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
    deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY src),
    adj AS (
      SELECT u.src, u.dst FROM und u JOIN deg ON deg.v = u.dst
      WHERE deg.d <= 40
    ),
    two_hop AS (
      SELECT e1.src AS v, e2.dst AS w
      FROM adj e1 JOIN und e2 ON e2.src = e1.dst
      WHERE e2.dst <> e1.src
    )
    SELECT CAST(v AS BIGINT) AS v,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS reach2
    FROM two_hop GROUP BY v
    """,
)
def graph_two_hop_reach_q(spark, sf_dir):
    """Two-hop reach (friend-of-friend audience size) per vertex: the
    count of DISTINCT vertices reachable in exactly <= 2 hops through a
    hub-capped middle — the influence/propagation sizing metric beside
    the link predictors (same graph, same cap doctrine: middles with
    degree > 40 are stop-vertices whose fanout would be quadratic and
    whose contribution is uninformative).  Note the cap applies to the
    MIDDLE vertex only — first-hop edges into a capped middle are kept,
    the second fanout is what the cap bounds; w <> v excludes the
    trivial 2-hop return to self.

    100 TB shape: one keyed self-join with per-middle fanout bounded by
    cap; the distinct-count is a (v, w)-keyed dedup inside the count
    aggregate — the expensive honest step, sized by true reach, not by
    path multiplicity (paths collapse before counting)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    deg = und.groupBy(F.col("dst").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    adj = (
        und.join(deg, und.dst == deg.v)
        .filter(F.col("d") <= 40)
        .select("src", "dst")
    )
    e2 = und.select(F.col("src").alias("dst"), F.col("dst").alias("w"))
    two_hop = (
        adj.join(e2, "dst")
        .filter(F.col("w") != F.col("src"))
        .select(F.col("src").alias("v"), "w")
    )
    return two_hop.groupBy("v").agg(
        F.countDistinct("w").cast("long").alias("reach2")
    )


# --------------------------------------------------------------------------
# multimodal_frame_dedup — cross-video duplicate-frame detection
# --------------------------------------------------------------------------
@register(
    "multimodal_frame_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             CAST(octet_length(encode(text)) % 10 + 1 AS BIGINT) AS n_frames
      FROM documents
    ),
    frames AS (
      SELECT doc_id, CAST(j AS BIGINT) AS frame_idx,
             substring(text, CAST(j * 8 + 1 AS INT), 8) AS frame_stub
      FROM d, generate_series(0, 9) t(j)
      WHERE j < n_frames AND j % 3 = 0
    )
    SELECT md5(frame_stub) AS frame_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS example_doc
    FROM frames GROUP BY md5(frame_stub)
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def multimodal_frame_dedup_q(spark, sf_dir):
    """Cross-video duplicate-frame detection: hash every sampled frame
    (the `multimodal_frame_sample` every-3rd stub frames) and keep hashes
    appearing in MORE THAN ONE document — the shared-intro/outro/
    watermark detector a video-training pipeline runs before clip-level
    dedup (byte-identical frames across different videos are edit-reuse
    evidence even when the videos differ).  Composes the multimodal
    sampling stage with the exact-dedup digest aggregate; decoding never
    happens — frames are opaque bytes hashed as-is (the
    `multimodal_dedup_exact` doctrine one level down, at frame
    granularity).

    100 TB shape: frame sampling is a bounded explode (every k-th frame,
    not every frame); the digest aggregate's exchange carries hashes +
    counters; the n_docs > 1 filter prunes the (overwhelming) unique
    tail before output."""
    from ..operators.multimodal import decode_payloads, sample_frames
    from ..operators.multimodal import attach_binary_payload

    docs = _t(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs)
    frames = sample_frames(
        decode_payloads(payloads), payloads, every_k=3, frame_bytes=8
    )
    return (
        frames.groupBy(F.md5("frame_stub").alias("frame_hash"))
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("example_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# graph_random_walks — deterministic hash-driven walk corpus
# --------------------------------------------------------------------------
def _walks_oracle(n_steps: int = 3, n_walks: int = 2) -> str:
    """Unrolled walk chain (the kcore/pq unroll doctrine): each step joins
    the ranked adjacency on (vertex, md5-picked rank)."""
    head = """
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS a, 100000 + l_partkey % 1500 AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
    adj AS (
      SELECT src AS v, dst AS nbr,
             row_number() OVER (PARTITION BY src ORDER BY dst) AS rnk
      FROM und
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v),
    w0 AS (
      SELECT a AS start, CAST(k AS BIGINT) AS walk_id, a AS v0
      FROM (SELECT DISTINCT a FROM raw), generate_series(0, {last_walk}) t(k)
    )""".format(last_walk=n_walks - 1)
    parts = [head]
    for s in range(n_steps):
        parts.append(
            f""",
    w{s + 1} AS (
      SELECT w.start, w.walk_id, w.v0{"".join(f", w.v{i}" for i in range(1, s + 1))},
             a.nbr AS v{s + 1}
      FROM w{s} w
      JOIN deg ON deg.v = w.v{s}
      JOIN adj a ON a.v = w.v{s}
       AND a.rnk = 1 + ('0x' || substring(md5(
             CAST(w.v{s} AS VARCHAR) || '|' || CAST({s} AS VARCHAR)
             || '|' || CAST(w.walk_id AS VARCHAR) || '|rw'), 1, 8))::BIGINT
             % deg.d
    )"""
        )
    cols = ", ".join(
        f"CAST(v{i} AS BIGINT) AS v{i}" for i in range(n_steps + 1)
    )
    parts.append(
        f"""
    SELECT CAST(start AS BIGINT) AS start, walk_id, {cols} FROM w{n_steps}"""
    )
    return "".join(parts)


@register("graph_random_walks", oracle=_walks_oracle())
def graph_random_walks_q(spark, sf_dir):
    """Deterministic random-walk corpus over the co-purchase graph — the
    DeepWalk/node2vec training-data generator: 2 walks of length 3 from
    every supplier, where step s of walk w at vertex v moves to the
    neighbor at rank 1 + md5(v|s|w|salt) mod deg(v) in the (vertex,
    sorted-neighbor) ranked adjacency.  The walk is a PURE FUNCTION of
    (vertex, step, walk_id) — no RNG state, so a re-executed task
    regenerates the identical walk (the bootstrap determinism argument,
    on graphs), shards are reproducible, and the full corpus is
    oracle-exact via the unrolled step chain.

    100 TB shape: each step is ONE keyed join against the ranked
    adjacency (co-partitioned on vertex) — k steps = k joins, never a
    per-walk driver loop; the frontier is walk-cardinality, constant per
    step.  Degree bias (uniform-neighbor sampling ~ node2vec p=q=1) is
    the documented sampling law; weighted walks swap the mod for a
    prefix-sum rank lookup on the same plan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    adj = und.select(
        F.col("src").alias("v"),
        F.col("dst").alias("nbr"),
        F.row_number()
        .over(Window.partitionBy("src").orderBy("dst"))
        .alias("rnk"),
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    starts = raw.select(F.col("a").alias("start")).distinct()
    walks = starts.select(
        "start",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("walk_id"),
        F.col("start").alias("v0"),
    ).select("start", F.col("walk_id").cast("long").alias("walk_id"), "v0")
    cur = walks
    for s in range(3):
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col(f"v{s}"),
                            F.lit(str(s)),
                            F.col("walk_id"),
                            F.lit("rw"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("d")
            + 1
        )
        cur = (
            cur.join(deg, deg.v == F.col(f"v{s}"))
            .withColumn("pick", pick)
            .drop("v")
            .join(
                adj.select(
                    F.col("v").alias(f"v{s}"),
                    F.col("rnk").alias("pick"),
                    F.col("nbr").alias(f"v{s + 1}"),
                ),
                [f"v{s}", "pick"],
            )
            .drop("pick", "d")
        )
    return cur.select(
        "start", "walk_id", "v0", "v1", "v2", "v3"
    )


# --------------------------------------------------------------------------
# graph_walk_skipgram_pairs — DeepWalk pipeline stage 2
# --------------------------------------------------------------------------
@register(
    "graph_walk_skipgram_pairs",
    oracle=_walks_oracle().replace(
        """
    SELECT CAST(start AS BIGINT) AS start, walk_id, CAST(v0 AS BIGINT) AS v0, CAST(v1 AS BIGINT) AS v1, CAST(v2 AS BIGINT) AS v2, CAST(v3 AS BIGINT) AS v3 FROM w3""",
        """,
    pos AS (
      SELECT start, walk_id, 0 AS p, v0 AS v FROM w3
      UNION ALL SELECT start, walk_id, 1, v1 FROM w3
      UNION ALL SELECT start, walk_id, 2, v2 FROM w3
      UNION ALL SELECT start, walk_id, 3, v3 FROM w3
    )
    SELECT CAST(a.v AS BIGINT) AS center, CAST(b.v AS BIGINT) AS context,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pos a JOIN pos b
      ON b.start = a.start AND b.walk_id = a.walk_id
     AND b.p <> a.p AND abs(b.p - a.p) <= 2
    GROUP BY a.v, b.v""",
    ),
)
def graph_walk_skipgram_pairs_q(spark, sf_dir):
    """Skip-gram training pairs from the deterministic walk corpus —
    stage 2 of the DeepWalk pipeline (`graph_random_walks` generates the
    sentences; this is the word2vec windowing): every (center, context)
    vertex pair within window 2 inside a walk, aggregated with
    multiplicity — the exact table a Pandas-UDF embedding trainer consumes
    as (input, label, weight).  The oracle extends the SAME unrolled walk
    chain (one shared derivation, the `_STAR_ORACLE` sharing doctrine
    applied to a PIPELINE STAGE rather than a twin).

    100 TB shape: the window join is per-(walk) with fanout <= 2*window
    per position — walks are length-k rows, so pair generation is
    corpus-linear; the (center, context) agg collapses map-side on the
    vocabulary-pair key."""
    # materialized once: the 4 position projections would otherwise
    # re-execute the whole 3-join walk chain 4x (the _pareto/HITS lineage
    # doctrine; measured 35 exchanges -> 8)
    walks = graph_random_walks_q(spark, sf_dir).localCheckpoint(eager=True)
    pos = None
    for p in range(4):
        part = walks.select(
            "start", "walk_id", F.lit(p).alias("p"), F.col(f"v{p}").alias("v")
        )
        pos = part if pos is None else pos.unionByName(part)
    a = pos.select("start", "walk_id", F.col("p").alias("pa"), F.col("v").alias("center"))
    b = pos.select("start", "walk_id", F.col("p").alias("pb"), F.col("v").alias("context"))
    return (
        a.join(b, ["start", "walk_id"])
        .filter(
            (F.col("pb") != F.col("pa"))
            & (F.abs(F.col("pb") - F.col("pa")) <= 2)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# --------------------------------------------------------------------------
# embedding_distance_histogram — embedding-space collapse detection
# --------------------------------------------------------------------------
@register(
    "embedding_distance_histogram",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400
    ),
    n_vecs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM corpus),
    pairs AS (
      SELECT a.vec_id AS ia,
             ('0x' || substring(md5(CAST(a.vec_id AS VARCHAR) || '|'
                                    || CAST(k.k AS VARCHAR) || '|dh'), 1, 8))::BIGINT
               % nv.n AS ib
      FROM corpus a CROSS JOIN n_vecs nv, generate_series(0, 3) k(k)
    ),
    keep AS (SELECT DISTINCT ia, ib FROM pairs WHERE ia <> ib),
    qa AS (
      SELECT vec_id, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM corpus, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    ),
    dists AS (
      SELECT p.ia, p.ib,
             CAST(SUM((x.v - y.v) * (x.v - y.v)) AS BIGINT) AS d2
      FROM keep p
      JOIN qa x ON x.vec_id = p.ia
      JOIN qa y ON y.vec_id = p.ib AND y.i = x.i
      GROUP BY p.ia, p.ib
    )
    SELECT CAST(length(CAST(d2 AS VARCHAR)) AS BIGINT) AS digits,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(d2) AS BIGINT) AS min_d2,
           CAST(MAX(d2) AS BIGINT) AS max_d2
    FROM dists GROUP BY digits
    """,
)
def embedding_distance_histogram_q(spark, sf_dir):
    """Embedding-space geometry health check: quantized squared-L2
    distances over a DETERMINISTIC hash-sampled pair set (4 draws per
    vector via the md5 ring, the `sample_negatives_hash` machinery),
    bucketed by digit count — a COLLAPSED embedding space (all vectors
    near one point, the classic contrastive-training failure) shows the
    histogram's mass crashing into low buckets, while healthy spaces
    spread.  Distances are the same HALF_UP-quantized int64 as the ANN
    chain, so the histogram is bit-comparable with every similarity
    rung's internal scores.

    100 TB shape: pair sampling is corpus-linear (4 ids per vector, NO
    quadratic pair set); each sampled pair costs one keyed join to fetch
    the partner vector and an in-row zip_with fold; the histogram
    collapses to ~10 buckets map-side."""
    from ..operators.similarity import quantize_vec

    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400).select(
        "vec_id", quantize_vec(F.col("embedding")).alias("qv")
    ).localCheckpoint(eager=True)
    nv = em.agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        em.select("vec_id")
        .crossJoin(F.broadcast(nv))
        .select(
            F.col("vec_id").alias("ia"),
            F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k"),
            "n",
        )
        .select(
            "ia",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("ia"), F.col("k"), F.lit("dh"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("ib"),
        )
        .filter(F.col("ia") != F.col("ib"))
        .distinct()  # two draws can hit the same partner; pairs are a SET
    )
    x = em.select(F.col("vec_id").alias("ia"), F.col("qv").alias("qa"))
    y = em.select(F.col("vec_id").alias("ib"), F.col("qv").alias("qb"))
    dists = (
        pairs.join(x, "ia")
        .join(y, "ib")
        .select(
            F.aggregate(
                F.zip_with("qa", "qb", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d2")
        )
    )
    return dists.groupBy(
        F.length(F.col("d2").cast("string")).cast("long").alias("digits")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("d2").alias("min_d2"),
        F.max("d2").alias("max_d2"),
    )


# --------------------------------------------------------------------------
# graph_biased_walks — node2vec-style second-order weighted walks
# --------------------------------------------------------------------------
def _biased_walks_oracle(n_biased: int = 2) -> str:
    """Unrolled second-order walk chain: step 0 is the uniform pick; each
    biased step weighs candidates 1 (return to prev) / 4 (triangle-closing
    neighbor of prev) / 2 (exploration), cumsums them in neighbor order,
    and selects by md5 mod total-weight."""
    head = """
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS a, 100000 + l_partkey % 1500 AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
    adj AS (
      SELECT src AS v, dst AS nbr,
             row_number() OVER (PARTITION BY src ORDER BY dst) AS rnk
      FROM und
    ),
    deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY v),
    w0 AS (
      SELECT a AS start, CAST(k AS BIGINT) AS walk_id, a AS v0
      FROM (SELECT DISTINCT a FROM raw), generate_series(0, 1) t(k)
    ),
    w1 AS (
      SELECT w.start, w.walk_id, w.v0, a.nbr AS v1
      FROM w0 w
      JOIN deg ON deg.v = w.v0
      JOIN adj a ON a.v = w.v0
       AND a.rnk = 1 + ('0x' || substring(md5(
             CAST(w.v0 AS VARCHAR) || '|0|' || CAST(w.walk_id AS VARCHAR)
             || '|bw'), 1, 8))::BIGINT % deg.d
    )"""
    parts = [head]
    for s in range(n_biased):
        prev, cur, nxt = f"v{s}", f"v{s + 1}", f"v{s + 2}"
        carried = ", ".join(f"w.v{i}" for i in range(s + 2))
        parts.append(
            f""",
    cand{s} AS (
      SELECT {carried}, w.start, w.walk_id, a.nbr,
             CASE WHEN a.nbr = w.{prev} THEN 1
                  WHEN e.src IS NOT NULL THEN 4
                  ELSE 2 END AS wt
      FROM w{s + 1} w
      JOIN adj a ON a.v = w.{cur}
      LEFT JOIN und e ON e.src = w.{prev} AND e.dst = a.nbr
    ),
    cum{s} AS (
      SELECT *,
             SUM(wt) OVER (PARTITION BY start, walk_id ORDER BY nbr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(wt) OVER (PARTITION BY start, walk_id) AS tw
      FROM cand{s}
    ),
    w{s + 2} AS (
      SELECT {carried.replace('w.', '')}, start, walk_id, nbr AS {nxt}
      FROM cum{s} w
      WHERE cw > ('0x' || substring(md5(
              CAST({prev} AS VARCHAR) || '|' || CAST({cur} AS VARCHAR)
              || '|{s + 1}|' || CAST(walk_id AS VARCHAR) || '|bw'), 1, 8))::BIGINT
              % tw
        AND cw - wt <= ('0x' || substring(md5(
              CAST({prev} AS VARCHAR) || '|' || CAST({cur} AS VARCHAR)
              || '|{s + 1}|' || CAST(walk_id AS VARCHAR) || '|bw'), 1, 8))::BIGINT
              % tw
    )"""
        )
    cols = ", ".join(f"CAST(v{i} AS BIGINT) AS v{i}" for i in range(n_biased + 2))
    parts.append(
        f"""
    SELECT CAST(start AS BIGINT) AS start, walk_id, {cols}
    FROM w{n_biased + 1}"""
    )
    return "".join(parts)


@register("graph_biased_walks", oracle=_biased_walks_oracle())
def graph_biased_walks_q(spark, sf_dir):
    """node2vec-style SECOND-ORDER biased walks (Grover & Leskovec 2016):
    after a uniform first hop, each step at (prev, cur) weighs cur's
    neighbors by their relation to prev — integer weights 1 (return), 4
    (triangle-closing neighbor of prev — the BFS-ish pull), 2 (pure
    exploration) — and selects via md5 mod total-weight against the
    running weight sum in neighbor order (the alias-table draw
    re-expressed as a prefix-sum scan, exactly the trick that makes a
    WEIGHTED categorical draw hash-deterministic and engine-portable).
    `graph_random_walks`' uniform sampler is the p=q=1 degenerate case;
    here the walk distribution actually depends on the previous step —
    the property that makes node2vec embeddings tunable.

    100 TB shape: each biased step = one adjacency join (candidates,
    fanout deg(cur)) + one edge-membership LEFT join keyed on (prev,
    nbr) + two windows on the walk partitioning + the pick filter —
    all co-partitioned; candidate fanout at hubs is the cost (the same
    hub economics as every wedge operator, and nprobe-style capping
    composes if needed)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    adj = und.select(
        F.col("src").alias("v"),
        F.col("dst").alias("nbr"),
        F.row_number().over(Window.partitionBy("src").orderBy("dst")).alias("rnk"),
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    starts = raw.select(F.col("a").alias("start")).distinct()
    w1pick = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("v0"), F.lit("0"), F.col("walk_id"), F.lit("bw"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.col("d")
        + 1
    )
    cur = (
        starts.select(
            "start",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("walk_id"),
            F.col("start").alias("v0"),
        )
        .select("start", F.col("walk_id").cast("long").alias("walk_id"), "v0")
        .join(deg, deg.v == F.col("v0"))
        .withColumn("pick", w1pick)
        .drop("v", "d")
        .join(
            adj.select(
                F.col("v").alias("v0"), F.col("rnk").alias("pick"), F.col("nbr").alias("v1")
            ),
            ["v0", "pick"],
        )
        .drop("pick")
    )
    for s in range(2):
        prev, c, nxt = f"v{s}", f"v{s + 1}", f"v{s + 2}"
        cand = (
            cur.join(
                adj.select(F.col("v").alias(c), "nbr"), c
            )
            .join(
                und.select(
                    F.col("src").alias(prev), F.col("dst").alias("nbr"), F.lit(1).alias("shared")
                ),
                [prev, "nbr"],
                "left",
            )
            .withColumn(
                "wt",
                F.when(F.col("nbr") == F.col(prev), F.lit(1))
                .when(F.col("shared").isNotNull(), F.lit(4))
                .otherwise(F.lit(2))
                .cast("long"),
            )
            .drop("shared")
        )
        wp = Window.partitionBy("start", "walk_id")
        cum = cand.select(
            "*",
            F.sum("wt").over(wp.orderBy("nbr").rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
            F.sum("wt").over(wp).alias("tw"),
        )
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col(prev),
                            F.col(c),
                            F.lit(str(s + 1)),
                            F.col("walk_id"),
                            F.lit("bw"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("tw")
        )
        cur = (
            cum.filter((F.col("cw") > pick) & (F.col("cw") - F.col("wt") <= pick))
            .withColumnRenamed("nbr", nxt)
            .drop("wt", "cw", "tw")
        )
    return cur.select("start", "walk_id", "v0", "v1", "v2", "v3")


# --------------------------------------------------------------------------
# embedding_farthest_point_init — deterministic k-center / k-means++ seeds
# --------------------------------------------------------------------------
def _fpi_oracle(n_rounds: int = 3) -> str:
    """Unrolled farthest-point traversal: seed 0 is the min vec_id; each
    round adds the point maximizing its distance to the NEAREST chosen
    seed (ties to the smaller id)."""
    head = """
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
    ),
    q AS (
      SELECT vec_id, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM corpus, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    ),
    s0 AS (SELECT MIN(vec_id) AS seed FROM corpus),
    seeds0 AS (SELECT seed, 0 AS round FROM s0)"""
    parts = [head]
    for r in range(1, n_rounds + 1):
        parts.append(
            f""",
    d{r} AS (
      SELECT x.vec_id, MIN(dd.d2) AS near_d2
      FROM (SELECT DISTINCT vec_id FROM q
            WHERE vec_id NOT IN (SELECT seed FROM seeds{r - 1})) x
      JOIN (
        SELECT a.vec_id, s.seed,
               CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
        FROM q a
        JOIN seeds{r - 1} s ON TRUE
        JOIN q b ON b.vec_id = s.seed AND b.i = a.i
        GROUP BY a.vec_id, s.seed
      ) dd ON dd.vec_id = x.vec_id
      GROUP BY x.vec_id
    ),
    pick{r} AS (
      SELECT vec_id AS seed, {r} AS round FROM d{r}
      ORDER BY near_d2 DESC, vec_id ASC LIMIT 1
    ),
    seeds{r} AS (
      SELECT seed, round FROM seeds{r - 1}
      UNION ALL SELECT seed, round FROM pick{r}
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(seed AS BIGINT) AS seed, CAST(round AS BIGINT) AS round
    FROM seeds{n_rounds}"""
    )
    return "".join(parts)


@register("embedding_farthest_point_init", oracle=_fpi_oracle())
def embedding_farthest_point_init_q(spark, sf_dir):
    """Deterministic farthest-point initialization (Gonzalez k-center /
    the deterministic cousin of k-means++ seeding): seed 0 is the
    smallest id, each of 3 rounds adds the vector farthest from its
    NEAREST already-chosen seed — argmax by (min-distance DESC, id ASC),
    the deterministic-argmax doctrine, on the same HALF_UP-quantized
    int64 distances as the ANN chain.  This is the coverage-maximizing
    seed set that makes `cluster_kmeans` / IVF training reproducible
    (random init is exactly what the no-RNG doctrine forbids), and
    Gonzalez's guarantee (2-approx for k-center) comes with it.

    100 TB shape: the bounded-driver-loop doctrine (BPE/PageRank/kmeans):
    per round, distances to <= k seeds are an in-row fold over a
    BROADCAST seed matrix (corpus never shuffles), the argmax is
    orderBy().limit(1) — TakeOrdered, one row collected per round, k
    rounds total."""
    from ..operators.similarity import quantize_vec

    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300).select(
        "vec_id", quantize_vec(F.col("embedding")).alias("qv")
    ).localCheckpoint(eager=True)
    first = em.orderBy("vec_id").limit(1).collect()[0]
    seeds = [(int(first["vec_id"]), 0, list(first["qv"]))]
    for r in range(1, 4):
        seed_arr = F.array(
            *[
                F.array(*[F.lit(int(x)) for x in qv])
                for (_, _, qv) in seeds
            ]
        )
        chosen_ids = [s for (s, _, _) in seeds]
        near = em.filter(~F.col("vec_id").isin(chosen_ids)).select(
            "vec_id",
            F.array_min(
                F.transform(
                    seed_arr,
                    lambda s: F.aggregate(
                        F.zip_with(F.col("qv"), s, lambda a, b: (a - b) * (a - b)),
                        F.lit(0).cast("long"),
                        lambda acc, v: acc + v,
                    ),
                )
            ).alias("near_d2"),
        )
        pick = near.orderBy(F.desc("near_d2"), F.asc("vec_id")).limit(1).collect()[0]
        chosen = em.filter(F.col("vec_id") == int(pick["vec_id"])).collect()[0]
        seeds.append((int(chosen["vec_id"]), r, list(chosen["qv"])))
    return spark.createDataFrame(
        [(s, r) for (s, r, _) in seeds], "seed long, round long"
    )


# --------------------------------------------------------------------------
# cluster_kmeans_inertia_ab — seed-quality A/B, measured not assumed
# --------------------------------------------------------------------------
@register(
    "cluster_kmeans_inertia_ab",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
    ),
    q AS (
      SELECT vec_id, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM corpus, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    ),
    s0 AS (SELECT MIN(vec_id) AS seed FROM corpus),
    seeds0 AS (SELECT seed, 0 AS round FROM s0),
    d1 AS (
      SELECT x.vec_id, MIN(dd.d2) AS near_d2
      FROM (SELECT DISTINCT vec_id FROM q
            WHERE vec_id NOT IN (SELECT seed FROM seeds0)) x
      JOIN (
        SELECT a.vec_id, s.seed,
               CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
        FROM q a JOIN seeds0 s ON TRUE
        JOIN q b ON b.vec_id = s.seed AND b.i = a.i
        GROUP BY a.vec_id, s.seed
      ) dd ON dd.vec_id = x.vec_id GROUP BY x.vec_id
    ),
    pick1 AS (SELECT vec_id AS seed, 1 AS round FROM d1
              ORDER BY near_d2 DESC, vec_id ASC LIMIT 1),
    seeds1 AS (SELECT * FROM seeds0 UNION ALL SELECT * FROM pick1),
    d2r AS (
      SELECT x.vec_id, MIN(dd.d2) AS near_d2
      FROM (SELECT DISTINCT vec_id FROM q
            WHERE vec_id NOT IN (SELECT seed FROM seeds1)) x
      JOIN (
        SELECT a.vec_id, s.seed,
               CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
        FROM q a JOIN seeds1 s ON TRUE
        JOIN q b ON b.vec_id = s.seed AND b.i = a.i
        GROUP BY a.vec_id, s.seed
      ) dd ON dd.vec_id = x.vec_id GROUP BY x.vec_id
    ),
    pick2 AS (SELECT vec_id AS seed, 2 AS round FROM d2r
              ORDER BY near_d2 DESC, vec_id ASC LIMIT 1),
    seeds2 AS (SELECT * FROM seeds1 UNION ALL SELECT * FROM pick2),
    pick3 AS (
      SELECT vec_id AS seed, 3 AS round FROM (
        SELECT x.vec_id, MIN(dd.d2) AS near_d2
        FROM (SELECT DISTINCT vec_id FROM q
              WHERE vec_id NOT IN (SELECT seed FROM seeds2)) x
        JOIN (
          SELECT a.vec_id, s.seed,
                 CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
          FROM q a JOIN seeds2 s ON TRUE
          JOIN q b ON b.vec_id = s.seed AND b.i = a.i
          GROUP BY a.vec_id, s.seed
        ) dd ON dd.vec_id = x.vec_id GROUP BY x.vec_id
      ) ORDER BY near_d2 DESC, vec_id ASC LIMIT 1
    ),
    fpi AS (
      SELECT seed FROM seeds2 UNION ALL SELECT seed FROM pick3
    ),
    naive AS (
      SELECT vec_id AS seed FROM corpus ORDER BY vec_id LIMIT 4
    ),
    inertia AS (
      SELECT 'fpi' AS seeding,
             CAST(SUM(near) AS BIGINT) AS inertia
      FROM (
        SELECT a.vec_id, MIN(
          (SELECT CAST(SUM((x.v - y.v) * (x.v - y.v)) AS BIGINT)
           FROM q x JOIN q y ON y.vec_id = s.seed AND y.i = x.i
           WHERE x.vec_id = a.vec_id)) AS near
        FROM (SELECT DISTINCT vec_id FROM q) a CROSS JOIN fpi s
        GROUP BY a.vec_id
      )
      UNION ALL
      SELECT 'naive',
             CAST(SUM(near) AS BIGINT)
      FROM (
        SELECT a.vec_id, MIN(
          (SELECT CAST(SUM((x.v - y.v) * (x.v - y.v)) AS BIGINT)
           FROM q x JOIN q y ON y.vec_id = s.seed AND y.i = x.i
           WHERE x.vec_id = a.vec_id)) AS near
        FROM (SELECT DISTINCT vec_id FROM q) a CROSS JOIN naive s
        GROUP BY a.vec_id
      )
    )
    SELECT seeding, inertia FROM inertia
    """,
)
def cluster_kmeans_inertia_ab_q(spark, sf_dir):
    """Seed-quality A/B, measured not assumed: total inertia (sum over
    the corpus of squared distance to the nearest seed) under
    `embedding_farthest_point_init`'s 4 seeds VS the naive first-4-ids
    seeding — the two-row table that justifies paying for coverage-aware
    initialization (the OPQ-vs-PQ recall-A/B doctrine applied to
    clustering).  All distances the ANN chain's HALF_UP int64; both
    seeding's inertias exact, so the comparison is a pure integer
    ordering, hash-gated.

    100 TB shape: both inertia passes are in-row folds over a broadcast
    4-seed matrix (corpus never shuffles) + one global sum; the FPI
    seed derivation is the bounded driver loop documented on the
    operator."""
    from ..operators.similarity import quantize_vec

    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300).select(
        "vec_id", quantize_vec(F.col("embedding")).alias("qv")
    ).localCheckpoint(eager=True)
    fpi_seeds = [
        int(r["seed"])
        for r in embedding_farthest_point_init_q(spark, sf_dir).collect()
    ]
    naive_seeds = [
        int(r["vec_id"]) for r in em.orderBy("vec_id").limit(4).collect()
    ]
    seed_vecs = {
        int(r["vec_id"]): list(r["qv"])
        for r in em.filter(F.col("vec_id").isin(fpi_seeds + naive_seeds)).collect()
    }

    def inertia(seed_ids, label):
        arr = F.array(
            *[F.array(*[F.lit(int(x)) for x in seed_vecs[s]]) for s in seed_ids]
        )
        near = em.select(
            F.array_min(
                F.transform(
                    arr,
                    lambda s: F.aggregate(
                        F.zip_with(F.col("qv"), s, lambda a, b: (a - b) * (a - b)),
                        F.lit(0).cast("long"),
                        lambda acc, v: acc + v,
                    ),
                )
            ).alias("near")
        )
        return near.agg(F.sum("near").cast("long").alias("inertia")).select(
            F.lit(label).alias("seeding"), "inertia"
        )

    return inertia(fpi_seeds, "fpi").unionByName(inertia(naive_seeds, "naive"))


# --------------------------------------------------------------------------
# embedding_label_separation — class-separability audit on sampled pairs
# --------------------------------------------------------------------------
@register(
    "embedding_label_separation",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 400
    ),
    n_vecs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM corpus),
    pairs AS (
      SELECT DISTINCT a.vec_id AS ia,
             ('0x' || substring(md5(CAST(a.vec_id AS VARCHAR) || '|'
                                    || CAST(k.k AS VARCHAR) || '|ls'), 1, 8))::BIGINT
               % nv.n AS ib
      FROM corpus a CROSS JOIN n_vecs nv, generate_series(0, 3) k(k)
    ),
    keep AS (SELECT ia, ib FROM pairs WHERE ia <> ib),
    q AS (
      SELECT vec_id, label, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM corpus, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    ),
    dists AS (
      SELECT p.ia, p.ib,
             MIN(x.label) = MIN(y.label) AS same_label,
             CAST(SUM((x.v - y.v) * (x.v - y.v)) AS BIGINT) AS d2
      FROM keep p
      JOIN q x ON x.vec_id = p.ia
      JOIN q y ON y.vec_id = p.ib AND y.i = x.i
      GROUP BY p.ia, p.ib
    )
    SELECT same_label,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(d2) AS BIGINT) AS sum_d2,
           CAST(MIN(d2) AS BIGINT) AS min_d2,
           CAST(MAX(d2) AS BIGINT) AS max_d2
    FROM dists GROUP BY same_label
    """,
)
def embedding_label_separation_q(spark, sf_dir):
    """Class-separability audit: over the deterministic md5-ring pair
    sample, squared distances split by SAME-label vs CROSS-label — a
    useful embedding has cross-label mean distance well above same-label
    (the Fisher-criterion numerator/denominator as exact sums; the
    consumer's ratio sum_d2·n_other vs sum_d2_other·n is a pure integer
    comparison).  The supervised companion of
    `embedding_distance_histogram`'s unsupervised collapse check —
    together they answer 'is the space healthy' and 'does it know the
    labels'.

    100 TB shape: identical sampling economics to the histogram (4
    draws/vector, never quadratic); labels ride the sampled rows; the
    two-group rollup is map-side."""
    from ..operators.similarity import quantize_vec

    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400).select(
        "vec_id", "label", quantize_vec(F.col("embedding")).alias("qv")
    ).localCheckpoint(eager=True)
    nv = em.agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        em.select("vec_id")
        .crossJoin(F.broadcast(nv))
        .select(
            F.col("vec_id").alias("ia"),
            F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k"),
            "n",
        )
        .select(
            "ia",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("ia"), F.col("k"), F.lit("ls"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("ib"),
        )
        .filter(F.col("ia") != F.col("ib"))
        .distinct()
    )
    x = em.select(
        F.col("vec_id").alias("ia"), F.col("label").alias("la"), F.col("qv").alias("qa")
    )
    y = em.select(
        F.col("vec_id").alias("ib"), F.col("label").alias("lb"), F.col("qv").alias("qb")
    )
    dists = (
        pairs.join(x, "ia")
        .join(y, "ib")
        .select(
            (F.col("la") == F.col("lb")).alias("same_label"),
            F.aggregate(
                F.zip_with("qa", "qb", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
    )
    return dists.groupBy("same_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("d2").cast("long").alias("sum_d2"),
        F.min("d2").alias("min_d2"),
        F.max("d2").alias("max_d2"),
    )


# --------------------------------------------------------------------------
# embedding_dim_minmax_params — scaler fitting as a query
# --------------------------------------------------------------------------
@register(
    "embedding_dim_minmax_params",
    oracle="""
    WITH q AS (
      SELECT vec_id, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM embeddings, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    )
    SELECT CAST(i AS BIGINT) AS dim,
           CAST(MIN(v) AS BIGINT) AS min_q,
           CAST(MAX(v) AS BIGINT) AS max_q,
           CAST(MAX(v) - MIN(v) AS BIGINT) AS range_q,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM q GROUP BY i
    """,
)
def embedding_dim_minmax_params_q(spark, sf_dir):
    """Min-max scaler parameters per embedding dimension — preprocessing
    FIT as a catalog query: the (min, max, range) every normalizer needs,
    on the same HALF_UP-quantized grid as the ANN chain so the fitted
    transform composes bit-exactly with every downstream similarity rung.
    A zero range flags a dead dimension (constant output — the per-dim
    sibling of `embedding_norm_profile`'s zero-vector check); fitting
    params in-engine means train- and serve-time transforms read ONE
    table instead of re-deriving constants in two codebases.

    100 TB shape: posexplode to (dim, value) then a 64-group min/max agg
    — fully map-side combinable; at corpus tier the explode swaps for
    64 in-row element_at aggregates (same contract, zero fanout)."""
    from ..operators.similarity import quantize_vec

    q = _t(spark, sf_dir, "embeddings").select(
        F.posexplode(quantize_vec(F.col("embedding"))).alias("pos", "v")
    )
    return q.groupBy((F.col("pos") + 1).cast("long").alias("dim")).agg(
        F.min("v").cast("long").alias("min_q"),
        F.max("v").cast("long").alias("max_q"),
        (F.max("v") - F.min("v")).cast("long").alias("range_q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


# --------------------------------------------------------------------------
# graph_degree_gini — hub inequality of the degree sequence
# --------------------------------------------------------------------------
@register(
    "graph_degree_gini",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS a, 100000 + l_partkey % 1500 AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
    deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY src),
    ranked AS (
      SELECT d, row_number() OVER (ORDER BY d, v) AS i FROM deg
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(SUM(d) AS BIGINT) AS sum_deg,
           CAST(MAX(d) AS BIGINT) AS max_deg,
           CAST(2 * SUM(i * d) - (COUNT(*) + 1) * SUM(d) AS BIGINT)
             AS gini_num,
           CAST(COUNT(*) * SUM(d) AS BIGINT) AS gini_den,
           CAST(1000000::HUGEINT
                * (2 * SUM(i * d) - (COUNT(*) + 1) * SUM(d))
                // (COUNT(*)::HUGEINT * SUM(d)) AS BIGINT) AS gini_ppm
    FROM ranked
    """,
)
def graph_degree_gini_q(spark, sf_dir):
    """Degree-sequence Gini — hub inequality as ONE number: the exact
    integer rank identity (`agg_gini_concentration`'s machinery) applied
    to the co-purchase degree distribution.  A near-0 Gini means a
    regular graph where per-vertex partitioning balances for free; a
    high Gini quantifies exactly the skew every hub-cap in this repo
    defends against — the number that justifies the caps
    (`graph_degree_stats` profiles the distribution; this scalarizes it
    for cross-corpus comparison).  The ppm runs in 38-digit arithmetic
    (DECIMAL/HUGEINT) per the overflow discipline.

    100 TB shape: one degree agg, one vertex-cardinality ranking window,
    one global fold — graph-order cost, not edge order."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ranked = deg.select(
        "d", F.row_number().over(Window.orderBy("d", "v")).alias("i")
    )
    n, s, t = F.count(F.lit(1)), F.sum("d"), F.sum(F.col("i") * F.col("d"))
    return ranked.agg(
        n.cast("long").alias("n_vertices"),
        s.cast("long").alias("sum_deg"),
        F.max("d").alias("max_deg"),
        (2 * t - (n + 1) * s).cast("long").alias("gini_num"),
        (n * s).cast("long").alias("gini_den"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(7,0))"
            " * CAST(2*sum(i*d) - (count(1)+1)*sum(d) AS DECIMAL(19,0)))"
            " DIV (CAST(count(1) AS DECIMAL(19,0))"
            " * CAST(sum(d) AS DECIMAL(19,0))) AS BIGINT)"
        ).alias("gini_ppm"),
    )


# --------------------------------------------------------------------------
# graph_modularity_audit — measured quality of the detected communities
# --------------------------------------------------------------------------
@register(
    "graph_modularity_audit",
    oracle=__import__(
        "cell_kn_mvp_etl_ontologies_spark.catalog.analytics", fromlist=["_lpa_oracle"]
    )._lpa_oracle().replace(
        """
    SELECT v, CAST(lab AS BIGINT) AS lab FROM lbl3""",
        """,
    undirected AS (SELECT a, b FROM raw),
    m_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM undirected),
    internal AS (
      SELECT la.lab, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM undirected e
      JOIN lbl3 la ON la.v = e.a
      JOIN lbl3 lb ON lb.v = e.b AND lb.lab = la.lab
      GROUP BY la.lab
    ),
    degs AS (
      SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d
      FROM sym GROUP BY src
    ),
    comm_deg AS (
      SELECT l.lab, CAST(SUM(d.d) AS BIGINT) AS d_c
      FROM lbl3 l JOIN degs d ON d.v = l.v
      GROUP BY l.lab
    ),
    rollup AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
             CAST(SUM(COALESCE(i.e_c, 0)) AS BIGINT) AS sum_internal,
             CAST(SUM(c.d_c * c.d_c) AS BIGINT) AS sum_deg_sq
      FROM comm_deg c LEFT JOIN internal i ON i.lab = c.lab
    )
    SELECT r.n_communities, r.sum_internal, r.sum_deg_sq, t.m,
           CAST(4 * t.m * r.sum_internal - r.sum_deg_sq AS BIGINT) AS q_num,
           CAST(4 * t.m * t.m AS BIGINT) AS q_den
    FROM rollup r, m_tot t""",
    ),
)
def graph_modularity_audit_q(spark, sf_dir):
    """Modularity of the detected communities — MEASURED quality for
    `graph_label_propagation`'s output (the recall-audit doctrine applied
    to community detection: 'LPA found communities' becomes 'the
    partition scores Q = q_num/q_den against the null model').  The
    float-free identity: Q·4m² = 4m·Σe_c − Σd_c² over the TRUE undirected
    edge set (the unit self-loops that damp LPA's bipartite 2-cycle are a
    solver device and are excluded from the scored graph); degrees from
    the symmetric edge list.  The oracle EXTENDS the shared unrolled-LPA
    chain — one derivation, two consumers (the skipgram/walks sharing
    pattern).

    100 TB shape: two label joins on the edge list + two tiny rollups on
    top of the LPA rounds the base operator already pays for."""
    from ..plans.graph_query import label_propagation

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct().localCheckpoint(eager=True)
    labels = label_propagation(
        raw.select(F.col("a").alias("src"), F.col("b").alias("dst")), n_rounds=3
    ).localCheckpoint(eager=True)
    m_tot = raw.agg(F.count(F.lit(1)).cast("long").alias("m"))
    internal = (
        raw.join(labels.select(F.col("v").alias("a"), F.col("lab").alias("la")), "a")
        .join(labels.select(F.col("v").alias("b"), F.col("lab").alias("lb")), "b")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lab"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_c"))
    )
    sym = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    degs = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    comm_deg = labels.join(degs, "v").groupBy("lab").agg(
        F.sum("d").cast("long").alias("d_c")
    )
    rollup = (
        comm_deg.join(internal, "lab", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.sum(F.coalesce(F.col("e_c"), F.lit(0))).cast("long").alias(
                "sum_internal"
            ),
            F.sum(F.col("d_c") * F.col("d_c")).cast("long").alias("sum_deg_sq"),
        )
    )
    return rollup.crossJoin(F.broadcast(m_tot)).select(
        "n_communities",
        "sum_internal",
        "sum_deg_sq",
        "m",
        (4 * F.col("m") * F.col("sum_internal") - F.col("sum_deg_sq"))
        .cast("long")
        .alias("q_num"),
        (4 * F.col("m") * F.col("m")).cast("long").alias("q_den"),
    )
