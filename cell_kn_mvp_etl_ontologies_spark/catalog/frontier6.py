"""Round-9 extension batch: probabilistic-forecast scoring, the uplift
corner completed, directed-graph structure, and two production-path
twins of existing gate tiers (SURVEY §2.12, §2.11).

- `eval_brier_score` — Brier score of a ppm probability column against a
  binary outcome, with the climatology reference and the Brier skill
  score: the PROPER scoring rule the calibration family
  (`eval_calibration_ece`/`_bins`) diagnoses but never totals.  Integer
  e12/milli units end-to-end.
- `eval_uplift_auuc` — area under `eval_uplift_qini`'s curve (AUUC, 2×
  trapezoid in exact milli·row units) plus the random-targeting baseline
  area: the single-scalar decision metric campaign papers report, built
  ON the registered qini table so the two contracts cannot drift.
- `stream_uplift_maintain` — the uplift monitor as incremental view
  maintenance: additive (score-bucket × arm) histogram state, qini over
  bucket cuts derived at read time (row-ntile deciles are not
  batch-additive; the histogram is the IVM-legitimate statistic).
- `graph_scc` — strongly connected components of a BOUNDED directed
  slice via path-doubling transitive closure + mutual-reachability min
  label: the directed companion of `dedup_connected_components`
  (undirected CC), exact gate tier; production = forward-backward
  coloring, documented.
- `graph_condensation` — the SCC quotient DAG (calls the registered
  `graph_scc`; acyclic by the SCC theorem, DFS-3-coloring-verified).
- `graph_dag_depth` — ontology-hierarchy depth + ancestor counts via
  MAX-PLUS path doubling over a by-construction-acyclic slice — the
  subClassOf-navigation primitive (OntologyGraphBuilder.java's DAGs).
- `eval_kendall_tau_full` — Kendall τ_a over ALL entities with NO
  all-pairs join: exact 2D dominance counting on a strict-CDF grid,
  O(|x-values|·n) vs the gate tier's O(slice²) census.
- `eval_spearman_rescaled` — the documented large-n Spearman path
  (Σd² DIV n before the 6e6 blowup, int64-safe to n ≈ 2.5e7) as its own
  gated contract.

Continuation batch (same round): the retrieval-eval threshold family
(`eval_pr_curve`, `eval_average_precision`, `stream_pr_curve_maintain` —
the curve as IVM over the batch-additive (group, score) census),
`eval_pairwise_winrate` (paired model comparison census),
`eval_wilcoxon_signed_rank` (doubled-midrank exact paired shift test),
`eval_kendall_tau_bucketed` (the guard-named bucketed-x + boundary-strip
fallback, gated on the same O(n²) census), the LLM training-data ops
(`pairs_dpo_dataset` outside-in preference pairing,
`pack_attention_spans` block-diagonal mask metadata,
`fn_chat_truncate_budget` maximal-fitting-suffix truncation,
`sample_allocation_largest_remainder` Hamilton apportionment),
`profile_moments` (pivot-centered exact central-moment numerators), and
the graph tier completions (`graph_scc_fb` + `graph_dag_depth_frontier`
production twins gated on their gate tiers' oracles,
`graph_dag_lca_similarity` Wu-Palmer term similarity,
`graph_betweenness_bounded` k≤6 betweenness via aggregated walk counts
vs a walk-enumerating oracle, `graph_eccentricity_bounded` on the same
distance table), `eval_rank_biased_overlap` (RBO@10, hardcoded integer
geometric weights, max-rank census), and `stream_allocation_maintain`
(the Hamilton apportionment as IVM over the additive token census).

Shared doctrines: integer/rational identities, sign-decomposed or
subtraction-only signed stats, quadratic cost only on contract-bounded
eval slices, production paths differentially gated against the same
oracles as their gate tiers.  Engine trap pinned this round: DuckDB
1.0.0 drops UNION's dedup for NON-recursive CTEs inside a WITH
RECURSIVE block (measured; explicit DISTINCT required — see
`graph_dag_lca_similarity`'s oracle).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import commit_state_parquet, load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# packer corpus SQL shared with catalog.training (imported lazily at module
# load: the training module is always registered before frontier6 in load_all)
from .training import _PACK_CORPUS_SQL as _PACK_CORPUS_SQL_F6  # noqa: E402


# --------------------------------------------------------------------------
# eval_brier_score — proper scoring rule + climatology skill
# --------------------------------------------------------------------------
@register(
    "eval_brier_score",
    oracle="""
    WITH scored AS (
      SELECT
        CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) AS p_ppm,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM((p_ppm - 1000000 * y) * (p_ppm - 1000000 * y)) AS BIGINT)
               AS sse_e12
      FROM scored
    )
    SELECT n, pos,
           CAST(sse_e12 // n AS BIGINT) AS brier_e12,
           CAST((1000000 * pos // n) * (1000000 * (n - pos) // n) AS BIGINT)
             AS brier_ref_e12,
           CAST(CASE
             WHEN (1000000 * pos // n) * (1000000 * (n - pos) // n) = 0 THEN 0
             WHEN (1000000 * pos // n) * (1000000 * (n - pos) // n) >= sse_e12 // n
             THEN 1000 * ((1000000 * pos // n) * (1000000 * (n - pos) // n)
                          - sse_e12 // n)
                  // ((1000000 * pos // n) * (1000000 * (n - pos) // n))
             ELSE -(1000 * (sse_e12 // n
                            - (1000000 * pos // n) * (1000000 * (n - pos) // n))
                  // ((1000000 * pos // n) * (1000000 * (n - pos) // n)))
           END AS BIGINT) AS bss_milli
    FROM agg
    """,
)
def eval_brier_score_q(spark, sf_dir):
    """Brier score of the English-ness ppm score against the lang='en'
    outcome — the PROPER scoring rule that the calibration diagram and
    ECE diagnose but never total: BS = mean((p − y)²), here in e12 units
    (p in ppm, y in {0, 1e6}).  Alongside it the climatology reference
    BS_ref = ȳ(1 − ȳ) (the score of always forecasting the base rate)
    and the Brier SKILL score BSS = 1 − BS/BS_ref in milli — BSS > 0
    means the score beats the base-rate forecast, the single number a
    screening model must clear before its calibration is worth reading.

    Exactness: SSE is a BIGINT sum of squared ppm residuals (≤ 1e12 per
    row — int64-safe to ~9e6 rows; document-scale slices beyond that
    pre-aggregate per shard).  BS_ref uses the ppm-GRID climatology
    ⌊1e6·ȳ⌋·⌊1e6·(1−ȳ)⌋ — each factor ≤ 1e6 so the product never
    overflows at ANY n (the exact 1e12·pos·(n−pos)/n² form overflows
    int64 once n > ~6k); both engines truncate to the same grid point,
    so the contract stays hash-exact.  BSS is sign-decomposed (the
    frontier4 doctrine — it IS negative when the score is worse than
    climatology).

    100 TB shape: one codegen projection + one 3-cell aggregate —
    single pass, map-side combinable, 1-row reduce."""
    scored = _t(spark, sf_dir, "documents").select(
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("p_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        F.sum(
            (F.col("p_ppm") - 1000000 * F.col("y"))
            * (F.col("p_ppm") - 1000000 * F.col("y"))
        )
        .cast("long")
        .alias("sse_e12"),
    )
    ref = "(1000000 * pos DIV n) * (1000000 * (n - pos) DIV n)"
    return agg.select(
        "n",
        "pos",
        F.expr("CAST(sse_e12 DIV n AS BIGINT)").alias("brier_e12"),
        F.expr(f"CAST({ref} AS BIGINT)").alias("brier_ref_e12"),
        F.expr(
            f"CAST(CASE WHEN {ref} = 0 THEN 0"
            f" WHEN {ref} >= sse_e12 DIV n"
            f" THEN 1000 * ({ref} - sse_e12 DIV n) DIV ({ref})"
            f" ELSE -(1000 * (sse_e12 DIV n - {ref}) DIV ({ref})) END AS BIGINT)"
        ).alias("bss_milli"),
    )


# --------------------------------------------------------------------------
# eval_uplift_auuc — area under the Qini curve (built ON the qini table)
# --------------------------------------------------------------------------
@register(
    "eval_uplift_auuc",
    oracle="""
    WITH base AS (
      SELECT decile, cum_n_t + cum_n_c AS cum_n, qini_milli
      FROM (
    WITH scored AS (
      SELECT doc_id,
        CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) AS score_ppm,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        CAST(('0x' || substring(md5('uplift' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 2 AS BIGINT) AS t
      FROM documents
    ),
    binned AS (
      SELECT y, t, ntile(10) OVER (ORDER BY score_ppm DESC, doc_id) AS decile
      FROM scored
    ),
    per AS (
      SELECT decile,
             CAST(SUM(t) AS BIGINT) AS n_t,
             CAST(SUM(1 - t) AS BIGINT) AS n_c,
             CAST(SUM(t * y) AS BIGINT) AS pos_t,
             CAST(SUM((1 - t) * y) AS BIGINT) AS pos_c
      FROM binned GROUP BY decile
    ),
    cum AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(SUM(n_t) OVER (ORDER BY decile) AS BIGINT) AS cum_n_t,
             CAST(SUM(n_c) OVER (ORDER BY decile) AS BIGINT) AS cum_n_c,
             CAST(SUM(pos_t) OVER (ORDER BY decile) AS BIGINT) AS cum_pos_t,
             CAST(SUM(pos_c) OVER (ORDER BY decile) AS BIGINT) AS cum_pos_c
      FROM per
    )
    SELECT decile, cum_n_t, cum_n_c,
           CAST(CASE WHEN cum_n_c = 0 THEN 0
                WHEN cum_pos_t * cum_n_c >= cum_pos_c * cum_n_t
                THEN 1000 * (cum_pos_t * cum_n_c - cum_pos_c * cum_n_t) // cum_n_c
                ELSE -(1000 * (cum_pos_c * cum_n_t - cum_pos_t * cum_n_c) // cum_n_c)
                END AS BIGINT) AS qini_milli
    FROM cum
      ) q
    ),
    steps AS (
      SELECT qini_milli,
             COALESCE(LAG(qini_milli) OVER (ORDER BY decile), 0) AS prev_qini,
             cum_n - COALESCE(LAG(cum_n) OVER (ORDER BY decile), 0) AS d_n,
             cum_n
      FROM base
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_deciles,
           CAST(MAX(cum_n) AS BIGINT) AS n_units,
           CAST(SUM((qini_milli + prev_qini) * d_n) AS BIGINT)
             AS auuc2_milli_rows,
           CAST(MAX(CASE WHEN cum_n = (SELECT MAX(cum_n) FROM steps)
                    THEN qini_milli END) * MAX(cum_n) AS BIGINT)
             AS auuc2_rand_milli_rows
    FROM steps
    """,
)
def eval_uplift_auuc_q(spark, sf_dir):
    """Area under the Qini curve (AUUC) — the single-scalar uplift metric:
    2× the trapezoid area under `eval_uplift_qini`'s (cum_n, qini) curve
    in exact milli·row units, next to the random-targeting baseline area
    (the straight line from 0 to the final qini: 2·area = qini_final·N).
    AUUC − baseline > 0 means targeting by score order beats targeting at
    random; under this table's A/A md5 coin it hovers near 0, so the pair
    doubles as the scalar randomization audit.

    Built ON the registered qini query (the Spark side calls it, the
    oracle nests its SQL verbatim) — one source of truth, the two
    contracts cannot drift.

    Exactness: the 2× trick keeps the trapezoid sum integer (no /2);
    qini is already sign-decomposed milli, Δn and the sum are plain
    BIGINT arithmetic (|auuc2| ≤ 2·max|qini|·N ≈ 2e3·N² — int64-safe to
    N ≈ 2e6 units, the qini table's own documented bound class).

    100 TB shape: the qini table's cost (one rank pass) + an 11-row
    window — the scalar is free once the curve exists."""
    from . import QUERIES

    base = QUERIES["eval_uplift_qini"](spark, sf_dir).select(
        "decile",
        (F.col("cum_n_t") + F.col("cum_n_c")).alias("cum_n"),
        "qini_milli",
    )
    w = Window.orderBy("decile")
    steps = base.select(
        "decile",
        "qini_milli",
        F.coalesce(F.lag("qini_milli").over(w), F.lit(0)).alias("prev_qini"),
        (F.col("cum_n") - F.coalesce(F.lag("cum_n").over(w), F.lit(0))).alias("d_n"),
        "cum_n",
    )
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    last = steps.withColumn("n_units", F.max("cum_n").over(w_all)).withColumn(
        "final_qini",
        F.max(F.when(F.col("cum_n") == F.col("n_units"), F.col("qini_milli"))).over(
            w_all
        ),
    )
    return last.agg(
        F.count(F.lit(1)).cast("long").alias("n_deciles"),
        F.max("cum_n").cast("long").alias("n_units"),
        F.sum((F.col("qini_milli") + F.col("prev_qini")) * F.col("d_n"))
        .cast("long")
        .alias("auuc2_milli_rows"),
        (F.max("final_qini") * F.max("cum_n")).cast("long").alias("auuc2_rand_milli_rows"),
    )


# --------------------------------------------------------------------------
# graph_scc — strongly connected components on a bounded directed slice
# --------------------------------------------------------------------------
_SCC_EDGES_SQL = """
      SELECT DISTINCT CAST(l_orderkey % 60 AS BIGINT) AS src,
                      CAST(l_partkey % 60 AS BIGINT) AS dst
      FROM lineitem
      WHERE l_orderkey % 60 <> l_partkey % 60
        AND ('0x' || substring(md5('scc|' || CAST(l_orderkey % 60 AS VARCHAR)
             || '|' || CAST(l_partkey % 60 AS VARCHAR)), 1, 8))::BIGINT % 100 < 4
"""


def _scc_edges(spark, sf_dir):
    """The Spark twin of ``_SCC_EDGES_SQL`` — ONE definition of the thinned
    directed slice shared by `graph_scc` and `graph_condensation`, so the
    condensation can never join labels onto a different edge set than the
    one they were computed from."""
    li = _t(spark, sf_dir, "lineitem")
    src = (F.col("l_orderkey") % 60).cast("long")
    dst = (F.col("l_partkey") % 60).cast("long")
    key = F.concat(
        F.lit("scc|"), src.cast("string"), F.lit("|"), dst.cast("string")
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (
        li.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .filter(h % 100 < 4)
        .distinct()
    )


@register(
    "graph_scc",
    oracle=f"""
    WITH RECURSIVE e AS ({_SCC_EDGES_SQL}
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    reach(src, dst) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
    ),
    mutual AS (
      SELECT r1.src AS v, r1.dst AS w
      FROM reach r1 JOIN reach r2 ON r1.src = r2.dst AND r1.dst = r2.src
    ),
    labeled AS (
      SELECT n.node AS node,
             LEAST(n.node, COALESCE(MIN(m.w), n.node)) AS scc_id
      FROM nodes n LEFT JOIN mutual m ON m.v = n.node
      GROUP BY n.node
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(scc_id AS BIGINT) AS scc_id,
           CAST(COUNT(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
    FROM labeled
    """,
)
def graph_scc_q(spark, sf_dir):
    """Strongly connected components of a bounded directed slice — the
    DIRECTED companion of `dedup_connected_components` (min-label CC is
    blind to edge direction; cycles vs DAG structure need mutual
    reachability).  Nodes are the 60-bucket projection of the order→part
    graph, edges md5-thinned to ~4% (the deterministic hash contract) so
    the slice has real SCC structure: cycles collapse to multi-node
    components, the DAG remainder stays singleton.

    Algorithm (exact gate tier): PATH-DOUBLING transitive closure —
    6 rounds of reach ∪ (reach ⋈ reach) reach every path ≤ 2⁶ = 64 hops
    ≥ the 60-node slice's longest simple path, so closure is exact and
    needs NO driver-side convergence probe; then SCC(v) = min over
    mutual-reachability partners (∪ {{v}}).  Cost is O(closure²) joins on
    a CONTRACT-BOUNDED slice (the eval_kendall_tau doctrine: the slice
    is the analysis unit, never the corpus).  At corpus scale the
    production algorithm is forward-backward reachability coloring
    (Orzan-style: peel the SCC of a pivot as forward∩backward reachable
    sets, recurse on the remainder) or iterated (fwd-min, bwd-min) label
    pairs — O(rounds) keyed shuffles, the `graph_label_propagation`
    shape; this query is the exact differential gate for that machinery.

    stats_cut (not bare localCheckpoint) between doubling rounds: the
    recursing `reach` frame feeds THREE branches per round (the union
    plus both sides of the self-join), so carried sizeInBytes estimates
    would compound ~3x per round — the §stats-compounding rule this
    repo now gates via audit_plans.py STATS_BLOWUP (measured 1771 bits
    here before the cut, 35 after)."""
    from ..plans.graph_query import stats_cut

    edges = _scc_edges(spark, sf_dir)
    reach = edges.localCheckpoint(eager=True)
    for _ in range(6):  # 2^6 = 64 >= longest simple path on 60 nodes
        hops = (
            reach.alias("a")
            .join(
                reach.alias("b"),
                F.col("a.dst") == F.col("b.src"),
            )
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        reach = stats_cut(reach.unionByName(hops).distinct())
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    mutual = (
        reach.alias("r1")
        .join(
            reach.alias("r2"),
            (F.col("r1.src") == F.col("r2.dst")) & (F.col("r1.dst") == F.col("r2.src")),
        )
        .select(F.col("r1.src").alias("v"), F.col("r1.dst").alias("w"))
    )
    labeled = (
        nodes.join(mutual, nodes["node"] == mutual["v"], "left")
        .groupBy("node")
        .agg(F.least(F.col("node"), F.coalesce(F.min("w"), F.col("node"))).alias("scc_id"))
    )
    w_sz = Window.partitionBy("scc_id")
    return labeled.select(
        F.col("node").cast("long").alias("node"),
        F.col("scc_id").cast("long").alias("scc_id"),
        F.count(F.lit(1)).over(w_sz).cast("long").alias("scc_size"),
    )


# --------------------------------------------------------------------------
# graph_dag_depth — ontology-hierarchy depth via max-plus path doubling
# --------------------------------------------------------------------------
def _dag_edges(spark, sf_dir):
    """The md5-thinned larger->smaller-label DAG slice shared by
    `graph_dag_depth` (path-doubling gate tier) and
    `graph_dag_depth_frontier` (layer-relaxation production twin) —
    one edge builder so the twin discipline gates both against the
    SAME slice (mirrors `_scc_edges`)."""
    li = _t(spark, sf_dir, "lineitem")
    a = (F.col("l_orderkey") % 60).cast("long")
    b = (F.col("l_partkey") % 60).cast("long")
    child, parent = F.greatest(a, b), F.least(a, b)
    key = F.concat(
        F.lit("dag|"), child.cast("string"), F.lit("|"), parent.cast("string")
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (
        li.select(child.alias("child"), parent.alias("parent"))
        .filter(F.col("child") != F.col("parent"))
        .filter(h % 100 < 6)
        .distinct()
    )


_DAG_EDGES_SQL = """
      SELECT DISTINCT
        CAST(GREATEST(l_orderkey % 60, l_partkey % 60) AS BIGINT) AS child,
        CAST(LEAST(l_orderkey % 60, l_partkey % 60) AS BIGINT) AS parent
      FROM lineitem
      WHERE l_orderkey % 60 <> l_partkey % 60
        AND ('0x' || substring(md5('dag|' || CAST(GREATEST(l_orderkey % 60, l_partkey % 60) AS VARCHAR)
             || '|' || CAST(LEAST(l_orderkey % 60, l_partkey % 60) AS VARCHAR)), 1, 8))::BIGINT % 100 < 6
"""


@register(
    "graph_dag_depth",
    oracle=f"""
    WITH RECURSIVE e AS ({_DAG_EDGES_SQL}
    ),
    nodes AS (SELECT child AS node FROM e UNION SELECT parent FROM e),
    paths(src, dst, len) AS (
      SELECT child, parent, 1 FROM e
      UNION
      SELECT p.src, e2.parent, p.len + 1
      FROM paths p JOIN e e2 ON p.dst = e2.child
    ),
    stats AS (
      SELECT n.node AS node,
             COALESCE(MAX(p.len), 0) AS depth,
             COUNT(DISTINCT p.dst) AS n_ancestors
      FROM nodes n LEFT JOIN paths p ON p.src = n.node
      GROUP BY n.node
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(depth AS BIGINT) AS depth,
           CAST(n_ancestors AS BIGINT) AS n_ancestors,
           CAST(CASE WHEN depth = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_root
    FROM stats
    """,
)
def graph_dag_depth_q(spark, sf_dir):
    """Hierarchy depth + ancestor count per node of a bounded DAG slice —
    the ontology-navigation primitive the reference delegates to ArangoDB
    traversals over its subClassOf graph (OntologyGraphBuilder.java
    builds exactly such child→parent class DAGs; 'how deep is this term
    and how many superclasses does it have' is the canonical query over
    them).  depth = LONGEST child→parent path to any root (the standard
    ontology-depth convention — max, not min, so siblings inserted under
    a deeper parent sort deeper); n_ancestors = distinct reachable
    superclasses; is_root flags the top of the hierarchy.

    Edges are md5-thinned order→part pairs ORIENTED larger→smaller
    label, which makes the slice a DAG by construction (every edge
    strictly decreases the label) — no cycle handling needed, unlike the
    `graph_scc` companion that exists for exactly the cyclic case.

    Algorithm (exact gate tier): MAX-PLUS path doubling — reach carries
    (src, dst, longest_len); each round joins reach with itself and
    keeps MAX(len₁+len₂) per (src, dst); 6 rounds cover paths ≤ 64 >
    the 60-node slice's longest possible chain.  stats_cut per round
    (the reach frame feeds three branches/round — the
    §stats-compounding rule, gated by STATS_BLOWUP).  Cost is bounded by
    the slice contract; at corpus scale the production shape is
    layer-by-layer relaxation from the root frontier (the
    `graph_label_propagation` keyed-shuffle pattern, one round per
    hierarchy level — OBO ontologies are ~20 levels deep)."""
    from ..plans.graph_query import stats_cut

    edges = _dag_edges(spark, sf_dir)
    reach = edges.select(
        F.col("child").alias("src"), F.col("parent").alias("dst"), F.lit(1).alias("len")
    ).localCheckpoint(eager=True)
    for _ in range(6):  # 2^6 = 64 >= longest chain on 60 nodes
        hops = (
            reach.alias("x")
            .join(reach.alias("y"), F.col("x.dst") == F.col("y.src"))
            .select(
                F.col("x.src").alias("src"),
                F.col("y.dst").alias("dst"),
                (F.col("x.len") + F.col("y.len")).alias("len"),
            )
        )
        reach = stats_cut(
            reach.unionByName(hops)
            .groupBy("src", "dst")
            .agg(F.max("len").alias("len"))
        )
    nodes = (
        edges.select(F.col("child").alias("node"))
        .unionByName(edges.select(F.col("parent").alias("node")))
        .distinct()
    )
    stats = (
        nodes.join(reach, nodes["node"] == reach["src"], "left")
        .groupBy("node")
        .agg(
            F.coalesce(F.max("len"), F.lit(0)).cast("long").alias("depth"),
            F.count_distinct(F.col("dst")).cast("long").alias("n_ancestors"),
        )
    )
    return stats.select(
        F.col("node").cast("long").alias("node"),
        "depth",
        "n_ancestors",
        (F.col("depth") == 0).cast("long").alias("is_root"),
    )


# --------------------------------------------------------------------------
# eval_kendall_tau_full — corpus-scale tau with NO all-pairs join
# --------------------------------------------------------------------------
@register(
    "eval_kendall_tau_full",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY o_custkey
    ),
    pairs AS (
      SELECT a.x - b.x AS dx, a.y - b.y AS dy
      FROM per_cust a JOIN per_cust b ON a.cust < b.cust
    ),
    census AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
             CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
             CAST(SUM(CASE WHEN dx * dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
      FROM pairs
    )
    SELECT n_pairs, n_conc, n_disc, n_tied,
           CAST(CASE WHEN n_pairs = 0 THEN NULL
                WHEN n_conc >= n_disc
                THEN 1000000 * (n_conc - n_disc) // n_pairs
                ELSE -(1000000 * (n_disc - n_conc) // n_pairs) END AS BIGINT)
             AS tau_a_ppm
    FROM census
    """,
)
def eval_kendall_tau_full_q(spark, sf_dir):
    """Kendall τ_a over ALL customers — the PRODUCTION path the
    `eval_kendall_tau` gate tier names: no all-pairs join anywhere, so
    the oracle's O(n²) census is matched by an O(|x-values|·n) plan.

    Works for the common discrete×continuous metric pairing (here
    x = order count, a small-integer metric; y = spend cents,
    near-unique): count strict-strict concordant/discordant pairs by 2D
    DOMINANCE COUNTING on an exact strict-CDF grid —

      T(v, w)   = #points at exactly (x=v, y=w)        (one keyed agg)
      Cy(v, w)  = #(x=v, y ≤ w)    — cum over the y grid WITHIN each x
                  value (window partitioned by v: |x-values| partitions,
                  never a single-partition sort)
      H(v⁻, w)  = #(x < v, y ≤ w)  — cum over x values within each y
                  grid row (n partitions of |x-values| rows)
      E(v⁻, w)  = #(x < v, y = w)  — same frame over T

    then per point j:  D_j = #(x < x_j) − H(x_j⁻, y_j)   (x up, y down)
                       C_j = H(x_j⁻, y_j) − E(x_j⁻, y_j) (strict both)
    and  n_disc = ΣD_j, n_conc = ΣC_j exactly ONCE per unordered pair
    (orientation fixed by the strict x inequality); ties fall out as
    n_pairs − C − D, no tie census needed.

    Cost/exactness contract: the grid is |x-values| × |distinct y| rows
    — the |x-values| ≤ 200 bound is guard-enforced (DriverBoundExceeded
    names the fallback: bucket y and pay the boundary-strip join).  Every
    count is a BIGINT; ΣD_j ≤ n² keeps the reduce int64-safe to n≈3e9.
    The sign-decomposed ppm division is the frontier4 doctrine.

    100 TB shape: two keyed aggs, one |x-values|-wide broadcast cross of
    the y grid, two PARTITIONED window passes, one equi-join back to the
    points, one 2-cell reduce.  Nothing quadratic, nothing
    single-partition."""
    from ..operators.guards import check_driver_bound

    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
    )
    xvals = per.select("x").distinct()
    check_driver_bound(
        xvals.count(),
        200,
        "eval_kendall_tau_full: distinct x-value grid axis",
        "bucketed-y dominance counting with boundary-strip joins",
    )
    ygrid = per.select("y").distinct()
    t_cnt = per.groupBy("x", "y").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    grid = (
        ygrid.crossJoin(F.broadcast(xvals))  # |x-values|-wide dim fanout
        .join(t_cnt, ["x", "y"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)).cast("long"))
    )
    w_y = Window.partitionBy("x").orderBy("y").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cy = grid.withColumn("cy", F.sum("cnt").over(w_y))
    w_x = Window.partitionBy("y").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    h = (
        cy.withColumn("h", F.coalesce(F.sum("cy").over(w_x), F.lit(0)).cast("long"))
        .withColumn("e", F.coalesce(F.sum("cnt").over(w_x), F.lit(0)).cast("long"))
        .select("x", "y", "h", "e")
    )
    xcensus = per.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("m"))
    w_xc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    nx_lt = xcensus.withColumn(
        "nx_lt", F.coalesce(F.sum("m").over(w_xc), F.lit(0)).cast("long")
    ).select("x", "nx_lt")
    perj = per.join(h, ["x", "y"]).join(F.broadcast(nx_lt), "x")
    sums = perj.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("nx_lt") - F.col("h")).cast("long").alias("n_disc"),
        F.sum(F.col("h") - F.col("e")).cast("long").alias("n_conc"),
    )
    return sums.select(
        F.expr("CAST(n * (n - 1) DIV 2 AS BIGINT)").alias("n_pairs"),
        "n_conc",
        "n_disc",
        F.expr("CAST(n * (n - 1) DIV 2 - n_conc - n_disc AS BIGINT)").alias("n_tied"),
        F.expr(
            # n < 2 guard (ADVICE r9): explicit NULL instead of an
            # engine-divergent division by zero (eval_cochran_q pattern).
            "CAST(CASE WHEN n < 2 THEN NULL"
            " WHEN n_conc >= n_disc"
            " THEN 1000000 * (n_conc - n_disc) DIV (n * (n - 1) DIV 2)"
            " ELSE -(1000000 * (n_disc - n_conc) DIV (n * (n - 1) DIV 2)) END"
            " AS BIGINT)"
        ).alias("tau_a_ppm"),
    )


# --------------------------------------------------------------------------
# eval_spearman_rescaled — the documented large-n path, gated
# --------------------------------------------------------------------------
@register(
    "eval_spearman_rescaled",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cust,
             ROW_NUMBER() OVER (ORDER BY n_orders, cust) AS r1,
             ROW_NUMBER() OVER (ORDER BY cents, cust) AS r2
      FROM per_cust
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
      FROM ranked
    )
    SELECT n,
           CAST(sum_d2 // n AS BIGINT) AS d2_over_n,
           CAST(1000000 - 6 * (1000000 * (sum_d2 // n)) // (n * n - 1) AS BIGINT)
             AS rho_ppm_rescaled
    FROM agg
    """,
)
def eval_spearman_rescaled_q(spark, sf_dir):
    """The LARGE-n Spearman path `eval_spearman_rank`'s headroom note
    (ADVICE r8) documents, as a gated contract of its own: divide Σd² by
    n BEFORE the 6e6 blowup, so the ppm numerator is bounded by
    6e6·(n²/3) — int64-safe to n ≈ 2.5e7 ranked entities instead of the
    exact tier's 16.6k.  Both engines truncate Σd² DIV n to the same
    grid point, so the contract stays hash-exact; the residual vs the
    exact tier is < 6e6/(n²−1) ppm (sub-ppm past n ≈ 2.5k).  Same
    two-pass `with_global_rank` machinery — the 10× scale probe
    (SCALE.md §r9-at-10x) runs THIS formula at n = 150k."""
    from ..operators.windows import with_global_rank

    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    r1 = with_global_rank(per_cust, ["n_orders", "cust"], "r1").select("cust", "r1")
    r2 = with_global_rank(per_cust, ["cents", "cust"], "r2").select("cust", "r2")
    agg = (
        r1.join(r2, on="cust")
        .select(((F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))).alias("d2"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("d2").cast("long").alias("sum_d2"),
        )
    )
    return agg.select(
        "n",
        F.expr("CAST(sum_d2 DIV n AS BIGINT)").alias("d2_over_n"),
        F.expr(
            "CAST(1000000 - 6 * (1000000 * (sum_d2 DIV n)) DIV (n * n - 1)"
            " AS BIGINT)"
        ).alias("rho_ppm_rescaled"),
    )


# --------------------------------------------------------------------------
# graph_condensation — the SCC quotient DAG
# --------------------------------------------------------------------------
@register(
    "graph_condensation",
    oracle=f"""
    WITH RECURSIVE e AS ({_SCC_EDGES_SQL}
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    reach(src, dst) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
    ),
    mutual AS (
      SELECT r1.src AS v, r1.dst AS w
      FROM reach r1 JOIN reach r2 ON r1.src = r2.dst AND r1.dst = r2.src
    ),
    labeled AS (
      SELECT n.node AS node,
             LEAST(n.node, COALESCE(MIN(m.w), n.node)) AS scc_id
      FROM nodes n LEFT JOIN mutual m ON m.v = n.node
      GROUP BY n.node
    )
    SELECT DISTINCT CAST(ls.scc_id AS BIGINT) AS from_scc,
                    CAST(ld.scc_id AS BIGINT) AS to_scc
    FROM e
    JOIN labeled ls ON ls.node = e.src
    JOIN labeled ld ON ld.node = e.dst
    WHERE ls.scc_id <> ld.scc_id
    """,
)
def graph_condensation_q(spark, sf_dir):
    """The CONDENSATION of the `graph_scc` slice: contract every strongly
    connected component to one node (its min label) and keep the distinct
    inter-component edges — the quotient graph, which is ACYCLIC by the
    SCC theorem and therefore the input `graph_dag_depth`'s machinery
    accepts.  Together the three queries are the standard directed-graph
    pipeline: components → condensation → topological layering.

    Composition contract: this query CALLS the registered `graph_scc`
    (one source of truth for the labeling) and joins its labels onto the
    same thinned edge slice — two broadcast label lookups + a distinct.
    At corpus scale the labels come from the coloring production path
    and the edge relabel is the same two keyed joins."""
    from . import QUERIES

    labels = QUERIES["graph_scc"](spark, sf_dir).select("node", "scc_id")
    edges = _scc_edges(spark, sf_dir)
    ls = labels.select(F.col("node").alias("src"), F.col("scc_id").alias("from_scc"))
    ld = labels.select(F.col("node").alias("dst"), F.col("scc_id").alias("to_scc"))
    return (
        edges.join(F.broadcast(ls), "src")
        .join(F.broadcast(ld), "dst")
        .filter(F.col("from_scc") != F.col("to_scc"))
        .select("from_scc", "to_scc")
        .distinct()
    )


# --------------------------------------------------------------------------
# stream_uplift_maintain — incremental uplift-monitor maintenance
# --------------------------------------------------------------------------
@register(
    "stream_uplift_maintain",
    oracle="""
    WITH scored AS (
      SELECT
        CAST(CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) // 20000
             AS BIGINT) AS bucket,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        CAST(('0x' || substring(md5('uplift' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 2 AS BIGINT) AS t
      FROM documents
    ),
    per AS (
      SELECT bucket,
             CAST(SUM(t) AS BIGINT) AS n_t,
             CAST(SUM(1 - t) AS BIGINT) AS n_c,
             CAST(SUM(t * y) AS BIGINT) AS pos_t,
             CAST(SUM((1 - t) * y) AS BIGINT) AS pos_c
      FROM scored GROUP BY bucket
    ),
    cum AS (
      SELECT bucket, n_t, n_c, pos_t, pos_c,
             CAST(SUM(n_t) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_n_t,
             CAST(SUM(n_c) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_n_c,
             CAST(SUM(pos_t) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_pos_t,
             CAST(SUM(pos_c) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_pos_c
      FROM per
    )
    SELECT bucket, n_t, n_c, pos_t, pos_c, cum_n_t, cum_n_c, cum_pos_t, cum_pos_c,
           CAST(CASE WHEN cum_n_c = 0 THEN 0
                WHEN cum_pos_t * cum_n_c >= cum_pos_c * cum_n_t
                THEN 1000 * (cum_pos_t * cum_n_c - cum_pos_c * cum_n_t) // cum_n_c
                ELSE -(1000 * (cum_pos_c * cum_n_t - cum_pos_t * cum_n_c) // cum_n_c)
                END AS BIGINT) AS qini_milli
    FROM cum
    """,
)
def stream_uplift_maintain_q(spark, sf_dir):
    """Streaming maintenance of the uplift monitor — the experiment
    dashboard you'd actually run WHILE a campaign ingests: each
    micro-batch of documents folds its (score-bucket × arm) counts into
    keyed parquet state; the qini curve is derived from the state at
    read time.

    The IVM insight vs `eval_uplift_qini`: row-ntile DECILES are not
    batch-additive (they depend on the global score distribution and
    doc_id tie-breaks), so the maintained sufficient statistic is the
    fixed-width score HISTOGRAM (20k-ppm buckets × arm → n, pos — pure
    SUM merges, bundling-independent), and the cumulative-from-the-top
    qini over bucket cuts is a post-aggregation over the ≤51-row state.
    Value-cut curves are the streaming-legitimate contract; the batch
    decile table remains the offline-eval twin.

    100 TB shape: per trigger O(batch) codegen projection + a
    bucket-keyed partial agg; state is bucket-cardinality (≤ 51 × 2
    cells), never the corpus.  The same doctrine as
    `stream_star_rollup_maintain`."""
    import shutil
    import tempfile

    from ..streaming import read_documents_stream
    from . import finish_and_clean

    stream = read_documents_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_uplift_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        from ..operators.training import hash_bucket

        sp = batch_df.sparkSession
        part = batch_df.select(
            F.expr(
                "CAST(CAST(1000000 * size(filter(split(text, '\\\\s+'),"
                " t -> t IN ('the','a','of','and','to','in','is')))"
                " DIV size(split(text, '\\\\s+')) AS BIGINT) DIV 20000 AS BIGINT)"
            ).alias("bucket"),
            (F.col("lang") == "en").cast("long").alias("y"),
            # the SAME coin as the batch twin eval_uplift_qini — one
            # source of truth for the sample_split_hash contract
            hash_bucket(F.col("doc_id"), 2, "uplift").cast("long").alias("t"),
        ).groupBy("bucket").agg(
            F.sum("t").cast("long").alias("n_t"),
            F.sum(F.lit(1) - F.col("t")).cast("long").alias("n_c"),
            F.sum(F.col("t") * F.col("y")).cast("long").alias("pos_t"),
            F.sum((F.lit(1) - F.col("t")) * F.col("y")).cast("long").alias("pos_c"),
        )
        # first-batch is detected by state ABSENCE, not by catching read
        # errors — a transient failure on batch N>0 must fail the batch
        # loudly (the retry replays it), never silently reset the fold
        import os as _os

        if _os.path.isdir(state_path):
            state = sp.read.parquet(state_path)
            merged = (
                state.unionByName(part)
                .groupBy("bucket")
                .agg(
                    F.sum("n_t").alias("n_t"),
                    F.sum("n_c").alias("n_c"),
                    F.sum("pos_t").alias("pos_t"),
                    F.sum("pos_c").alias("pos_c"),
                )
            )
        else:  # first batch: the partial IS the state
            merged = part
        commit_state_parquet(merged, state_path)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    state = spark.read.parquet(state_path)
    w_cum = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = state.select(
        "bucket",
        F.col("n_t").cast("long").alias("n_t"),
        F.col("n_c").cast("long").alias("n_c"),
        F.col("pos_t").cast("long").alias("pos_t"),
        F.col("pos_c").cast("long").alias("pos_c"),
        F.sum("n_t").over(w_cum).cast("long").alias("cum_n_t"),
        F.sum("n_c").over(w_cum).cast("long").alias("cum_n_c"),
        F.sum("pos_t").over(w_cum).cast("long").alias("cum_pos_t"),
        F.sum("pos_c").over(w_cum).cast("long").alias("cum_pos_c"),
    ).select(
        "bucket",
        "n_t",
        "n_c",
        "pos_t",
        "pos_c",
        "cum_n_t",
        "cum_n_c",
        "cum_pos_t",
        "cum_pos_c",
        F.expr(
            "CAST(CASE WHEN cum_n_c = 0 THEN 0"
            " WHEN cum_pos_t * cum_n_c >= cum_pos_c * cum_n_t"
            " THEN 1000 * (cum_pos_t * cum_n_c - cum_pos_c * cum_n_t) DIV cum_n_c"
            " ELSE -(1000 * (cum_pos_c * cum_n_t - cum_pos_t * cum_n_c) DIV cum_n_c)"
            " END AS BIGINT)"
        ).alias("qini_milli"),
    )
    return finish_and_clean(cum, root)


# --------------------------------------------------------------------------
# fn_sft_render_spans — chat-template assembly + exact loss-mask spans
# --------------------------------------------------------------------------
@register(
    "fn_sft_render_spans",
    oracle="""
    WITH turns AS (
      SELECT CAST(doc_id // 4 AS BIGINT) AS conv_id,
             CAST(doc_id % 4 AS BIGINT) AS turn_idx,
             CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
             text
      FROM documents
    ),
    rendered AS (
      SELECT conv_id, turn_idx, role,
             '<|' || role || '|>' || text AS piece,
             CAST(length('<|' || role || '|>') AS BIGINT) AS header_len,
             CAST(length(text) AS BIGINT) AS text_len
      FROM turns
    ),
    offsets AS (
      SELECT conv_id, turn_idx, role, header_len, text_len,
             CAST(COALESCE(SUM(header_len + text_len) OVER (
               PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS piece_start,
             CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_turns,
             CAST(SUM(header_len + text_len) OVER (PARTITION BY conv_id)
               AS BIGINT) AS conv_len
      FROM rendered
    )
    SELECT conv_id, turn_idx,
           CAST(piece_start + header_len AS BIGINT) AS start_char,
           CAST(piece_start + header_len + text_len AS BIGINT) AS end_char,
           n_turns, conv_len
    FROM offsets
    WHERE role = 'assistant'
    """,
)
def fn_sft_render_spans_q(spark, sf_dir):
    """SFT chat-template assembly with EXACT loss-mask spans — the
    training-data op every instruction-tuning pipeline needs: turns are
    rendered ``<|role|>text`` in turn order, and for each ASSISTANT turn
    the query emits the [start_char, end_char) span of its payload
    within the rendered conversation — the character offsets a
    tokenizer-side loss mask is built from (mask = 1 inside assistant
    payloads, 0 on headers and user turns).

    Synthetic conversations: 4 consecutive documents per conv
    (doc_id DIV 4), alternating user/assistant by parity — the template
    logic is the contract under test, not the dialogue.

    Exactness: spans are pure integer arithmetic over character lengths
    (both engines' ``length()`` counts codepoints), computed by ONE
    cumulative window per conversation (PARTITIONED by conv_id, ordered
    by turn_idx — thousands of independent 4-row partitions, never a
    global sort).  Emitting spans as rows (not arrays) keeps the
    differential hash engine-agnostic.

    100 TB shape: a pure projection + one conv-keyed window — the same
    single-exchange cost as sessionization; rendering the full text
    column (concat of pieces) is a map-side string op when a sink needs
    it, deliberately NOT materialized here (spans + lengths are the
    verifiable contract; the text is derivable)."""
    turns = _t(spark, sf_dir, "documents").select(
        F.expr("CAST(doc_id DIV 4 AS BIGINT)").alias("conv_id"),
        (F.col("doc_id") % 4).cast("long").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "text",
    )
    rendered = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        F.length(F.concat(F.lit("<|"), F.col("role"), F.lit("|>")))
        .cast("long")
        .alias("header_len"),
        F.length("text").cast("long").alias("text_len"),
    )
    w_cum = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy("conv_id")
    offsets = rendered.select(
        "conv_id",
        "turn_idx",
        "role",
        "header_len",
        "text_len",
        F.coalesce(
            F.sum(F.col("header_len") + F.col("text_len")).over(w_cum), F.lit(0)
        )
        .cast("long")
        .alias("piece_start"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_turns"),
        F.sum(F.col("header_len") + F.col("text_len"))
        .over(w_all)
        .cast("long")
        .alias("conv_len"),
    )
    return offsets.filter(F.col("role") == "assistant").select(
        "conv_id",
        "turn_idx",
        (F.col("piece_start") + F.col("header_len")).cast("long").alias("start_char"),
        (F.col("piece_start") + F.col("header_len") + F.col("text_len"))
        .cast("long")
        .alias("end_char"),
        "n_turns",
        "conv_len",
    )


# --------------------------------------------------------------------------
# graph_scc_fb — the forward-backward coloring PRODUCTION path, same oracle
# --------------------------------------------------------------------------
@register(
    "graph_scc_fb",
    oracle=f"""
    WITH RECURSIVE e AS ({_SCC_EDGES_SQL}
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    reach(src, dst) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src
    ),
    mutual AS (
      SELECT r1.src AS v, r1.dst AS w
      FROM reach r1 JOIN reach r2 ON r1.src = r2.dst AND r1.dst = r2.src
    ),
    labeled AS (
      SELECT n.node AS node,
             LEAST(n.node, COALESCE(MIN(m.w), n.node)) AS scc_id
      FROM nodes n LEFT JOIN mutual m ON m.v = n.node
      GROUP BY n.node
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(scc_id AS BIGINT) AS scc_id,
           CAST(COUNT(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
    FROM labeled
    """,
)
def graph_scc_fb_q(spark, sf_dir):
    """`graph_scc`'s PRODUCTION path, implemented and differentially gated
    against the SAME oracle and the SAME edge slice (VERDICT-style twin
    discipline — `eval_kendall_tau_full` is the precedent): multi-pivot
    forward-backward coloring (plans/graph_query.py
    `strongly_connected_components_fb`) — per-round keyed shuffles only,
    NO transitive closure materialized, so memory is O(|V|+|E|) where the
    path-doubling gate tier pays O(closure).

    Per outer round on the unassigned subgraph: forward max-label
    coloring to fixpoint (every color class then holds one pivot),
    backward boolean reachability to the pivot within each color class,
    peel SCC(pivot) = {{v : color(v)=pivot ∧ v ⇝ pivot}} (the FW-BW
    theorem), repeat.  Inner fixpoints cost ≈ the directed diameter in
    hops; outer rounds ≈ the condensation's pivot-chain depth — both
    capped with loud errors, both small on real graphs.

    Same output contract as `graph_scc` (node, min-label scc_id,
    scc_size), byte-identical results by the shared oracle."""
    from ..plans.graph_query import strongly_connected_components_fb

    labels = strongly_connected_components_fb(_scc_edges(spark, sf_dir))
    w_sz = Window.partitionBy("scc_id")
    return labels.select(
        F.col("node").cast("long").alias("node"),
        F.col("scc_id").cast("long").alias("scc_id"),
        F.count(F.lit(1)).over(w_sz).cast("long").alias("scc_size"),
    )


# --------------------------------------------------------------------------
# eval_pr_curve — exact precision/recall curve points at every threshold
# --------------------------------------------------------------------------
_PR_CUM_SQL = """
    scored AS (
      SELECT source, n_chars AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    per_score AS (
      SELECT source, s, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(pos) AS BIGINT) AS p
      FROM scored GROUP BY source, s
    ),
    cum AS (
      SELECT source, s, c, p,
             CAST(SUM(p) OVER (PARTITION BY source ORDER BY s DESC)
               AS BIGINT) AS cum_tp,
             CAST(SUM(c) OVER (PARTITION BY source ORDER BY s DESC)
               AS BIGINT) AS cum_n,
             CAST(SUM(p) OVER (PARTITION BY source) AS BIGINT) AS tot_p
      FROM per_score
    )
"""


@register(
    "eval_pr_curve",
    oracle=f"""
    WITH {_PR_CUM_SQL}
    SELECT source, CAST(s AS BIGINT) AS threshold, cum_tp,
           CAST(cum_n - cum_tp AS BIGINT) AS cum_fp,
           CAST(1000000 * cum_tp // cum_n AS BIGINT) AS precision_ppm,
           CASE WHEN tot_p = 0 THEN NULL
                ELSE CAST(1000000 * cum_tp // tot_p AS BIGINT)
           END AS recall_ppm
    FROM cum
    """,
)
def eval_pr_curve_q(spark, sf_dir):
    """Exact precision-recall curve of a score column against a binary
    label, per group — one point per DISTINCT threshold (score ≥ s,
    swept descending): cumulative tp/fp plus precision and recall in
    ppm.  The threshold-sweep companion to `eval_auc_rank` (one scalar
    can hide a precision cliff; the curve is what you pick an operating
    point from) and the raw material `eval_average_precision` totals.
    Score = n_chars, label = lang='en', grouped by source — in
    production the score is any detector and this is its operating-
    characteristic table.

    Exactness: the whole curve is integer counts; both ppm divisions
    have non-negative operands (cum_tp ≤ cum_n, cum_tp ≤ tot_p) so
    truncation is cross-engine safe without sign decomposition.

    100 TB shape: the `eval_auc_rank` envelope exactly — one hash
    aggregate collapses the corpus to (group, distinct-score) rows
    map-side, then one window cumsum per group over those few rows;
    the sort is over distinct scores within a group, never corpus
    rows; curve points come out at distinct-score granularity
    (bounded), not row granularity."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").cast("long").alias("pos"),
    )
    per_score = scored.groupBy("source", "s").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("pos").cast("long").alias("p"),
    )
    w_desc = Window.partitionBy("source").orderBy(F.desc("s"))
    w_all = Window.partitionBy("source")
    cum = per_score.select(
        "source",
        "s",
        "c",
        "p",
        F.sum("p").over(w_desc).cast("long").alias("cum_tp"),
        F.sum("c").over(w_desc).cast("long").alias("cum_n"),
        F.sum("p").over(w_all).cast("long").alias("tot_p"),
    )
    return cum.select(
        "source",
        F.col("s").cast("long").alias("threshold"),
        "cum_tp",
        (F.col("cum_n") - F.col("cum_tp")).cast("long").alias("cum_fp"),
        F.expr("CAST(1000000 * cum_tp DIV cum_n AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.when(
            F.col("tot_p") > 0,
            F.expr("CAST(1000000 * cum_tp DIV tot_p AS BIGINT)"),
        ).alias("recall_ppm"),
    )


# --------------------------------------------------------------------------
# eval_average_precision — exact step-interpolated AP per group
# --------------------------------------------------------------------------
@register(
    "eval_average_precision",
    oracle=f"""
    WITH {_PR_CUM_SQL},
    agg AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(p) AS BIGINT) AS n_pos,
             CAST(SUM(p * (1000000 * cum_tp // cum_n)) AS BIGINT) AS ap_num
      FROM cum GROUP BY source
    )
    SELECT source, n, n_pos,
           CASE WHEN n_pos = 0 THEN NULL
                ELSE CAST(ap_num // n_pos AS BIGINT) END AS ap_ppm,
           CAST(1000000 * n_pos // n AS BIGINT) AS prevalence_ppm
    FROM agg
    """,
)
def eval_average_precision_q(spark, sf_dir):
    """Average precision per group — the single-scalar summary of
    `eval_pr_curve` (AP = Σ over positives of precision@rank / n_pos,
    step-interpolated at tie groups: every positive inside a distinct-
    score group takes that group's precision — the deterministic
    tie convention, stated in the contract).  Beside it the prevalence
    (the AP of a random ranker) — AP must clear prevalence the way AUC
    must clear 0.5.

    Exactness: each threshold contributes p · ⌊1e6·cum_tp/cum_n⌋ — an
    integer per distinct-score row, so the sum is order-independent and
    associative (safe under any partitioning); the final ÷n_pos is a
    non-negative truncating division.  Same ppm grid in both engines.

    100 TB shape: `eval_pr_curve`'s cost plus one more group aggregate
    over distinct-score rows — the scalar is free once the curve
    machinery runs; nothing row-granular leaves the map side."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").cast("long").alias("pos"),
    )
    per_score = scored.groupBy("source", "s").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("pos").cast("long").alias("p"),
    )
    w_desc = Window.partitionBy("source").orderBy(F.desc("s"))
    cum = per_score.select(
        "source",
        "c",
        "p",
        F.sum("p").over(w_desc).cast("long").alias("cum_tp"),
        F.sum("c").over(w_desc).cast("long").alias("cum_n"),
    )
    agg = cum.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("p").cast("long").alias("n_pos"),
        F.sum(
            F.col("p") * F.expr("1000000 * cum_tp DIV cum_n")
        )
        .cast("long")
        .alias("ap_num"),
    )
    return agg.select(
        "source",
        "n",
        "n_pos",
        F.when(
            F.col("n_pos") > 0, F.expr("CAST(ap_num DIV n_pos AS BIGINT)")
        ).alias("ap_ppm"),
        F.expr("CAST(1000000 * n_pos DIV n AS BIGINT)").alias(
            "prevalence_ppm"
        ),
    )


# --------------------------------------------------------------------------
# eval_pairwise_winrate — paired-model win/tie/loss census per group
# --------------------------------------------------------------------------
@register(
    "eval_pairwise_winrate",
    oracle="""
    WITH scored AS (
      SELECT source, 2 * n_chars AS a2,
             11 * len(string_split_regex(text, '\\s+')) AS b2
      FROM documents
    ),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a2 > b2 THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
             CAST(SUM(CASE WHEN a2 < b2 THEN 1 ELSE 0 END) AS BIGINT) AS b_wins,
             CAST(SUM(CASE WHEN a2 = b2 THEN 1 ELSE 0 END) AS BIGINT) AS ties
      FROM scored GROUP BY source
    )
    SELECT source, n, a_wins, b_wins, ties,
           CASE WHEN a_wins + b_wins = 0 THEN NULL
                ELSE CAST(1000000 * a_wins // (a_wins + b_wins) AS BIGINT)
           END AS a_winrate_ppm,
           CAST((1000000 * a_wins + 500000 * ties) // n AS BIGINT)
             AS a_score_ppm
    FROM agg
    """,
)
def eval_pairwise_winrate_q(spark, sf_dir):
    """Paired win/tie/loss census between two scorers of the SAME items,
    per group — the LLM-eval staple (pairwise winrates between model A
    and model B on a shared prompt set): exact win counts, the
    tie-excluded winrate, and the tie-splitting score (win=1, tie=½, in
    ppm — the Elo/BTL input statistic).  Here A = char length and
    B = 5.5·whitespace-token count (the comparison "is the mean token
    longer than 5.5 chars", integerized as 2·chars vs 11·tokens so no
    division enters the verdict — measured near-even split on this
    corpus, so both branches are exercised).

    Exactness: verdicts are integer comparisons; both divisions have
    non-negative operands.  PAIRED is the point — the same items under
    both scorers, so per-item noise cancels (the McNemar/CUPED
    doctrine applied to ranking evals).

    100 TB shape: one codegen projection (two integer scores + a
    3-way CASE) folding map-side to 4 cells per group — single pass,
    no joins, no windows; the winrate of a trillion comparisons costs
    one scan."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        (2 * F.col("n_chars")).alias("a2"),
        (11 * F.expr("size(split(text, '\\\\s+'))")).alias("b2"),
    )
    agg = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("a2") > F.col("b2")).cast("long"))
        .cast("long")
        .alias("a_wins"),
        F.sum((F.col("a2") < F.col("b2")).cast("long"))
        .cast("long")
        .alias("b_wins"),
        F.sum((F.col("a2") == F.col("b2")).cast("long"))
        .cast("long")
        .alias("ties"),
    )
    return agg.select(
        "source",
        "n",
        "a_wins",
        "b_wins",
        "ties",
        F.when(
            F.col("a_wins") + F.col("b_wins") > 0,
            F.expr(
                "CAST(1000000 * a_wins DIV (a_wins + b_wins) AS BIGINT)"
            ),
        ).alias("a_winrate_ppm"),
        F.expr(
            "CAST((1000000 * a_wins + 500000 * ties) DIV n AS BIGINT)"
        ).alias("a_score_ppm"),
    )


# --------------------------------------------------------------------------
# pairs_dpo_dataset — preference pairs (chosen vs rejected) per group
# --------------------------------------------------------------------------
@register(
    "pairs_dpo_dataset",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
                    t -> t IN ('the','a','of','and','to','in','is')))
                  // len(string_split_regex(text, '\\s+')) AS BIGINT) AS q_ppm
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, q_ppm,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY q_ppm DESC, doc_id) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
      FROM scored
    )
    SELECT c.source, CAST(c.rn AS BIGINT) AS pair_idx,
           c.doc_id AS chosen_doc, r.doc_id AS rejected_doc,
           CAST(c.q_ppm - r.q_ppm AS BIGINT) AS margin_ppm
    FROM ranked c JOIN ranked r
      ON r.source = c.source AND r.rn = c.n + 1 - c.rn
    WHERE c.rn <= LEAST(c.n // 2, 8)
    """,
)
def pairs_dpo_dataset_q(spark, sf_dir):
    """Preference-pair assembly for DPO/RLHF-style training — per prompt
    group (source), rank candidates by a quality score under ONE
    deterministic total order (q desc, doc_id asc) and pair the extremes
    outside-in: rank i (chosen) against rank n+1−i (rejected), up to
    min(n/2, 8) pairs per group, each with its quality margin.  The
    preference companion to `pairs_contrastive_dataset` (anchor/positive
    by content identity there; chosen/rejected by score dominance here):
    margin_ppm ≥ 0 BY CONSTRUCTION of the single total order, and
    max-margin outside-in pairing is the standard strongest-signal
    schedule.  Score = the stopword-density ppm (`eval_brier_score`'s
    detector).

    Exactness: the total order is fully keyed (score, then doc_id) so
    row_number is reproducible across engines, retries, and
    repartitioning — the sampling doctrine applied to ranking.

    100 TB shape: one codegen score projection, ONE within-group
    row_number window (per-group partitions, never global), and a
    self-equi-join on (group, computed rank) — shuffle keyed by group
    both sides; the ≤8-pair cap bounds output to 8·|groups| rows
    regardless of corpus size."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("q_ppm"),
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("q_ppm"), F.asc("doc_id")
    )
    w_all = Window.partitionBy("source")
    ranked = scored.select(
        "source",
        "doc_id",
        "q_ppm",
        F.row_number().over(w_rank).cast("long").alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    chosen = ranked.select(
        "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("q_ppm").alias("q_c"),
        "rn",
        "n",
    )
    rejected = ranked.select(
        F.col("source").alias("r_source"),
        F.col("doc_id").alias("rejected_doc"),
        F.col("q_ppm").alias("q_r"),
        F.col("rn").alias("r_rn"),
    )
    return (
        chosen.join(
            rejected,
            (F.col("r_source") == F.col("source"))
            & (F.col("r_rn") == F.col("n") + 1 - F.col("rn")),
        )
        .filter(F.col("rn") <= F.least(F.expr("n DIV 2"), F.lit(8)))
        .select(
            "source",
            F.col("rn").cast("long").alias("pair_idx"),
            "chosen_doc",
            "rejected_doc",
            (F.col("q_c") - F.col("q_r")).cast("long").alias("margin_ppm"),
        )
    )


# --------------------------------------------------------------------------
# pack_attention_spans — block-diagonal attention metadata for packed bins
# --------------------------------------------------------------------------
@register(
    "pack_attention_spans",
    oracle="""
    WITH corpus AS ({corpus}),
    packed AS (
      SELECT shard, doc_id, tokens,
             CAST(COALESCE(SUM(tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
               AS BIGINT) AS bin
      FROM corpus
    )
    SELECT shard, bin, doc_id,
           CAST(row_number() OVER (
             PARTITION BY shard, bin ORDER BY doc_id) - 1 AS BIGINT) AS seq_idx,
           CAST(COALESCE(SUM(tokens) OVER (
             PARTITION BY shard, bin ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS start_tok,
           CAST(COALESCE(SUM(tokens) OVER (
             PARTITION BY shard, bin ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + tokens
             AS BIGINT) AS end_tok
    FROM packed
    """.format(corpus=_PACK_CORPUS_SQL_F6),
)
def pack_attention_spans_q(spark, sf_dir):
    """Block-diagonal attention metadata for PACKED training bins — the
    per-document [start_tok, end_tok) spans within each `pack_sequences`
    bin, plus the intra-bin sequence index: exactly what a packed
    pretraining loader needs to build the block-diagonal attention mask
    and reset position_ids at every document boundary (the
    cross-contamination guard — without these spans, packed documents
    attend to each other).  The token-space companion to
    `fn_sft_render_spans`' char-space loss masks, built ON the
    registered packer (same corpus helper, same bin rule) so the two
    contracts cannot drift.

    Exactness: pure integer cumulative sums under the packer's fully
    keyed order (shard, then doc_id) — reproducible across engines,
    retries, and repartitioning.

    100 TB shape: the `pack_sequences` cost + one more window AT FINER
    partitioning (shard, bin) — Catalyst reuses the shard exchange
    (bin is a function of the shard-ordered cumsum, the second window
    only sub-sorts); spans stream out at row granularity with no new
    shuffle and no driver state."""
    from ..operators.training import pack_sequences

    from .training import _pack_corpus

    packed = pack_sequences(
        _pack_corpus(spark, sf_dir), "shard", "doc_id", "tokens", 512
    )
    w_bin = Window.partitionBy("shard", "bin").orderBy("doc_id")
    w_cum = w_bin.rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum("tokens").over(w_cum), F.lit(0))
    return packed.select(
        "shard",
        F.col("bin").cast("long").alias("bin"),
        "doc_id",
        (F.row_number().over(w_bin) - 1).cast("long").alias("seq_idx"),
        before.cast("long").alias("start_tok"),
        (before + F.col("tokens")).cast("long").alias("end_tok"),
    )


# --------------------------------------------------------------------------
# fn_chat_truncate_budget — context-window truncation keeping system + tail
# --------------------------------------------------------------------------
@register(
    "fn_chat_truncate_budget",
    oracle="""
    WITH turns AS (
      SELECT CAST(doc_id // 4 AS BIGINT) AS conv_id,
             CAST(doc_id % 4 AS BIGINT) AS turn_idx,
             CAST(length('<|' || CASE WHEN doc_id % 2 = 0
                                      THEN 'user' ELSE 'assistant' END
                         || '|>') + length(text) AS BIGINT) AS piece_len
      FROM documents
    ),
    totals AS (
      SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns FROM turns
      GROUP BY conv_id
    ),
    tails AS (
      SELECT conv_id, turn_idx, piece_len,
             CAST(SUM(piece_len) OVER (
               PARTITION BY conv_id ORDER BY turn_idx DESC) AS BIGINT)
               AS tail_len
      FROM turns WHERE turn_idx >= 1
    ),
    kept AS (
      SELECT conv_id, turn_idx, piece_len FROM turns WHERE turn_idx = 0
      UNION ALL
      SELECT conv_id, turn_idx, piece_len FROM tails WHERE tail_len <= 800
    )
    SELECT k.conv_id, k.turn_idx,
           CAST(row_number() OVER (
             PARTITION BY k.conv_id ORDER BY k.turn_idx) - 1 AS BIGINT)
             AS new_turn_idx,
           k.piece_len,
           CAST(t.n_turns - COUNT(*) OVER (PARTITION BY k.conv_id)
             AS BIGINT) AS n_dropped,
           CAST(SUM(k.piece_len) OVER (PARTITION BY k.conv_id) AS BIGINT)
             AS kept_len
    FROM kept k JOIN totals t ON t.conv_id = k.conv_id
    """,
)
def fn_chat_truncate_budget_q(spark, sf_dir):
    """Context-window truncation of rendered conversations — keep turn 0
    (the system slot) unconditionally plus the LONGEST SUFFIX of later
    turns whose rendered length fits an 800-char budget (the
    keep-system-drop-middle policy every chat-serving and SFT pipeline
    applies when a conversation outgrows the context window; oldest
    non-system turns go first).  Emits kept turns with their renumbered
    index plus per-conversation drop count and kept length — the
    truncation audit.  Same synthetic conversations and `<|role|>`
    render as `fn_sft_render_spans` (4 docs per conv), so the two
    contracts share one template.

    The suffix rule as a window: tail_len(t) = Σ piece_len over turns
    ≥ t is a descending cumsum per conversation; turn t survives iff
    tail_len(t) ≤ budget — monotone in t, so the kept set is exactly
    the maximal fitting suffix.  Pure integer char arithmetic (both
    engines count codepoints).

    100 TB shape: one conv-keyed descending-cumsum window + one
    conv-keyed renumber window + a conv-keyed join to the |convs|-row
    totals dim — three exchanges all on the SAME key (Catalyst reuses
    the partitioning); partitions are ≤4-row conversations, never
    global."""
    turns = _t(spark, sf_dir, "documents").select(
        F.expr("CAST(doc_id DIV 4 AS BIGINT)").alias("conv_id"),
        (F.col("doc_id") % 4).cast("long").alias("turn_idx"),
        (
            F.length(
                F.concat(
                    F.lit("<|"),
                    F.when(F.col("doc_id") % 2 == 0, F.lit("user")).otherwise(
                        F.lit("assistant")
                    ),
                    F.lit("|>"),
                )
            )
            + F.length("text")
        )
        .cast("long")
        .alias("piece_len"),
    )
    totals = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns")
    )
    w_tail = Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    tails = turns.filter(F.col("turn_idx") >= 1).select(
        "conv_id",
        "turn_idx",
        "piece_len",
        F.sum("piece_len").over(w_tail).cast("long").alias("tail_len"),
    )
    kept = turns.filter(F.col("turn_idx") == 0).unionByName(
        tails.filter(F.col("tail_len") <= 800).drop("tail_len")
    )
    w_new = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_all = Window.partitionBy("conv_id")
    return kept.join(totals, on="conv_id").select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w_new) - 1).cast("long").alias("new_turn_idx"),
        "piece_len",
        (F.col("n_turns") - F.count(F.lit(1)).over(w_all))
        .cast("long")
        .alias("n_dropped"),
        F.sum("piece_len").over(w_all).cast("long").alias("kept_len"),
    )


# --------------------------------------------------------------------------
# profile_moments — exact central-moment numerators per group
# --------------------------------------------------------------------------
@register(
    "profile_moments",
    oracle="""
    WITH d AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) - 25 AS dv
      FROM lineitem
    ),
    s AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dv) AS BIGINT) AS s1,
             CAST(SUM(dv * dv) AS BIGINT) AS s2,
             CAST(SUM(dv * dv * dv) AS BIGINT) AS s3,
             CAST(SUM(dv * dv * dv * dv) AS BIGINT) AS s4
      FROM d GROUP BY flag
    )
    SELECT flag, n, s1, s2, s3, s4,
           CAST(n * s2 - s1 * s1 AS BIGINT) AS m2_num,
           CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS BIGINT)
             AS m3_num
    FROM s
    """,
)
def profile_moments_q(spark, sf_dir):
    """Exact higher-moment profile per group — the skewness/kurtosis
    extension of `profile_numeric`: pivot-centered power sums
    Σd..Σd⁴ for d = quantity − 25, plus the EXACT central-moment
    numerators n²·μ₂ = n·Σd² − (Σd)² and n³·μ₃ = n²Σd³ − 3nΣdΣd² +
    2(Σd)³ (shift-invariance of central moments makes the pivot
    exact, not approximate — it only shrinks magnitudes).  Ratio
    statistics (skewness g₁ = μ₃/μ₂^1.5, kurtosis) are float
    POST-PROCESSING of these integers, deliberately outside the gated
    contract (the `embedding_isotropy_probe` doctrine: exact integer
    evidence, float interpretation).

    Integer headroom (documented contract): with |d| ≤ 25, m3_num's
    n²Σd³ term caps at n³·25³ — int64-safe to n ≈ 80k rows per group
    worst-case, ~10× more when the pivot sits near the mean (Σd ≈ 0
    collapses the cross terms).  Past that, the production recipe is
    per-shard pivots at the shard mean combined by the standard
    moment-merge identities — same shape as the variance merge
    `profile_numeric` documents.

    100 TB shape: ONE pass folding map-side to 5 integer cells per
    group (power sums are the canonical map-side-combinable
    statistic); the numerators are a |groups|-row projection.  No
    window, no join, no second scan."""
    d = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_quantity").cast("long") - 25).alias("dv"),
    )
    s = d.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dv").cast("long").alias("s1"),
        F.sum(F.col("dv") * F.col("dv")).cast("long").alias("s2"),
        F.sum(F.col("dv") * F.col("dv") * F.col("dv"))
        .cast("long")
        .alias("s3"),
        F.sum(F.col("dv") * F.col("dv") * F.col("dv") * F.col("dv"))
        .cast("long")
        .alias("s4"),
    )
    return s.select(
        "flag",
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("long")
        .alias("m2_num"),
        (
            F.col("n") * F.col("n") * F.col("s3")
            - 3 * F.col("n") * F.col("s1") * F.col("s2")
            + 2 * F.col("s1") * F.col("s1") * F.col("s1")
        )
        .cast("long")
        .alias("m3_num"),
    )


# --------------------------------------------------------------------------
# graph_dag_depth_frontier — layer-relaxation + bitmap-ancestor production
# twin of graph_dag_depth, gated on the SAME oracle and slice
# --------------------------------------------------------------------------
@register(
    "graph_dag_depth_frontier",
    oracle=f"""
    WITH RECURSIVE e AS ({_DAG_EDGES_SQL}
    ),
    nodes AS (SELECT child AS node FROM e UNION SELECT parent FROM e),
    paths(src, dst, len) AS (
      SELECT child, parent, 1 FROM e
      UNION
      SELECT p.src, e2.parent, p.len + 1
      FROM paths p JOIN e e2 ON p.dst = e2.child
    ),
    stats AS (
      SELECT n.node AS node,
             COALESCE(MAX(p.len), 0) AS depth,
             COUNT(DISTINCT p.dst) AS n_ancestors
      FROM nodes n LEFT JOIN paths p ON p.src = n.node
      GROUP BY n.node
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(depth AS BIGINT) AS depth,
           CAST(n_ancestors AS BIGINT) AS n_ancestors,
           CAST(CASE WHEN depth = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_root
    FROM stats
    """,
)
def graph_dag_depth_frontier_q(spark, sf_dir):
    """`graph_dag_depth`'s PRODUCTION path, gated against the SAME oracle
    and the SAME edge slice (the `graph_scc_fb` twin discipline):
    layer-by-layer Bellman-Ford MAX-relaxation for depth + bounded-
    universe BITMAP fold for ancestor counts — per-round keyed shuffles
    only, NO (src, dst) transitive closure materialized, so memory is
    O(|V| · label-width) where the path-doubling gate tier pays
    O(closure).

    One monotone state (node, depth, anc_bm), relaxed to fixpoint:
      depth(v)  = max over parents p of 1 + depth(p)        (MAX lattice)
      anc_bm(v) = OR  over parents p of bit(p) | anc_bm(p)  (OR lattice)
    Both lattices are monotone and bounded (DAG ⇒ depth ≤ longest
    chain; bm ⊆ universe), so the joint fixpoint exists and is exact;
    rounds = the hierarchy's depth (OBO ontologies ~20 levels — the
    LPA cost shape the gate tier's docstring promises).  Rounds are
    capped with a LOUD error; probes batch 4 lazy hops per
    convergence count.

    Ancestor-count scale contract: the gate slice's 60-label universe
    fits ONE BIGINT bitmap (exact popcount); at corpus scale the bm
    column becomes the `agg_bitmap_distinct` bucketed-bitmap machinery
    (array of 64-bit words, still an OR-fold) or an HLL register when
    approximate counts suffice — the RELAXATION is unchanged, only the
    set representation widens."""
    from ..plans.graph_query import dag_depth_frontier

    state = dag_depth_frontier(_dag_edges(spark, sf_dir))
    return state.select(
        F.col("node").cast("long").alias("node"),
        F.col("depth").cast("long").alias("depth"),
        F.expr("CAST(bit_count(anc_bm) AS BIGINT)").alias("n_ancestors"),
        (F.col("depth") == 0).cast("long").alias("is_root"),
    )


# --------------------------------------------------------------------------
# stream_pr_curve_maintain — the PR curve as incremental view maintenance
# --------------------------------------------------------------------------
@register(
    "stream_pr_curve_maintain",
    oracle=f"""
    WITH {_PR_CUM_SQL}
    SELECT source, CAST(s AS BIGINT) AS threshold, cum_tp,
           CAST(cum_n - cum_tp AS BIGINT) AS cum_fp,
           CAST(1000000 * cum_tp // cum_n AS BIGINT) AS precision_ppm,
           CASE WHEN tot_p = 0 THEN NULL
                ELSE CAST(1000000 * cum_tp // tot_p AS BIGINT)
           END AS recall_ppm
    FROM cum
    """,
)
def stream_pr_curve_maintain_q(spark, sf_dir):
    """Streaming maintenance of `eval_pr_curve` — the detector-quality
    dashboard you'd run WHILE a corpus ingests: each micro-batch folds
    its (group, score) → (count, positives) cells into keyed parquet
    state; the full precision-recall curve is derived from the state at
    read time and must equal the batch twin EXACTLY (same oracle — the
    `stream_uplift_maintain` IVM discipline).

    The IVM insight: curve POINTS are not batch-additive (cum_tp/cum_n
    depend on the global threshold sweep), but the per-(group, distinct
    score) census IS — pure SUM merges, bundling-independent, so any
    batch arrival order folds to the same state.  The window sweep is a
    post-aggregation over |distinct scores| state rows, never corpus
    rows.

    100 TB shape: per trigger O(batch) projection + a (group, score)-
    keyed partial agg; state cardinality is |groups| × |distinct
    scores| (the same granularity `eval_auc_rank` proves is the right
    reduction point), independent of rows ingested."""
    import os as _os
    import shutil
    import tempfile

    from ..streaming import read_documents_stream
    from . import finish_and_clean

    stream = read_documents_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_pr_curve_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = (
            batch_df.select(
                "source",
                F.col("n_chars").alias("s"),
                (F.col("lang") == "en").cast("long").alias("pos"),
            )
            .groupBy("source", "s")
            .agg(
                F.count(F.lit(1)).cast("long").alias("c"),
                F.sum("pos").cast("long").alias("p"),
            )
        )
        # first batch detected by state ABSENCE (transient read errors on
        # batch N>0 must fail the batch loudly, never reset the fold)
        if _os.path.isdir(state_path):
            state = sp.read.parquet(state_path)
            merged = (
                state.unionByName(part)
                .groupBy("source", "s")
                .agg(F.sum("c").alias("c"), F.sum("p").alias("p"))
            )
        else:
            merged = part
        commit_state_parquet(merged, state_path)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    state = spark.read.parquet(state_path)
    w_desc = Window.partitionBy("source").orderBy(F.desc("s"))
    w_all = Window.partitionBy("source")
    cum = state.select(
        "source",
        "s",
        "c",
        "p",
        F.sum("p").over(w_desc).cast("long").alias("cum_tp"),
        F.sum("c").over(w_desc).cast("long").alias("cum_n"),
        F.sum("p").over(w_all).cast("long").alias("tot_p"),
    )
    curve = cum.select(
        "source",
        F.col("s").cast("long").alias("threshold"),
        "cum_tp",
        (F.col("cum_n") - F.col("cum_tp")).cast("long").alias("cum_fp"),
        F.expr("CAST(1000000 * cum_tp DIV cum_n AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.when(
            F.col("tot_p") > 0,
            F.expr("CAST(1000000 * cum_tp DIV tot_p AS BIGINT)"),
        ).alias("recall_ppm"),
    )
    return finish_and_clean(curve, root)


# --------------------------------------------------------------------------
# graph_dag_lca_similarity — LCA + Wu-Palmer similarity over the DAG slice
# --------------------------------------------------------------------------
# Shared by the gate tier (`graph_dag_lca_similarity`, closure joins) and
# the production twin (`graph_dag_lca_frontier`, bucketed-bitmap AND) — the
# twin discipline: one oracle constant, two implementations gated equal.
_LCA_ORACLE_SQL = f"""
    WITH RECURSIVE e AS ({_DAG_EDGES_SQL}
    ),
    nodes AS (
      -- engine trap (measured, DuckDB 1.0.0): inside a WITH RECURSIVE
      -- block, a non-recursive CTE of the form "A UNION B" silently
      -- loses UNION's dedup -- DISTINCT must be explicit
      SELECT DISTINCT node FROM (
        SELECT child AS node FROM e UNION ALL SELECT parent FROM e)
    ),
    paths(src, dst, len) AS (
      SELECT child, parent, 1 FROM e
      UNION
      SELECT p.src, e2.parent, p.len + 1
      FROM paths p JOIN e e2 ON p.dst = e2.child
    ),
    depths AS (
      SELECT n.node AS node, COALESCE(MAX(p.len), 0) AS depth
      FROM nodes n LEFT JOIN paths p ON p.src = n.node
      GROUP BY n.node
    ),
    anc AS (
      SELECT DISTINCT src, dst FROM (
        SELECT node AS src, node AS dst FROM nodes
        UNION ALL
        SELECT src, dst FROM paths)
    ),
    pairs AS (
      SELECT a.node AS n1, b.node AS n2
      FROM nodes a JOIN nodes b ON a.node < b.node
      WHERE ('0x' || substring(md5('lca|' || CAST(a.node AS VARCHAR)
              || '|' || CAST(b.node AS VARCHAR)), 1, 8))::BIGINT % 100 < 3
    ),
    common AS (
      SELECT p.n1, p.n2, a1.dst AS anc_node, d.depth AS anc_depth
      FROM pairs p
      JOIN anc a1 ON a1.src = p.n1
      JOIN anc a2 ON a2.src = p.n2 AND a2.dst = a1.dst
      JOIN depths d ON d.node = a1.dst
    ),
    best_depth AS (
      SELECT n1, n2, MAX(anc_depth) AS lca_depth
      FROM common GROUP BY n1, n2
    ),
    lca AS (
      SELECT c.n1, c.n2, b.lca_depth, MIN(c.anc_node) AS lca_node
      FROM common c
      JOIN best_depth b ON b.n1 = c.n1 AND b.n2 = c.n2
        AND c.anc_depth = b.lca_depth
      GROUP BY c.n1, c.n2, b.lca_depth
    )
    SELECT CAST(p.n1 AS BIGINT) AS n1, CAST(p.n2 AS BIGINT) AS n2,
           CAST(d1.depth AS BIGINT) AS d1, CAST(d2.depth AS BIGINT) AS d2,
           CAST(l.lca_node AS BIGINT) AS lca_node,
           CAST(l.lca_depth AS BIGINT) AS lca_depth,
           CASE WHEN l.lca_depth IS NULL THEN NULL
                WHEN d1.depth + d2.depth = 0 THEN NULL
                ELSE CAST(2000 * l.lca_depth // (d1.depth + d2.depth)
                          AS BIGINT)
           END AS wup_milli
    FROM pairs p
    JOIN depths d1 ON d1.node = p.n1
    JOIN depths d2 ON d2.node = p.n2
    LEFT JOIN lca l ON l.n1 = p.n1 AND l.n2 = p.n2
    """


@register("graph_dag_lca_similarity", oracle=_LCA_ORACLE_SQL)
def graph_dag_lca_similarity_q(spark, sf_dir):
    """Lowest-common-ancestor + Wu-Palmer similarity over the ontology
    DAG slice — THE term-similarity primitive of ontology analytics
    (Wu-Palmer/Resnik families all start from "deepest ancestor the two
    terms share"; the reference's ArangoDB graph serves exactly such
    traversals over its subClassOf DAGs).  For md5-thinned node pairs:
    both terms' depths, the LCA (deepest common ancestor-OR-SELF, ties
    broken by MIN node id — deterministic), and Wu-Palmer similarity
    2·depth(lca)/(d1+d2) in milli (depth = longest path to a root, the
    `graph_dag_depth` convention; root-depth-0 pairs yield NULL, stated
    contract).

    Gate tier: ancestors via the same path-doubling closure as
    `graph_dag_depth` (slice-bounded by contract); the LCA argmax is
    a two-step exact reduction (MAX depth per pair, then MIN node at
    that depth) so engines cannot disagree on ties.  Production shape:
    ancestor SETS come from the `dag_depth_frontier` bitmap/bucketed-
    bitmap fold (anc_bm AND anc_bm = the common-ancestor set in one
    codegen op per pair), depths from the same relaxation — LCA at
    corpus scale is a bitwise-AND plus a highest-set-bit-by-depth
    lookup, never a closure join.

    100 TB shape: pairs × ancestors joins are bounded by the slice
    contract here; the production path above replaces them with
    per-pair O(label-width) bit math."""
    from ..plans.graph_query import stats_cut

    edges = _dag_edges(spark, sf_dir)
    reach = edges.select(
        F.col("child").alias("src"),
        F.col("parent").alias("dst"),
        F.lit(1).alias("len"),
    ).localCheckpoint(eager=True)
    for _ in range(6):  # 2^6 = 64 >= longest chain on the 60-node slice
        hops = (
            reach.alias("x")
            .join(reach.alias("y"), F.col("x.dst") == F.col("y.src"))
            .select(
                F.col("x.src").alias("src"),
                F.col("y.dst").alias("dst"),
                (F.col("x.len") + F.col("y.len")).alias("len"),
            )
        )
        # stats_cut, not bare localCheckpoint: reach feeds 3 branches per
        # round (§stats-compounding rule, gated by STATS_BLOWUP)
        reach = stats_cut(
            reach.unionByName(hops)
            .groupBy("src", "dst")
            .agg(F.max("len").alias("len"))
        )
    nodes = (
        edges.select(F.col("child").alias("node"))
        .unionByName(edges.select(F.col("parent").alias("node")))
        .distinct()
    )
    depths = (
        nodes.join(reach, nodes["node"] == reach["src"], "left")
        .groupBy("node")
        .agg(F.coalesce(F.max("len"), F.lit(0)).cast("long").alias("depth"))
    )
    anc = nodes.select(
        F.col("node").alias("src"), F.col("node").alias("dst")
    ).unionByName(reach.select("src", "dst")).distinct()
    a = nodes.select(F.col("node").alias("n1"))
    b = nodes.select(F.col("node").alias("n2"))
    key = F.concat(
        F.lit("lca|"),
        F.col("n1").cast("string"),
        F.lit("|"),
        F.col("n2").cast("string"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    pairs = (
        a.join(b, F.col("n1") < F.col("n2"))
        .filter(h % 100 < 3)
        .localCheckpoint(eager=True)
    )
    common = (
        pairs.join(
            anc.select(F.col("src").alias("n1"), F.col("dst").alias("anc_node")),
            on="n1",
        ).join(
            anc.select(F.col("src").alias("n2"), F.col("dst").alias("anc_node")),
            on=["n2", "anc_node"],
        )
    ).join(
        depths.select(
            F.col("node").alias("anc_node"), F.col("depth").alias("anc_depth")
        ),
        on="anc_node",
    )
    best_depth = common.groupBy("n1", "n2").agg(
        F.max("anc_depth").alias("lca_depth")
    )
    lca = (
        common.join(best_depth, on=["n1", "n2"])
        .filter(F.col("anc_depth") == F.col("lca_depth"))
        .groupBy("n1", "n2", "lca_depth")
        .agg(F.min("anc_node").alias("lca_node"))
    )
    return (
        pairs.join(
            depths.select(F.col("node").alias("n1"), F.col("depth").alias("d1")),
            on="n1",
        )
        .join(
            depths.select(F.col("node").alias("n2"), F.col("depth").alias("d2")),
            on="n2",
        )
        .join(lca, on=["n1", "n2"], how="left")
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("d1").cast("long").alias("d1"),
            F.col("d2").cast("long").alias("d2"),
            F.col("lca_node").cast("long").alias("lca_node"),
            F.col("lca_depth").cast("long").alias("lca_depth"),
            F.when(
                F.col("lca_depth").isNotNull() & (F.col("d1") + F.col("d2") > 0),
                F.expr("CAST(2000 * lca_depth DIV (d1 + d2) AS BIGINT)"),
            ).alias("wup_milli"),
        )
    )


@register("graph_dag_lca_frontier", oracle=_LCA_ORACLE_SQL)
def graph_dag_lca_frontier_q(spark, sf_dir):
    """The PRODUCTION LCA/Wu-Palmer path (round 10, VERDICT r9 #5 family):
    `lca_wu_palmer_bucketed` (plans/graph_query.py) — common ancestors via
    bucket-aligned bitwise AND of bucketed ancestor-or-self bitmaps
    (`dag_ancestors_bucketed`, the unbounded-universe widening the
    `dag_depth_frontier` docstring promises), depths from the depth-only
    layer relaxation.  Gated against the SAME oracle constant as the
    closure-join gate tier `graph_dag_lca_similarity`, so the bucketed
    bitmap machinery (relaxation, self-bit fold, AND, set-bit explode,
    deepest/min-node reduction) is pinned bit-identical to the naive
    replay — the twin discipline.

    100 TB shape: no pairs × ancestors closure join anywhere — per pair
    the work is O(shared buckets) codegen ANDs plus O(|common ancestors|)
    exploded rows; ancestor state is sparse (node, bucket, bm) rows
    maintained by per-round keyed shuffles."""
    from ..plans.graph_query import lca_wu_palmer_bucketed

    edges = _dag_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("child").alias("node"))
        .unionByName(edges.select(F.col("parent").alias("node")))
        .distinct()
    )
    a = nodes.select(F.col("node").alias("n1"))
    b = nodes.select(F.col("node").alias("n2"))
    key = F.concat(
        F.lit("lca|"),
        F.col("n1").cast("string"),
        F.lit("|"),
        F.col("n2").cast("string"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    pairs = (
        a.join(b, F.col("n1") < F.col("n2"))
        .filter(h % 100 < 3)
        .localCheckpoint(eager=True)
    )
    return lca_wu_palmer_bucketed(edges, pairs)


# --------------------------------------------------------------------------
# eval_kendall_tau_bucketed — the guard-named fallback, implemented + gated
# --------------------------------------------------------------------------
@register(
    "eval_kendall_tau_bucketed",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x,
             CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY o_custkey
    ),
    pairs AS (
      SELECT a.x - b.x AS dx, a.y - b.y AS dy
      FROM per_cust a JOIN per_cust b ON a.cust < b.cust
    ),
    census AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
             CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
             CAST(SUM(CASE WHEN dx * dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
      FROM pairs
    )
    SELECT n_pairs, n_conc, n_disc, n_tied,
           CAST(CASE WHEN n_pairs = 0 THEN NULL
                WHEN n_conc >= n_disc
                THEN 1000000 * (n_conc - n_disc) // n_pairs
                ELSE -(1000000 * (n_disc - n_conc) // n_pairs) END AS BIGINT)
             AS tau_a_ppm
    FROM census
    """,
)
def eval_kendall_tau_bucketed_q(spark, sf_dir):
    """The fallback `eval_kendall_tau_full`'s guard NAMES, implemented and
    differentially gated against the same O(n²) oracle census (the twin
    discipline): Kendall τ_a when BOTH metrics are near-continuous —
    here x = spend cents and y = max single-order cents per customer,
    both ~n distinct values, so the exact-grid path's |x-values| ≤ 200
    guard WOULD trip.

    Bucketed-x dominance counting with a boundary-strip join:
      - bucket x into fixed-WIDTH value buckets (xb = x DIV 4e6 —
        value-derived, so xb_i < xb_j ⟹ x_i < x_j STRICTLY and the
        bucketing is engine/partitioning-independent);
      - CROSS-BUCKET pairs: the same exact strict-CDF grid machinery as
        the full path with xb as the small axis — per point j,
        D_j = #(xb < xb_j) − H(xb_j⁻, y_j), C_j = H − E, orientation
        fixed by the strict bucket inequality;
      - SAME-BUCKET pairs (the boundary strip): an all-pairs join
        PARTITIONED BY BUCKET — O(Σ n_b²) = O(n²/B) total, each strip
        bounded (occupancy guard, loud; remedy = narrow the width or
        recurse the bucketing);
      - ties fall out by subtraction (n_pairs − conc − disc), exact.

    100 TB shape: two keyed aggs + a B-row broadcast dim crossed with
    the y grid + two PARTITIONED window passes + one equi-join back +
    per-bucket bounded strips — nothing global, nothing quadratic in n;
    B and the strip bound are the tuning pair (B·strip ≈ n keeps both
    sides balanced)."""
    from ..operators.guards import check_driver_bound

    width = 4_000_000
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x"),
            F.max(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
        .withColumn("xb", F.expr(f"CAST(x DIV {width} AS BIGINT)"))
    )
    buckets = per.select("xb").distinct()
    check_driver_bound(
        buckets.count(),
        512,
        "eval_kendall_tau_bucketed: bucket dim",
        "widen the bucket width (B*strip ~ n balances the two sides)",
    )
    [mx] = per.groupBy("xb").count().agg(F.max("count").alias("m")).collect()
    check_driver_bound(
        int(mx.m),
        4096,
        "eval_kendall_tau_bucketed: max strip occupancy",
        "narrow the bucket width or recurse the bucketing inside hot strips",
    )
    # the decomposition itself is the reusable operator (factored, the
    # eval_stats twin discipline); the guards above are the catalog
    # binding's contract
    from ..operators.eval_stats import kendall_tau_census_bucketed

    return kendall_tau_census_bucketed(per, "cust", "x", "y", width)



# --------------------------------------------------------------------------
# eval_wilcoxon_signed_rank — paired nonparametric shift test, exact ranks
# --------------------------------------------------------------------------
@register(
    "eval_wilcoxon_signed_rank",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS cust,
             CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-07-01'
                  THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END)
               - SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-07-01'
                  THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS d
      FROM orders GROUP BY o_custkey
    ),
    nz AS (SELECT d, ABS(d) AS ad FROM per WHERE d <> 0),
    per_ad AS (
      SELECT ad, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
      FROM nz GROUP BY ad
    ),
    ranked AS (
      SELECT ad, c, p,
             2 * (SUM(c) OVER (ORDER BY ad) - c) + c + 1 AS r2
      FROM per_ad
    ),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_eff,
             CAST(SUM(p) AS BIGINT) AS n_pos,
             CAST(SUM(p * r2) AS BIGINT) AS w_plus2
      FROM ranked
    )
    SELECT n_eff, n_pos, w_plus2,
           CAST(n_eff * (n_eff + 1) - w_plus2 AS BIGINT) AS w_minus2,
           CAST(2 * w_plus2 - n_eff * (n_eff + 1) AS BIGINT) AS shift_num4
    FROM agg
    """,
)
def eval_wilcoxon_signed_rank_q(spark, sf_dir):
    """Wilcoxon signed-rank test on PAIRED per-entity metrics — the
    nonparametric shift test for 'did the same customers spend more
    after the cut date': d = H2 − H1 spend cents per customer, zeros
    dropped (the standard convention), |d| midranks computed exactly in
    integers by DOUBLING (the `eval_auc_rank` trick: 2·avg-rank =
    2·cum_before + c + 1 is always integral), W⁺ as the doubled
    rank-sum of positive diffs.  Emits the exact complement
    W⁻ = n(n+1) − W⁺ (doubled) and the mean-centered shift numerator
    4·(W⁺ − E[W⁺]) = 2·W⁺₂ − n(n+1) — sign says direction, magnitude
    vs n(n+1)(2n+1)/6 variance is float post-processing OUTSIDE the
    gated contract (the `profile_moments` doctrine).  Completes the
    paired-eval family: McNemar (binary), CUPED (variance-reduced
    means), Wilcoxon (ordinal/robust shift).

    100 TB shape: one keyed agg to per-entity diffs, one hash agg to
    |d|-value granularity (map-side combinable), ONE window cumsum over
    distinct |d| values, 1-row reduce — the auc_rank envelope."""
    cut = "1998-07-01"
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("o_orderdate") >= F.lit(cut).cast("timestamp"),
                        F.floor(F.col("o_totalprice") * 100).cast("long"),
                    ).otherwise(F.lit(0))
                )
                - F.sum(
                    F.when(
                        F.col("o_orderdate") < F.lit(cut).cast("timestamp"),
                        F.floor(F.col("o_totalprice") * 100).cast("long"),
                    ).otherwise(F.lit(0))
                )
            )
            .cast("long")
            .alias("d")
        )
    )
    from ..operators.eval_stats import wilcoxon_signed_rank

    return wilcoxon_signed_rank(per, "d")


# --------------------------------------------------------------------------
# sample_allocation_largest_remainder — exact budget apportionment
# --------------------------------------------------------------------------
@register(
    "sample_allocation_largest_remainder",
    oracle="""
    WITH sized AS (
      SELECT source,
             CAST(SUM(GREATEST(n_chars // 4, 1)) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM sized),
    quota AS (
      SELECT source, tokens,
             CAST(100000 * tokens // t AS BIGINT) AS base_alloc,
             CAST(100000 * tokens % t AS BIGINT) AS rem_num
      FROM sized, tot
    ),
    ranked AS (
      SELECT source, tokens, base_alloc, rem_num,
             CAST(row_number() OVER (ORDER BY rem_num DESC, source)
               AS BIGINT) AS rem_rank,
             CAST(100000 - SUM(base_alloc) OVER () AS BIGINT) AS n_extra
      FROM quota
    )
    SELECT source, tokens, base_alloc, rem_num,
           CAST(CASE WHEN rem_rank <= n_extra THEN 1 ELSE 0 END AS BIGINT)
             AS extra,
           CAST(base_alloc + CASE WHEN rem_rank <= n_extra THEN 1 ELSE 0 END
             AS BIGINT) AS alloc
    FROM ranked
    """,
)
def sample_allocation_largest_remainder_q(spark, sf_dir):
    """Exact largest-remainder (Hamilton) apportionment of a sampling
    budget across strata — the allocation step every proportional
    training-data mix needs BEFORE `sample_token_budget_mix` draws:
    floor quotas ⌊K·w_h/W⌋ leave K − Σfloor units; they go to the
    strata with the largest remainders (deterministic tie-break by
    stratum id), so Σalloc = K EXACTLY and every stratum is within 1 of
    its real quota — the apportionment guarantee pro-rata-then-round
    schemes (which can over/undershoot K by |strata|) do not give.
    Weights = estimated tokens per source (the packer's measure).

    Exactness: quotas and remainders are pure integer div/mod on
    non-negative operands; the remainder rank is fully keyed
    (rem desc, source).  The Σfloor window and the remainder rank run
    on the |strata|-row frame — bounded-dim single-partition by the
    same contract as `eval_kendall_tau_full`'s x-census (strata
    cardinality is the contract bound, documented).

    100 TB shape: one hash agg corpus → |strata| rows; everything after
    is dim-frame arithmetic — the allocation of a trillion-token budget
    costs one scan."""
    sized = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.greatest(F.expr("n_chars DIV 4"), F.lit(1)))
            .cast("long")
            .alias("tokens")
        )
    )
    from ..operators.eval_stats import largest_remainder_allocation

    return largest_remainder_allocation(sized, "source", "tokens", 100000)


# --------------------------------------------------------------------------
# graph_betweenness_bounded — bounded-radius betweenness centrality
# --------------------------------------------------------------------------
@register(
    "graph_betweenness_bounded",
    oracle=f"""
    WITH RECURSIVE e AS ({_SCC_EDGES_SQL}
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
    ),
    -- walk ENUMERATION (multiplicity = one row per walk): the oracle's
    -- naive tier; the Spark side aggregates counts per hop instead
    walks(s, t, k) AS (
      SELECT src, dst, 1 FROM e
      UNION ALL
      SELECT w.s, e2.dst, w.k + 1 FROM walks w
      JOIN e e2 ON e2.src = w.t WHERE w.k < 6
    ),
    sigma_all AS (
      SELECT s, t, k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM walks GROUP BY s, t, k
    ),
    dmin AS (
      SELECT s, t, MIN(k) AS d FROM sigma_all WHERE s <> t GROUP BY s, t
    ),
    sigma AS (
      SELECT a.s, a.t, m.d, a.cnt AS sg
      FROM sigma_all a JOIN dmin m ON m.s = a.s AND m.t = a.t AND m.d = a.k
    ),
    contrib AS (
      SELECT sv.t AS v,
             CAST(1000000 * sv.sg * vt.sg // st.sg AS BIGINT) AS c_milli
      FROM sigma sv
      JOIN sigma vt ON vt.s = sv.t
      JOIN sigma st ON st.s = sv.s AND st.t = vt.t
        AND st.d = sv.d + vt.d
      WHERE sv.s <> vt.t AND sv.t <> sv.s AND sv.t <> vt.t
    )
    SELECT CAST(n.node AS BIGINT) AS node,
           CAST(COALESCE(SUM(c.c_milli), 0) AS BIGINT) AS betweenness_ppm,
           CAST(COUNT(c.c_milli) AS BIGINT) AS n_contribs
    FROM nodes n LEFT JOIN contrib c ON c.v = n.node
    GROUP BY n.node
    """,
)
def graph_betweenness_bounded_q(spark, sf_dir):
    """Bounded-radius betweenness centrality over the directed slice —
    the brokerage metric of the centrality canon (pagerank = influence,
    HITS = authority, betweenness = CHOKEPOINTS): for every node v, the
    sum over (s, t) pairs of the fraction of shortest s→t paths that
    pass through v, restricted to shortest paths of length ≤ 6 — the
    k-betweenness variant production systems actually compute (full
    betweenness needs all-pairs shortest paths; bounded-radius keeps
    the semantics local and the cost bounded, and on small-world graphs
    captures most of the mass).

    Exactness: shortest-path COUNTS σ are walk counts at the minimal
    hop k (a shortest walk cannot revisit, so walk-count = path-count
    at k = d); the pair contribution is the per-pair truncated integer
    1e6·σ_sv·σ_vt DIV σ_st summed per v — order-independent, so
    partitioning cannot change the result.  The Bellman combination
    σ_sv·σ_vt with d_sv + d_vt = d_st is the Brandes identity.

    Plan: Spark AGGREGATES counts per hop (W_{{k+1}} = W_k ⋈ A with a
    (s,t)-keyed SUM — the matrix-power shape, O(L) keyed shuffles,
    counts never enumerated), where the oracle's recursive CTE
    enumerates one row PER WALK — the naive tier the aggregated plan
    is gated against.  100 TB shape: per-hop joins keyed by the
    frontier endpoint; at corpus scale s is restricted to a sampled
    source set (Brandes sampling, the documented production estimator)
    and the combination join is keyed by v — nothing all-pairs beyond
    the slice contract."""
    from ..plans.graph_query import betweenness_bounded

    return betweenness_bounded(_scc_edges(spark, sf_dir), max_hops=6)


# --------------------------------------------------------------------------
# eval_rank_biased_overlap — RBO@10 between two rankers, exact integer terms
# --------------------------------------------------------------------------
_RBO_W_SQL = """(VALUES (1, 100000), (2, 90000), (3, 81000), (4, 72900),
      (5, 65610), (6, 59049), (7, 53144), (8, 47829), (9, 43046),
      (10, 38742)) AS w(d, w_ppm)"""


@register(
    "eval_rank_biased_overlap",
    oracle=f"""
    WITH scored AS (
      SELECT source, doc_id, n_chars AS a,
             CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
                    t -> t IN ('the','a','of','and','to','in','is')))
                  // len(string_split_regex(text, '\\s+')) AS BIGINT) AS b
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY a DESC, doc_id) AS BIGINT) AS ra,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY b DESC, doc_id) AS BIGINT) AS rb
      FROM scored
    ),
    both_top AS (
      SELECT source, GREATEST(ra, rb) AS m
      FROM ranked WHERE ra <= 10 AND rb <= 10
    ),
    terms AS (
      SELECT b.source, w.d, w.w_ppm,
             CAST(COUNT(*) AS BIGINT) AS overlap_d
      FROM both_top b JOIN {_RBO_W_SQL} ON b.m <= w.d
      GROUP BY b.source, w.d, w.w_ppm
    )
    SELECT source,
           CAST(SUM(w_ppm * overlap_d // d) AS BIGINT) AS rbo_ppm_trunc,
           CAST(MAX(CASE WHEN d = 10 THEN overlap_d END) AS BIGINT)
             AS overlap_at_10
    FROM terms GROUP BY source
    """,
)
def eval_rank_biased_overlap_q(spark, sf_dir):
    """Rank-biased overlap (RBO@10, p = 0.9, truncated — no residual term,
    stated contract) between two rankers of the same items per group —
    the top-weighted rank-agreement metric for comparing retrieval runs
    or model rankings (Kendall/Spearman weight all positions equally;
    RBO weights the head geometrically, which is what retrieval cares
    about).  Ranker A = char length, B = stopword density, each under a
    fully keyed total order.

    Exactness: the geometric weights (1−p)·p^(d−1) are a HARDCODED
    integer ppm table (the `eval_ranking_ndcg` discount-table
    precedent — no float pow in either engine); per-depth overlap uses
    the max-rank census (a doc in both top-10s contributes to every
    depth ≥ max(ra, rb), so overlap_d = #docs with max-rank ≤ d — one
    join against the 10-row weight dim, no per-depth set intersection);
    each term w_d·overlap_d DIV d is an integer, so the sum is
    order-independent.  Truncated RBO@10 caps at Σw = 651,320 ppm
    (= 1 − p¹⁰), documented.

    100 TB shape: two within-group row_number windows (per-group
    partitions) + a 10-row broadcast dim join + one group aggregate —
    groups scale out; only top-10 rows leave each group."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").alias("a"),
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("b"),
    )
    from ..operators.eval_stats import rank_biased_overlap_topk

    return rank_biased_overlap_topk(scored, "source", "doc_id", "a", "b")


# --------------------------------------------------------------------------
# graph_eccentricity_bounded — radius-6 reachability/eccentricity profile
# --------------------------------------------------------------------------
@register(
    "graph_eccentricity_bounded",
    oracle=f"""
    WITH RECURSIVE e AS ({_SCC_EDGES_SQL}
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
    ),
    walks(s, t, k) AS (
      SELECT src, dst, 1 FROM e
      UNION ALL
      SELECT w.s, e2.dst, w.k + 1 FROM walks w
      JOIN e e2 ON e2.src = w.t WHERE w.k < 6
    ),
    dmin AS (
      SELECT s, t, CAST(MIN(k) AS BIGINT) AS d FROM walks
      WHERE s <> t GROUP BY s, t
    )
    SELECT CAST(n.node AS BIGINT) AS node,
           CAST(COALESCE(COUNT(m.t), 0) AS BIGINT) AS n_reach,
           CAST(COALESCE(MAX(m.d), 0) AS BIGINT) AS ecc,
           CAST(COALESCE(SUM(m.d), 0) AS BIGINT) AS sum_dist
    FROM nodes n LEFT JOIN dmin m ON m.s = n.node
    GROUP BY n.node
    """,
)
def graph_eccentricity_bounded_q(spark, sf_dir):
    """Bounded-radius (k ≤ 6) eccentricity + reachability profile per
    node — the 'how far is everything from here' audit completing the
    bounded-radius family (`graph_betweenness_bounded` shares the exact
    same shortest-distance table): out-reach set size, eccentricity
    (max shortest distance), and the closeness numerator Σd within the
    radius.  Closeness centrality 1e6·n_reach²/(n·Σd) is float
    post-processing of these integers (the `profile_moments` doctrine).

    Same walk-count machinery as betweenness: Spark aggregates per-hop
    counts (matrix-power joins, O(L) keyed shuffles); the oracle's
    recursive CTE enumerates one row per walk — naive tier vs
    aggregated plan, gated equal.  At corpus scale the radius bound IS
    the contract (bounded-radius closeness/eccentricity are the
    standard large-graph variants) and sources are sampled
    Brandes-style."""
    from ..plans.graph_query import bounded_shortest_counts

    edges = _scc_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dmin = bounded_shortest_counts(edges, max_hops=6)
    return (
        nodes.join(dmin, nodes["node"] == dmin["src"], "left")
        .groupBy("node")
        .agg(
            F.count(F.col("dst")).cast("long").alias("n_reach"),
            F.coalesce(F.max("d"), F.lit(0)).cast("long").alias("ecc"),
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("sum_dist"),
        )
        .select(F.col("node").cast("long").alias("node"), "n_reach", "ecc", "sum_dist")
    )


# --------------------------------------------------------------------------
# stream_allocation_maintain — the Hamilton allocation as IVM
# --------------------------------------------------------------------------
@register(
    "stream_allocation_maintain",
    oracle="""
    WITH sized AS (
      SELECT source,
             CAST(SUM(GREATEST(n_chars // 4, 1)) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM sized),
    quota AS (
      SELECT source, tokens,
             CAST(100000 * tokens // t AS BIGINT) AS base_alloc,
             CAST(100000 * tokens % t AS BIGINT) AS rem_num
      FROM sized, tot
    ),
    ranked AS (
      SELECT source, tokens, base_alloc, rem_num,
             CAST(row_number() OVER (ORDER BY rem_num DESC, source)
               AS BIGINT) AS rem_rank,
             CAST(100000 - SUM(base_alloc) OVER () AS BIGINT) AS n_extra
      FROM quota
    )
    SELECT source, tokens, base_alloc, rem_num,
           CAST(CASE WHEN rem_rank <= n_extra THEN 1 ELSE 0 END AS BIGINT)
             AS extra,
           CAST(base_alloc + CASE WHEN rem_rank <= n_extra THEN 1 ELSE 0 END
             AS BIGINT) AS alloc
    FROM ranked
    """,
)
def stream_allocation_maintain_q(spark, sf_dir):
    """Streaming maintenance of `sample_allocation_largest_remainder` —
    the budget dashboard you'd run WHILE a corpus ingests: per-batch
    (source → token) sums fold into keyed parquet state (pure SUM,
    bundling-independent); the Hamilton apportionment is derived from
    the |strata|-row state at read time and must equal the batch twin
    EXACTLY (same oracle — the `stream_pr_curve_maintain` IVM
    discipline).  The allocation itself is NOT batch-additive (floor
    quotas and remainder ranks depend on the global totals); the
    maintained sufficient statistic is the per-stratum token census.

    100 TB shape: per trigger O(batch) projection + a source-keyed
    partial agg; state is |strata| rows regardless of rows ingested;
    the apportionment is dim-frame arithmetic at read time."""
    import os as _os
    import shutil
    import tempfile

    from ..streaming import read_documents_stream
    from . import finish_and_clean

    stream = read_documents_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_alloc_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.groupBy("source").agg(
            F.sum(F.greatest(F.expr("n_chars DIV 4"), F.lit(1)))
            .cast("long")
            .alias("tokens")
        )
        if _os.path.isdir(state_path):
            state = sp.read.parquet(state_path)
            merged = (
                state.unionByName(part)
                .groupBy("source")
                .agg(F.sum("tokens").cast("long").alias("tokens"))
            )
        else:
            merged = part
        commit_state_parquet(merged, state_path)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    from ..operators.eval_stats import largest_remainder_allocation

    sized = spark.read.parquet(state_path)
    out = largest_remainder_allocation(sized, "source", "tokens", 100000)
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# temporal_holt_linear — trend-aware double exponential smoothing, exact
# --------------------------------------------------------------------------
@register(
    "temporal_holt_linear",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id) AS BIGINT) AS rn,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS v
      FROM events WHERE user_id < 50
    ),
    hw(user_id, rn, lvl, trd) AS (
      SELECT user_id, rn, v, CAST(0 AS BIGINT) FROM base WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn,
             (h.lvl + h.trd + s.v) // 2,
             (h.trd + ((h.lvl + h.trd + s.v) // 2 - h.lvl)) // 2
      FROM hw h JOIN base s ON s.user_id = h.user_id AND s.rn = h.rn + 1
    ),
    tail AS (
      SELECT user_id, MAX(rn) AS n_events FROM hw GROUP BY user_id
    )
    SELECT t.user_id, t.n_events,
           CAST(h.lvl AS BIGINT) AS level_units,
           CAST(h.trd AS BIGINT) AS trend_units,
           CAST(h.lvl + h.trd AS BIGINT) AS forecast_units
    FROM tail t JOIN hw h ON h.user_id = t.user_id AND h.rn = t.n_events
    """,
)
def temporal_holt_linear_q(spark, sf_dir):
    """Holt double exponential smoothing (alpha = beta = 1/2) per user —
    the TREND-AWARE sibling of `temporal_ema_smooth` (EMA structurally
    lags a trending series; Holt carries an explicit integer trend state
    and its level+trend is the 1-step-ahead forecast).  Two COUPLED
    recursive states per step — what windows cannot express; the fold
    can (struct accumulator).

    Exactness: values floor-quantized to micro-units; both halvings use
    truncating division (Spark's sign-safe shiftright(x − x%2, 1)
    identity ≡ DuckDB's `//` ≡ the recursive-CTE unrolling the oracle
    runs — genuinely different fold machinery landing on the same two
    BIGINTs per user, the `temporal_ema_smooth` doctrine with twice the
    state).  Order = (event time, event_id), a total order.

    100 TB shape: ONE keyed shuffle (collect_list + sort per user), fold
    is a per-row codegen expression; per-key state is the key's own
    sequence — cap whale keys upstream, the documented ema caveat."""
    from ..operators.temporal import holt_linear_integer

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    prepped = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000000).cast("long").alias("v"),
    )
    return holt_linear_integer(prepped, ["user_id"], ["ts", "event_id"], "v")


# --------------------------------------------------------------------------
# sample_systematic_interval — classic every-k-th systematic sample
# --------------------------------------------------------------------------
@register(
    "sample_systematic_interval",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rnk
      FROM documents
    )
    SELECT doc_id, source, rnk
    FROM ranked WHERE (rnk - 1) % 10 = 3
    """,
)
def sample_systematic_interval_q(spark, sf_dir):
    """Systematic (every-k-th) sampling under ONE keyed total order —
    the classic survey-sampling design completing the family
    (hash-uniform, stratified, weighted, temperature, bootstrap,
    chronological): rank rows by doc_id, keep rank ≡ offset (mod k)
    with k = 10, offset = 3.  Systematic sampling gives implicit
    stratification along the order key for free (every window of k
    contributes exactly one row) — the property hash sampling does not
    have; the trade is vulnerability to periodicity in the key,
    documented.

    Exactness: the order is fully keyed (doc_id unique), so the rank —
    and therefore the SAMPLE — is deterministic across engines, retries,
    and repartitioning (the sampling doctrine).

    100 TB shape: the global rank comes from the distributed two-pass
    `with_global_rank` (range-bucketed pass-1 stats + per-bucket ranks —
    NO single-partition window; the oracle's ROW_NUMBER() OVER () is the
    naive tier); selection is a codegen modulo filter."""
    from ..operators.windows import with_global_rank

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = with_global_rank(docs, ["doc_id"], "rnk")
    return ranked.filter((F.col("rnk") - 1) % 10 == 3).select(
        "doc_id", "source", F.col("rnk").cast("long").alias("rnk")
    )


# --------------------------------------------------------------------------
# eval_friedman_ranks — k=3 paired-detector rank test, exact integer core
# --------------------------------------------------------------------------
@register(
    "eval_friedman_ranks",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS sa,
             CAST(6 * len(string_split_regex(text, '\\s+')) AS BIGINT) AS sb,
             CAST(30 * len(list_filter(string_split_regex(text, '\\s+'),
                    t -> t IN ('the','a','of','and','to','in','is')))
               AS BIGINT) AS sc
      FROM documents
    ),
    r2 AS (
      SELECT doc_id,
             CAST(2 * (CASE WHEN sb < sa THEN 1 ELSE 0 END
                     + CASE WHEN sc < sa THEN 1 ELSE 0 END)
                + (CASE WHEN sb = sa THEN 1 ELSE 0 END
                 + CASE WHEN sc = sa THEN 1 ELSE 0 END) + 2 AS BIGINT) AS ra2,
             CAST(2 * (CASE WHEN sa < sb THEN 1 ELSE 0 END
                     + CASE WHEN sc < sb THEN 1 ELSE 0 END)
                + (CASE WHEN sa = sb THEN 1 ELSE 0 END
                 + CASE WHEN sc = sb THEN 1 ELSE 0 END) + 2 AS BIGINT) AS rb2,
             CAST(2 * (CASE WHEN sa < sc THEN 1 ELSE 0 END
                     + CASE WHEN sb < sc THEN 1 ELSE 0 END)
                + (CASE WHEN sa = sc THEN 1 ELSE 0 END
                 + CASE WHEN sb = sc THEN 1 ELSE 0 END) + 2 AS BIGINT) AS rc2
      FROM scored
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ra2) AS BIGINT) AS r2_a,
             CAST(SUM(rb2) AS BIGINT) AS r2_b,
             CAST(SUM(rc2) AS BIGINT) AS r2_c
      FROM r2
    )
    SELECT n, r2_a, r2_b, r2_c,
           CAST((r2_a - 4 * n) * (r2_a - 4 * n)
              + (r2_b - 4 * n) * (r2_b - 4 * n)
              + (r2_c - 4 * n) * (r2_c - 4 * n) AS BIGINT) AS friedman_num4
    FROM agg
    """,
)
def eval_friedman_ranks_q(spark, sf_dir):
    """Friedman k-sample paired rank test (k = 3 detectors scoring the
    SAME documents) — completes the paired-eval arc: McNemar (2 binary) →
    CUPED (means) → Wilcoxon (2 ordinal) → Friedman (k ordinal).  Each
    document ranks its three scores WITHIN-ROW with exact doubled
    midranks (2·#less + #equal-excluding-self + 2 — ties stay integral, the
    `eval_auc_rank` trick applied row-wise via pure CASE comparisons);
    the gated contract is the exact integer core: per-treatment doubled
    rank sums R2_j, n, and friedman_num4 = Σ(R2_j − n(k+1))² =
    4·Σ(R_j − E[R_j])² — the χ² statistic's numerator (the float
    12/(nk(k+1)) scaling and the tie-correction denominator are
    post-processing OUTSIDE the contract, the `profile_moments`
    doctrine).  Scores: chars, 6·tokens, 30·stopwords — three length/
    quality detectors whose disagreement is the thing under test.

    Identity check built in: Σ_j R2_j = 12n exactly (each row's three
    doubled midranks sum to 2(1+2+3) = 12), pinned by test.

    100 TB shape: ONE codegen projection (row-wise CASE ranks — no
    joins, no windows, no shuffle beyond the 4-cell reduce); a
    trillion-document three-way comparison costs one scan."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.col("n_chars").cast("long").alias("sa"),
        (6 * F.expr("size(split(text, '\\\\s+'))")).cast("long").alias("sb"),
        (
            30
            * F.expr(
                "size(filter(split(text, '\\\\s+'),"
                " t -> t IN ('the','a','of','and','to','in','is')))"
            )
        )
        .cast("long")
        .alias("sc"),
    )

    def r2(me, o1, o2):
        return (
            2
            * (
                (F.col(o1) < F.col(me)).cast("long")
                + (F.col(o2) < F.col(me)).cast("long")
            )
            + (F.col(o1) == F.col(me)).cast("long")
            + (F.col(o2) == F.col(me)).cast("long")
            + 2
        )

    ranked = scored.select(
        r2("sa", "sb", "sc").alias("ra2"),
        r2("sb", "sa", "sc").alias("rb2"),
        r2("sc", "sa", "sb").alias("rc2"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ra2").cast("long").alias("r2_a"),
        F.sum("rb2").cast("long").alias("r2_b"),
        F.sum("rc2").cast("long").alias("r2_c"),
    )
    return agg.select(
        "n",
        "r2_a",
        "r2_b",
        "r2_c",
        (
            (F.col("r2_a") - 4 * F.col("n")) * (F.col("r2_a") - 4 * F.col("n"))
            + (F.col("r2_b") - 4 * F.col("n")) * (F.col("r2_b") - 4 * F.col("n"))
            + (F.col("r2_c") - 4 * F.col("n")) * (F.col("r2_c") - 4 * F.col("n"))
        )
        .cast("long")
        .alias("friedman_num4"),
    )


# --------------------------------------------------------------------------
# eval_cochran_q — k=3 paired BINARY detectors, exact integer core
# --------------------------------------------------------------------------
@register(
    "eval_cochran_q",
    oracle="""
    WITH verdicts AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS va,
             CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS vb,
             CASE WHEN 1000000 * len(list_filter(string_split_regex(text, '\\s+'),
                    t -> t IN ('the','a','of','and','to','in','is')))
                  // len(string_split_regex(text, '\\s+')) > 40000
                  THEN 1 ELSE 0 END AS vc
      FROM documents
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(va) AS BIGINT) AS c_a,
             CAST(SUM(vb) AS BIGINT) AS c_b,
             CAST(SUM(vc) AS BIGINT) AS c_c,
             CAST(SUM(va + vb + vc) AS BIGINT) AS sum_r,
             CAST(SUM((va + vb + vc) * (va + vb + vc)) AS BIGINT) AS sum_r2
      FROM verdicts
    )
    SELECT n, c_a, c_b, c_c, sum_r, sum_r2,
           CAST(2 * (3 * (c_a * c_a + c_b * c_b + c_c * c_c)
                     - sum_r * sum_r) AS BIGINT) AS q_num,
           CAST(3 * sum_r - sum_r2 AS BIGINT) AS q_den,
           CASE WHEN 3 * sum_r - sum_r2 = 0 THEN NULL
                ELSE CAST(1000 * (2 * (3 * (c_a * c_a + c_b * c_b + c_c * c_c)
                          - sum_r * sum_r)) // (3 * sum_r - sum_r2) AS BIGINT)
           END AS q_milli
    FROM agg
    """,
)
def eval_cochran_q_q(spark, sf_dir):
    """Cochran's Q test — k = 3 paired BINARY detectors on the SAME
    documents (language, length, stopword-density screens): do the
    screens fire at the same rate, accounting for per-document pairing?
    Completes the paired-eval lattice along the other axis:
    McNemar (k=2 binary) → Cochran Q (k binary), parallel to
    Wilcoxon (k=2 ordinal) → Friedman (k ordinal) — and Q reduces to
    McNemar's χ² exactly at k = 2.

    Exactness: Q = (k−1)(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²) is a
    pure integer ratio (C_j = per-detector fire counts, R_i = per-row
    fire counts); the gated contract emits the exact numerator,
    denominator, and the milli quotient (both operands provably
    non-negative: Cauchy-Schwarz for the numerator, R_i ≤ k for the
    denominator; all-rows-unanimous ⇒ denominator 0 ⇒ NULL, stated).

    100 TB shape: ONE codegen projection (three CASE verdicts + the
    row-sum square) folding map-side to 6 integer cells — single pass,
    1-row reduce, no joins, no windows."""
    docs = _t(spark, sf_dir, "documents")
    verdicts = docs.select(
        (F.col("lang") == "en").cast("long").alias("va"),
        (F.col("n_chars") > 300).cast("long").alias("vb"),
        (
            F.expr(
                "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
                " t -> t IN ('the','a','of','and','to','in','is')))"
                " DIV size(split(text, '\\\\s+')) AS BIGINT)"
            )
            > 40000
        )
        .cast("long")
        .alias("vc"),
    )
    r = F.col("va") + F.col("vb") + F.col("vc")
    agg = verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("va").cast("long").alias("c_a"),
        F.sum("vb").cast("long").alias("c_b"),
        F.sum("vc").cast("long").alias("c_c"),
        F.sum(r).cast("long").alias("sum_r"),
        F.sum(r * r).cast("long").alias("sum_r2"),
    )
    q_num = 2 * (
        3
        * (
            F.col("c_a") * F.col("c_a")
            + F.col("c_b") * F.col("c_b")
            + F.col("c_c") * F.col("c_c")
        )
        - F.col("sum_r") * F.col("sum_r")
    )
    q_den = 3 * F.col("sum_r") - F.col("sum_r2")
    return agg.select(
        "n",
        "c_a",
        "c_b",
        "c_c",
        "sum_r",
        "sum_r2",
        q_num.cast("long").alias("q_num"),
        q_den.cast("long").alias("q_den"),
        F.when(
            q_den != 0,
            F.expr(
                "CAST(1000 * (2 * (3 * (c_a * c_a + c_b * c_b + c_c * c_c)"
                " - sum_r * sum_r)) DIV (3 * sum_r - sum_r2) AS BIGINT)"
            ),
        ).alias("q_milli"),
    )
