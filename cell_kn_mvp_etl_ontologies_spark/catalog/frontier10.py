"""Round-13 extension batch.

The VERDICT r12 prescriptions first:

- `graph_louvain_rounds` (#3) — full deterministic Louvain on top of the
  `graph_louvain_move` primitive: fixed-round locally-dominant move
  matching (every applied batch is community-disjoint, so modularity
  strictly ascends), then ONE supervertex coarsening step; the unrolled-CTE
  oracle replays every round's matching exactly.
- `pack_sequences_bpe` (#4) — the tokenizer-true packing chain: FFD packing
  over REAL `text_bpe_encode` token counts instead of the n_chars/16 proxy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# graph_louvain_rounds — full deterministic Louvain + one coarsening step
# --------------------------------------------------------------------------
_LOUVAIN_ROUNDS = 4


def _louvain_oracle(n_rounds: int = _LOUVAIN_ROUNDS) -> str:
    """Unroll the fixed-round locally-dominant Louvain as chained CTEs —
    the `graph_label_propagation` doctrine: every round's candidate gains,
    per-node argmax, per-community-key handshake winners, and the disjoint
    move application are replayed exactly."""
    parts = [
        """
    WITH raw AS (
      SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
             CAST(100000 + l_partkey % 1500 AS BIGINT) AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS MATERIALIZED (SELECT a, b FROM raw UNION ALL SELECT b, a FROM raw),
    deg AS MATERIALIZED (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS k FROM und GROUP BY a),
    m_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM raw),
    comm0 AS MATERIALIZED (SELECT v, v AS c FROM deg)"""
    ]
    for r in range(n_rounds):
        parts.append(
            f""",
    sig{r} AS MATERIALIZED (
      SELECT cm.c, CAST(SUM(d.k) AS BIGINT) AS sig
      FROM comm{r} cm JOIN deg d ON d.v = cm.v GROUP BY cm.c
    ),
    kic{r} AS MATERIALIZED (
      SELECT u.a AS i, cm.c, CAST(COUNT(*) AS BIGINT) AS k_ic
      FROM und u JOIN comm{r} cm ON cm.v = u.b
      GROUP BY u.a, cm.c
    ),
    cand{r} AS MATERIALIZED (
      SELECT k.i, ci.c AS d, k.c AS tgt,
             2 * m.m * (k.k_ic - COALESCE(ko.k_ic, 0))
               - di.k * (st.sig - sd.sig + di.k) AS gain
      FROM kic{r} k
      JOIN comm{r} ci ON ci.v = k.i
      LEFT JOIN kic{r} ko ON ko.i = k.i AND ko.c = ci.c
      JOIN deg di ON di.v = k.i
      JOIN sig{r} st ON st.c = k.c
      JOIN sig{r} sd ON sd.c = ci.c
      CROSS JOIN m_tot m
      WHERE k.c <> ci.c
    ),
    best{r} AS MATERIALIZED (
      SELECT i, d, tgt, gain FROM (
        SELECT i, d, tgt, gain,
               row_number() OVER (PARTITION BY i
                                  ORDER BY gain DESC, tgt ASC) AS rn
        FROM cand{r} WHERE gain > 0
      ) WHERE rn = 1
    ),
    win{r} AS MATERIALIZED (
      SELECT key_c, i FROM (
        SELECT key_c, i,
               row_number() OVER (PARTITION BY key_c
                                  ORDER BY gain DESC, i ASC) AS rn
        FROM (SELECT d AS key_c, i, gain FROM best{r}
              UNION ALL SELECT tgt AS key_c, i, gain FROM best{r})
      ) WHERE rn = 1
    ),
    sel{r} AS MATERIALIZED (
      SELECT b.i, b.tgt
      FROM best{r} b
      JOIN win{r} wd ON wd.key_c = b.d AND wd.i = b.i
      JOIN win{r} wt ON wt.key_c = b.tgt AND wt.i = b.i
    ),
    comm{r + 1} AS MATERIALIZED (
      SELECT cm.v, CAST(COALESCE(s.tgt, cm.c) AS BIGINT) AS c
      FROM comm{r} cm LEFT JOIN sel{r} s ON s.i = cm.v
    )"""
        )
    parts.append(
        f""",
    internal AS (
      SELECT ca.c, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM raw e
      JOIN comm{n_rounds} ca ON ca.v = e.a
      JOIN comm{n_rounds} cb ON cb.v = e.b AND cb.c = ca.c
      GROUP BY ca.c
    ),
    summary AS (
      SELECT cm.c AS community,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d.k) AS BIGINT) AS sum_deg
      FROM comm{n_rounds} cm JOIN deg d ON d.v = cm.v
      GROUP BY cm.c
    )
    SELECT s.community, s.n_nodes, s.sum_deg,
           CAST(COALESCE(i.e_c, 0) AS BIGINT) AS internal_edges,
           CAST(s.sum_deg - 2 * COALESCE(i.e_c, 0) AS BIGINT) AS external_edges,
           CAST(4 * m.m * COALESCE(i.e_c, 0) - s.sum_deg * s.sum_deg AS BIGINT)
             AS q_num_part
    FROM summary s
    LEFT JOIN internal i ON i.c = s.community
    CROSS JOIN m_tot m"""
    )
    return "".join(parts)


@register("graph_louvain_rounds", oracle=_louvain_oracle())
def graph_louvain_rounds_q(spark, sf_dir):
    """FULL deterministic Louvain (VERDICT r12 #3) — fixed 4 rounds of
    locally-dominant move matching on the supplier–part co-purchase graph
    (the community family's shared fixture), then ONE supervertex
    coarsening step; built on `graph_louvain_move` (which tables the
    ascent direction but applies nothing) and scored exactly the way
    `graph_modularity_audit` scores LPA partitions.

    Per round every node's best strictly-positive NEIGHBOR-community move
    is computed with the exact integer gain 2m·(k_ic − k_i,d∖i) −
    k_i·(Σ_c − Σ_d + k_i) (= 2m²·ΔQ; from singletons this is precisely
    the single-move row's 2m·k_ic − k_i·k_c), and the applied subset is
    the handshake matching: a move lands iff its (gain, node) key wins
    BOTH its source and its target community against every other
    candidate touching them.  Applied moves therefore touch pairwise-
    disjoint communities — their ΔQs are exactly additive (no dropped
    −k_i·k_j cross term between movers, the trap that makes textbook
    synchronous application non-monotone and which the single-move row's
    docstring measures) — so modularity strictly ascends every round
    while a positive move exists.  Final face: per-community supervertex
    summary (n_nodes, degree mass Σ_c, internal edges e_c = self-loop
    weight, external cut Σ_c − 2e_c, and q_num_part = 4m·e_c − Σ_c²,
    which sums to 4m²·Q — the gate carries the achieved modularity
    EXACTLY; pinned by test: strictly above both the singleton partition
    and the best single applied move).

    100 TB shape: per round one edge×O(V) keyed census join, O(V) window
    argmaxes, an O(V) label update (localCheckpointed); the coarsening
    is two keyed joins + one community-grain agg.  Nothing edge-squared;
    rounds are a bounded driver loop (the PageRank doctrine)."""
    from ..plans.graph_query import louvain_rounds

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("dst"),
    )
    return louvain_rounds(edges, n_rounds=_LOUVAIN_ROUNDS)
