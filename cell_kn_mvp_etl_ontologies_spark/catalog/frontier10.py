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


# --------------------------------------------------------------------------
# pack_sequences_bpe — FFD packing over REAL BPE-encoded token counts
# --------------------------------------------------------------------------
from .frontier8 import _FFD_BUDGET, _FFD_ORACLE  # noqa: E402

# the FFD recursive-CTE machinery, verbatim from the proxy row's oracle —
# everything from `items AS (` on is packing logic independent of how the
# token counts were produced, so the composed chain reuses it untouched.
_FFD_TAIL = _FFD_ORACLE.split("items AS (", 1)[1]

# the same fixed ranked merge list `text_bpe_encode` gates (two multi-round
# merges that consume earlier outputs), so the chain composes two already-
# gated contracts rather than inventing a third tokenizer.
_BPE_PACK_MERGES = [
    (0, "t", "h"),
    (1, "th", "e"),
    (2, "i", "n"),
    (3, "e", "r"),
    (4, "er", "s"),
]

_BPE_PACK_ORACLE = f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[\\s\x1f]+')) AS word
      FROM documents WHERE doc_id < 200
    ),
    wc AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, word,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE word <> '' GROUP BY 1, 2
    ),
    v AS (SELECT DISTINCT word FROM wc),
    s0 AS (
      SELECT word,
        chr(31) || array_to_string(string_split(word, ''), chr(31)||chr(31)) || chr(31) AS s
      FROM v
    ),
    s1 AS (SELECT word, replace(s, chr(31)||'t'||chr(31)||chr(31)||'h'||chr(31),
                                chr(31)||'th'||chr(31)) AS s FROM s0),
    s2 AS (SELECT word, replace(s, chr(31)||'th'||chr(31)||chr(31)||'e'||chr(31),
                                chr(31)||'the'||chr(31)) AS s FROM s1),
    s3 AS (SELECT word, replace(s, chr(31)||'i'||chr(31)||chr(31)||'n'||chr(31),
                                chr(31)||'in'||chr(31)) AS s FROM s2),
    s4 AS (SELECT word, replace(s, chr(31)||'e'||chr(31)||chr(31)||'r'||chr(31),
                                chr(31)||'er'||chr(31)) AS s FROM s3),
    s5 AS (SELECT word, replace(s, chr(31)||'er'||chr(31)||chr(31)||'s'||chr(31),
                                chr(31)||'ers'||chr(31)) AS s FROM s4),
    nt AS (
      SELECT word,
             CAST(len(string_split(trim(s, chr(31)), chr(31)||chr(31))) AS BIGINT)
               AS n_tokens
      FROM s5
    ),
    dt AS (
      SELECT w.doc_id, CAST(SUM(w.c * n.n_tokens) AS BIGINT) AS tokens
      FROM wc w JOIN nt n ON n.word = w.word GROUP BY w.doc_id
    ),
    docs AS (
      SELECT CAST(d.doc_id % 4 AS BIGINT) AS shard,
             CAST(d.doc_id AS BIGINT) AS doc_id,
             COALESCE(t.tokens, 0) AS tokens
      FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 200) d
      LEFT JOIN dt t ON t.doc_id = d.doc_id
    ),
    items AS ({_FFD_TAIL}
"""


@register("pack_sequences_bpe", oracle=_BPE_PACK_ORACLE)
def pack_sequences_bpe_q(spark, sf_dir):
    """Tokenizer-TRUE sequence packing (VERDICT r12 #4) — the composed
    chain an actual pretraining pipeline runs: per-document token counts
    come from the REAL `text_bpe_encode` tokenizer (the fixed ranked
    merge list that row gates, applied to the corpus vocabulary; document
    length = Σ over its word census of the word's encoded length) and
    feed the REAL `pack_sequences_ffd` packer (same 512 budget, same
    desc-tokens/asc-id determinism, same first-fit rule) — replacing the
    proxy rows' n_chars/16 surrogate.  The composition is non-vacuous by
    measurement (pinned by test): real BPE counts are ~10× the proxy's on
    this corpus, so the bin structure differs on every shard.

    The oracle composes the two parents' machinery verbatim: the bracket-
    delimited replace encoding of `text_bpe_encode` builds the word→
    n_tokens dictionary, and the recursive bin-fill-list CTE of
    `pack_sequences_ffd` (imported, not re-stated) replays first-fit
    exactly over the derived counts.

    100 TB shape: the corpus is touched ONCE (the (doc, word) census —
    the same factorization `text_bpe_encode` ships); the encode runs at
    vocabulary grain; per-doc lengths are one keyed join + doc-grain agg;
    packing is one shuffle on shard with per-shard open-bin state.  The
    chain adds NO corpus-scale stage the parents didn't already have."""
    from ..operators.bpe import bpe_encode_words, word_frequencies
    from ..operators.training import pack_sequences_ffd

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    wc = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(F.split(F.lower(F.col("text")), r"[\s\x1f]+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nt = bpe_encode_words(word_frequencies(docs, "text"), _BPE_PACK_MERGES).select(
        "word", F.size("tokens").cast("long").alias("n_tokens")
    )
    dt = (
        wc.join(nt, on="word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("n_tokens")).cast("long").alias("tokens"))
    )
    items = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(dt, on="doc_id", how="left")
        .select(
            (F.col("doc_id") % 4).cast("long").alias("shard"),
            "doc_id",
            F.coalesce(F.col("tokens"), F.lit(0)).alias("tokens"),
        )
    )
    return pack_sequences_ffd(items, "shard", "doc_id", "tokens", _FFD_BUDGET)
