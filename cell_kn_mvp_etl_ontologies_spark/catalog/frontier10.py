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

from ..io import commit_state_parquet, load_table
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


# --------------------------------------------------------------------------
# text_chrf_parts — character-n-gram F-score parts (chrF core)
# --------------------------------------------------------------------------
_CHRF_ORACLE = """
    WITH pairs AS (
      SELECT doc_id,
        regexp_replace(lower(substring(text, 1, 200)), '\\s+', '', 'g') AS cs,
        regexp_replace(lower(substring(text, 11, 200)), '\\s+', '', 'g') AS rs
      FROM documents WHERE doc_id < 100
    ),
    ns AS (SELECT unnest([1, 2, 3]) AS n),
    cg AS (
      SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT p.doc_id, ns.n,
               unnest(list_transform(range(1, length(p.cs) - ns.n + 2),
                      i -> substring(p.cs, CAST(i AS INT), CAST(ns.n AS INT)))) AS g
        FROM pairs p, ns
      ) GROUP BY doc_id, n, g
    ),
    rg AS (
      SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT p.doc_id, ns.n,
               unnest(list_transform(range(1, length(p.rs) - ns.n + 2),
                      i -> substring(p.rs, CAST(i AS INT), CAST(ns.n AS INT)))) AS g
        FROM pairs p, ns
      ) GROUP BY doc_id, n, g
    ),
    matched AS (
      SELECT c.n, CAST(SUM(LEAST(c.c, r.c)) AS BIGINT) AS m
      FROM cg c JOIN rg r ON r.doc_id = c.doc_id AND r.n = c.n AND r.g = c.g
      GROUP BY c.n
    ),
    tot AS (
      SELECT ns.n,
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cg WHERE cg.n = ns.n)
               AS tc,
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM rg WHERE rg.n = ns.n)
               AS tr
      FROM ns
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(COALESCE(m.m, 0) AS BIGINT) AS match_clipped,
           t.tc AS total_cand,
           t.tr AS total_ref,
           CAST(1000000 * COALESCE(m.m, 0) // NULLIF(t.tc, 0) AS BIGINT) AS p_ppm,
           CAST(1000000 * COALESCE(m.m, 0) // NULLIF(t.tr, 0) AS BIGINT) AS r_ppm,
           CAST(5000000 * COALESCE(m.m, 0) // NULLIF(4 * t.tr + t.tc, 0) AS BIGINT)
             AS chrf2_ppm
    FROM tot t LEFT JOIN matched m ON m.n = t.n
    """


def _chrf_gram_census(df, col, side_tag):
    """(doc_id, n, g, c) char-n-gram census for n = 1..3 over the
    whitespace-stripped side string."""
    out = None
    for n in (1, 2, 3):
        part = df.select(
            "doc_id",
            F.lit(n).alias("n"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length({col}) - {n} + 1, 0)),"
                    f" i -> substring({col}, i, {n}))"
                )
            ).alias("g"),
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def _chrf_pairs(docs):
    strip = lambda c: F.regexp_replace(F.lower(c), r"\s+", "")
    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        strip(F.expr("substring(text, 1, 200)")).alias("cs"),
        strip(F.expr("substring(text, 11, 200)")).alias("rs"),
    )


def _chrf_parts_from_counts(parts_df):
    """(n, match_clipped, total_cand, total_ref) -> the gated face."""
    return parts_df.select(
        F.col("n").cast("long").alias("n"),
        "match_clipped",
        "total_cand",
        "total_ref",
        F.expr(
            "CAST(1000000 * match_clipped DIV NULLIF(total_cand, 0) AS BIGINT)"
        ).alias("p_ppm"),
        F.expr(
            "CAST(1000000 * match_clipped DIV NULLIF(total_ref, 0) AS BIGINT)"
        ).alias("r_ppm"),
        F.expr(
            "CAST(5000000 * match_clipped"
            " DIV NULLIF(4 * total_ref + total_cand, 0) AS BIGINT)"
        ).alias("chrf2_ppm"),
    )


def _chrf_batch_counts(docs):
    """Corpus-level (n, match_clipped, total_cand, total_ref) — the
    pure-SUM sufficient statistic the IVM twin folds."""
    pairs = _chrf_pairs(docs)
    cg = _chrf_gram_census(pairs, "cs", "c")
    rg = _chrf_gram_census(pairs, "rs", "r")
    matched = (
        cg.join(
            rg.select("doc_id", "n", "g", F.col("c").alias("rc")),
            on=["doc_id", "n", "g"],
        )
        .groupBy("n")
        .agg(F.sum(F.least("c", "rc")).cast("long").alias("match_clipped"))
    )
    spark = docs.sparkSession
    ns = spark.range(1, 4).select(F.col("id").cast("int").alias("n"))
    tc = cg.groupBy("n").agg(F.sum("c").cast("long").alias("total_cand"))
    tr = rg.groupBy("n").agg(F.sum("c").cast("long").alias("total_ref"))
    return (
        ns.join(matched, on="n", how="left")
        .join(tc, on="n", how="left")
        .join(tr, on="n", how="left")
        .select(
            "n",
            F.coalesce("match_clipped", F.lit(0)).cast("long").alias("match_clipped"),
            F.coalesce("total_cand", F.lit(0)).cast("long").alias("total_cand"),
            F.coalesce("total_ref", F.lit(0)).cast("long").alias("total_ref"),
        )
    )


@register("text_chrf_parts", oracle=_CHRF_ORACLE)
def text_chrf_parts_q(spark, sf_dir):
    """chrF CORE as exact integer parts — corpus-level character-n-gram
    clipped precision AND recall (n = 1..3) between candidate/reference
    pairs, the character-level complement to `eval_bleu_ngram_precision`
    (word n-grams, precision-only): chrF (Popović 2015) is the standard
    generation metric robust to tokenization and morphology, and its
    sufficient statistic is three integers per n — clipped matches
    Σ min(c_cand, c_ref), candidate gram total, reference gram total.
    Both sides strip ALL whitespace (the chrF convention) before gram
    extraction; pairs are the BLEU row's shifted views of the same
    document (cand chars 1-200, ref 11-200, doc_id < 100).  The gated
    face carries exact floored ppm P, R, and chrF2 — the β = 2 harmonic
    mean is RATIONAL in the totals (5·m / (4·t_ref + t_cand), derived by
    clearing denominators), so unlike BLEU's geometric mean it gates
    exactly with no transcendental step.  Zero-total degenerate inputs
    yield NULL via NULLIF in both engines (the ADVICE r12 convention).

    100 TB shape: gram censuses are projections + one (doc, n, gram)
    hash agg each; the match join is census-shaped on (doc, n, gram);
    three 3-row aggs finish — nothing pair-quadratic, nothing
    corpus-wide except the censuses."""
    return _chrf_parts_from_counts(_chrf_batch_counts(_t(spark, sf_dir, "documents")))


@register("stream_chrf_maintain", oracle=_CHRF_ORACLE)
def stream_chrf_maintain_q(spark, sf_dir):
    """`text_chrf_parts` as incremental view maintenance — the generation-
    quality monitor running ON the eval stream: because each pair's
    candidate AND reference derive from the same arriving row, the
    corpus-level sufficient statistic (per n: Σ clipped matches, Σ cand
    grams, Σ ref grams) is a pure per-row SUM — the state is THREE rows,
    constant-size, exactly batch-equal under any bundling (the
    `stream_snips_maintain` constant-state class); the ppm faces are
    read-time.  Shares the batch row's oracle verbatim.

    100 TB shape: per trigger one per-batch parts computation (census
    grain within the batch) folded into 3-row state by SUM; the face is
    three divisions."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_documents_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_chrf_")
    state_path = root + "/counters"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = _chrf_batch_counts(batch_df)
        state = read_state_parquet(sp, state_path)
        merged = (
            state.unionByName(part)
            .groupBy("n")
            .agg(
                F.sum("match_clipped").cast("long").alias("match_clipped"),
                F.sum("total_cand").cast("long").alias("total_cand"),
                F.sum("total_ref").cast("long").alias("total_ref"),
            )
            if state is not None
            else part
        )
        commit_state_parquet(merged, state_path)

    query = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    return finish_and_clean(
        _chrf_parts_from_counts(spark.read.parquet(state_path)), root
    )


# --------------------------------------------------------------------------
# eval_rouge_l — LCS-based ROUGE-L precision/recall/F, exactly
# --------------------------------------------------------------------------
@register(
    "eval_rouge_l",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(substring(text, 1, 200)), '\\s+'),
                    x -> x <> '') AS ct,
        list_filter(string_split_regex(lower(substring(text, 11, 200)), '\\s+'),
                    x -> x <> '') AS rt
      FROM documents WHERE doc_id < 100
    ),
    dp AS (
      -- one DP CELL per recursion step: cur holds dp[i][0..len(cur)-1],
      -- prev holds the completed dp[i-1][0..m]; the next cell is
      -- j = len(cur).  Degenerate (empty-side) pairs never enter (they
      -- would never advance i) and re-join as lcs = 0 at the end.
      SELECT doc_id, ct, rt, 1 AS i,
             list_transform(range(0, len(rt) + 1), x -> CAST(0 AS BIGINT)) AS prev,
             CAST([0] AS BIGINT[]) AS cur
      FROM pairs WHERE len(ct) > 0 AND len(rt) > 0
      UNION ALL
      SELECT doc_id, ct, rt,
             CASE WHEN len(cur) = len(rt) THEN i + 1 ELSE i END,
             CASE WHEN len(cur) = len(rt) THEN list_append(cur, val) ELSE prev END,
             CASE WHEN len(cur) = len(rt) THEN CAST([0] AS BIGINT[])
                  ELSE list_append(cur, val) END
      FROM (
        SELECT doc_id, ct, rt, i, prev, cur,
               CASE WHEN ct[i] = rt[len(cur)]
                    THEN prev[len(cur)] + 1
                    ELSE greatest(prev[len(cur) + 1], cur[len(cur)]) END AS val
        FROM dp WHERE i <= len(ct)
      )
    ),
    final AS (
      SELECT doc_id, prev[len(rt) + 1] AS lcs
      FROM dp WHERE i = len(ct) + 1
    )
    SELECT p.doc_id,
           CAST(len(p.ct) AS BIGINT) AS len_cand,
           CAST(len(p.rt) AS BIGINT) AS len_ref,
           CAST(COALESCE(f.lcs, 0) AS BIGINT) AS lcs_len,
           CAST(1000000 * COALESCE(f.lcs, 0) // NULLIF(len(p.ct), 0) AS BIGINT)
             AS rouge_p_ppm,
           CAST(1000000 * COALESCE(f.lcs, 0) // NULLIF(len(p.rt), 0) AS BIGINT)
             AS rouge_r_ppm,
           CAST(2000000 * COALESCE(f.lcs, 0)
                // NULLIF(len(p.ct) + len(p.rt), 0) AS BIGINT) AS rouge_f_ppm
    FROM pairs p LEFT JOIN final f ON f.doc_id = p.doc_id
    """,
)
def eval_rouge_l_q(spark, sf_dir):
    """ROUGE-L (Lin 2004) — the LCS-based generation metric beside the
    n-gram rows (`eval_bleu_ngram_precision` word grams,
    `text_chrf_parts` char grams): per candidate/reference pair the
    token-level LONGEST COMMON SUBSEQUENCE length, with exact floored
    ppm precision (LCS/|cand|), recall (LCS/|ref|), and F1 — which for
    ROUGE-L is RATIONAL (2·LCS/(|cand|+|ref|), denominators cleared), so
    the full scorecard gates exactly.  Pairs are the BLEU fixture's
    shifted views (cand chars 1-200, ref 11-200, doc_id < 100) — high
    but not total overlap, so the LCS is non-trivial in both directions.

    LCS is the one genuinely non-relational step (an O(n·m) DP with a
    sequential dependency), so it runs as an Arrow-batched pandas UDF —
    per ROW, two bounded token lists in, one integer out; everything
    around it is projections.  The oracle replays the SAME DP cell-by-
    cell in a recursive CTE carrying the previous/current DP rows as
    lists (the FFD bin-list doctrine applied to dynamic programming), so
    the gate cross-checks two independent implementations of the
    recurrence, not one implementation twice.

    100 TB shape: per-row compute bounded by (tokens per doc)² with zero
    shuffle — the UDF is a map; the final face is a projection.  Corpus
    scale costs nothing but the scan."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    # no type annotations: `from __future__ import annotations` stringifies
    # them and pandas_udf cannot resolve the local 'pd' at decoration time
    @pandas_udf(LongType())
    def lcs_len(cand, ref):
        out = []
        for a, b in zip(cand, ref):
            a = list(a)
            b = list(b)
            if not a or not b:
                out.append(0)
                continue
            prev = [0] * (len(b) + 1)
            for x in a:
                cur = [0]
                for j, y in enumerate(b, 1):
                    cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
                prev = cur
            out.append(prev[-1])
        return pd.Series(out, dtype="int64")

    toks = lambda expr: F.filter(
        F.split(F.lower(F.expr(expr)), r"\s+"), lambda x: x != ""
    )
    pairs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            toks("substring(text, 1, 200)").alias("ct"),
            toks("substring(text, 11, 200)").alias("rt"),
        )
    )
    return pairs.select(
        "doc_id",
        F.size("ct").cast("long").alias("len_cand"),
        F.size("rt").cast("long").alias("len_ref"),
        lcs_len("ct", "rt").alias("lcs_len"),
    ).select(
        "doc_id",
        "len_cand",
        "len_ref",
        "lcs_len",
        F.expr(
            "CAST(1000000 * lcs_len DIV NULLIF(len_cand, 0) AS BIGINT)"
        ).alias("rouge_p_ppm"),
        F.expr(
            "CAST(1000000 * lcs_len DIV NULLIF(len_ref, 0) AS BIGINT)"
        ).alias("rouge_r_ppm"),
        F.expr(
            "CAST(2000000 * lcs_len DIV NULLIF(len_cand + len_ref, 0) AS BIGINT)"
        ).alias("rouge_f_ppm"),
    )


# --------------------------------------------------------------------------
# eval_isotonic_calibration — pool-adjacent-violators calibration fit
# --------------------------------------------------------------------------
@register(
    "eval_isotonic_calibration",
    oracle="""
    WITH RECURSIVE scored AS (
      SELECT doc_id,
        CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) AS score_ppm,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    ties AS (
      SELECT score_ppm, CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(y) AS BIGINT) AS pos0
      FROM scored GROUP BY score_ppm
    ),
    items AS (
      SELECT row_number() OVER (ORDER BY score_ppm) AS rn, score_ppm, n0, pos0
      FROM ties
    ),
    n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM items),
    pav AS (
      -- one ACTION per step: merge the top two stack blocks if they
      -- violate monotonicity (cross-multiplied rate compare — no
      -- division), else push the next tied-score block
      SELECT CAST(0 AS BIGINT) AS k,
             CAST([] AS STRUCT(n BIGINT, pos BIGINT, lo BIGINT, hi BIGINT)[]) AS st
      UNION ALL
      SELECT CASE WHEN viol THEN k ELSE k + 1 END,
             CASE WHEN viol THEN
               list_append(list_slice(st, 1, len(st) - 2),
                 {'n': st[len(st) - 1].n + st[len(st)].n,
                  'pos': st[len(st) - 1].pos + st[len(st)].pos,
                  'lo': st[len(st) - 1].lo,
                  'hi': st[len(st)].hi})
             ELSE
               list_append(st, {'n': i.n0, 'pos': i.pos0,
                                'lo': i.score_ppm, 'hi': i.score_ppm})
             END
      FROM (
        SELECT k, st,
               len(st) >= 2 AND st[len(st) - 1].pos * st[len(st)].n
                                > st[len(st)].pos * st[len(st) - 1].n AS viol
        FROM pav
      ) p
      LEFT JOIN items i ON i.rn = p.k + 1
      WHERE p.viol OR i.rn IS NOT NULL
    ),
    done AS (
      SELECT st FROM pav, n_tot
      WHERE k = n_tot.n
        AND NOT (len(st) >= 2 AND st[len(st) - 1].pos * st[len(st)].n
                                  > st[len(st)].pos * st[len(st) - 1].n)
    )
    SELECT CAST(i AS BIGINT) AS pool,
           st[CAST(i AS INT)].n AS n,
           st[CAST(i AS INT)].pos AS n_pos,
           st[CAST(i AS INT)].lo AS score_lo,
           st[CAST(i AS INT)].hi AS score_hi,
           CAST(1000000 * st[CAST(i AS INT)].pos // st[CAST(i AS INT)].n AS BIGINT)
             AS rate_ppm
    FROM done, unnest(range(1, len(st) + 1)) t(i)
    """,
)
def eval_isotonic_calibration_q(spark, sf_dir):
    """Isotonic (monotone) calibration fit by pool-adjacent-violators —
    the non-parametric companion to `eval_calibration_bins` (fixed
    deciles DESCRIBE miscalibration; the PAV fit is the standard way to
    CORRECT it, and its pool structure is data-driven): the stopword-
    ratio English-ness score (exact ppm, the calibration fixture) with
    y = (lang = 'en'), tied scores pre-pooled (the standard tie
    treatment — the fit is a true function of score), then the classic
    stack algorithm: push blocks in score order, merge the top two
    whenever their positive rates violate non-decreasing order.
    Violation tests are CROSS-MULTIPLIED (pos_a·n_b > pos_b·n_a) so no
    division ever happens inside the algorithm; each final pool gates
    (n, n_pos, score range, floored ppm rate), and rates are
    non-decreasing by construction (pinned by test).

    The sequential merge stack is the one non-relational step, so it
    runs in a single bounded Arrow group (distinct scores ≈ dozens —
    the eval-slice doctrine; production calibrates per model/segment
    partition, thousands of groups in parallel); the oracle replays the
    SAME stack one ACTION per recursion step, carrying the block stack
    as a struct list (the FFD bin-list doctrine).

    100 TB shape: the corpus collapses to the (score) tie census in one
    hash agg — PAV runs on distinct scores, not rows; per-group memory
    = the pool stack (≤ distinct scores)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    scored = _t(spark, sf_dir, "documents").select(
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("score_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    ties = scored.groupBy("score_ppm").agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("y").cast("long").alias("pos0"),
    )

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("score_ppm").reset_index(drop=True)
        st: list[list[int]] = []  # [n, pos, lo, hi]
        for _, r in pdf.iterrows():
            st.append([int(r.n0), int(r.pos0), int(r.score_ppm), int(r.score_ppm)])
            while len(st) >= 2 and st[-2][1] * st[-1][0] > st[-1][1] * st[-2][0]:
                a, b = st[-2], st[-1]
                st[-2:] = [[a[0] + b[0], a[1] + b[1], a[2], b[3]]]
        return pd.DataFrame(
            [
                {
                    "pool": i + 1,
                    "n": n,
                    "n_pos": pos,
                    "score_lo": lo,
                    "score_hi": hi,
                    "rate_ppm": 1_000_000 * pos // n,
                }
                for i, (n, pos, lo, hi) in enumerate(st)
            ]
        )

    schema = StructType(
        [
            StructField("pool", LongType()),
            StructField("n", LongType()),
            StructField("n_pos", LongType()),
            StructField("score_lo", LongType()),
            StructField("score_hi", LongType()),
            StructField("rate_ppm", LongType()),
        ]
    )
    return ties.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda key, pdf: pav(pdf), schema=schema
    )


# --------------------------------------------------------------------------
# graph_louvain_two_level — iterate → coarsen → repeat, both levels gated
# --------------------------------------------------------------------------
_LOUVAIN_L2_ROUNDS = 3


def _wround(tag: str, r: int, wund: str, deg: str) -> str:
    """One WEIGHTED locally-dominant move round as CTEs (prefix ``tag``):
    the `_louvain_oracle` round template with SUM(w) censuses and
    strength sums — used with w = 1 at level 1 and supervertex weights
    at level 2."""
    return f""",
    {tag}sig{r} AS MATERIALIZED (
      SELECT cm.c, CAST(SUM(d.k) AS BIGINT) AS sig
      FROM {tag}comm{r} cm JOIN {deg} d ON d.v = cm.v GROUP BY cm.c
    ),
    {tag}kic{r} AS MATERIALIZED (
      SELECT u.a AS i, cm.c, CAST(SUM(u.w) AS BIGINT) AS k_ic
      FROM {wund} u JOIN {tag}comm{r} cm ON cm.v = u.b
      GROUP BY u.a, cm.c
    ),
    {tag}cand{r} AS MATERIALIZED (
      SELECT k.i, ci.c AS d, k.c AS tgt,
             2 * m.m * (k.k_ic - COALESCE(ko.k_ic, 0))
               - di.k * (st.sig - sd.sig + di.k) AS gain
      FROM {tag}kic{r} k
      JOIN {tag}comm{r} ci ON ci.v = k.i
      LEFT JOIN {tag}kic{r} ko ON ko.i = k.i AND ko.c = ci.c
      JOIN {deg} di ON di.v = k.i
      JOIN {tag}sig{r} st ON st.c = k.c
      JOIN {tag}sig{r} sd ON sd.c = ci.c
      CROSS JOIN m_tot m
      WHERE k.c <> ci.c
    ),
    {tag}best{r} AS MATERIALIZED (
      SELECT i, d, tgt, gain FROM (
        SELECT i, d, tgt, gain,
               row_number() OVER (PARTITION BY i
                                  ORDER BY gain DESC, tgt ASC) AS rn
        FROM {tag}cand{r} WHERE gain > 0
      ) WHERE rn = 1
    ),
    {tag}win{r} AS MATERIALIZED (
      SELECT key_c, i FROM (
        SELECT key_c, i,
               row_number() OVER (PARTITION BY key_c
                                  ORDER BY gain DESC, i ASC) AS rn
        FROM (SELECT d AS key_c, i, gain FROM {tag}best{r}
              UNION ALL SELECT tgt AS key_c, i, gain FROM {tag}best{r})
      ) WHERE rn = 1
    ),
    {tag}sel{r} AS MATERIALIZED (
      SELECT b.i, b.tgt
      FROM {tag}best{r} b
      JOIN {tag}win{r} wd ON wd.key_c = b.d AND wd.i = b.i
      JOIN {tag}win{r} wt ON wt.key_c = b.tgt AND wt.i = b.i
    ),
    {tag}comm{r + 1} AS MATERIALIZED (
      SELECT cm.v, CAST(COALESCE(s.tgt, cm.c) AS BIGINT) AS c
      FROM {tag}comm{r} cm LEFT JOIN {tag}sel{r} s ON s.i = cm.v
    )"""


def _louvain2_oracle(r1: int = _LOUVAIN_ROUNDS, r2: int = _LOUVAIN_L2_ROUNDS) -> str:
    parts = [
        """
    WITH raw AS (
      SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
             CAST(100000 + l_partkey % 1500 AS BIGINT) AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    wund1 AS MATERIALIZED (
      SELECT a, b, CAST(1 AS BIGINT) AS w FROM raw
      UNION ALL SELECT b, a, 1 FROM raw
    ),
    deg1 AS MATERIALIZED (
      SELECT a AS v, CAST(SUM(w) AS BIGINT) AS k FROM wund1 GROUP BY a
    ),
    m_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM raw),
    l1comm0 AS MATERIALIZED (SELECT v, v AS c FROM deg1)"""
    ]
    for r in range(r1):
        parts.append(_wround("l1", r, "wund1", "deg1"))
    parts.append(
        f""",
    l1map AS MATERIALIZED (SELECT v, c FROM l1comm{r1}),
    mapped AS MATERIALIZED (
      SELECT ca.c AS ca, cb.c AS cb
      FROM raw e
      JOIN l1map ca ON ca.v = e.a
      JOIN l1map cb ON cb.v = e.b
    ),
    wund2 AS MATERIALIZED (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w FROM (
        SELECT ca AS a, cb AS b FROM mapped WHERE ca <> cb
        UNION ALL SELECT cb, ca FROM mapped WHERE ca <> cb
      ) GROUP BY a, b
    ),
    selfw AS MATERIALIZED (
      SELECT ca AS v, CAST(COUNT(*) AS BIGINT) AS sw
      FROM mapped WHERE ca = cb GROUP BY ca
    ),
    verts2 AS MATERIALIZED (SELECT DISTINCT c AS v FROM l1map),
    deg2 AS MATERIALIZED (
      SELECT t.v,
             CAST(COALESCE(kw.kw, 0) + 2 * COALESCE(s.sw, 0) AS BIGINT) AS k
      FROM verts2 t
      LEFT JOIN (SELECT a AS v, CAST(SUM(w) AS BIGINT) AS kw
                 FROM wund2 GROUP BY a) kw ON kw.v = t.v
      LEFT JOIN selfw s ON s.v = t.v
    ),
    l2comm0 AS MATERIALIZED (SELECT v, v AS c FROM verts2)"""
    )
    for r in range(r2):
        parts.append(_wround("l2", r, "wund2", "deg2"))
    parts.append(
        f""",
    composed AS MATERIALIZED (
      SELECT l1.v, l2.c
      FROM l1map l1 JOIN l2comm{r2} l2 ON l2.v = l1.c
    ),
    internal AS (
      SELECT ca.c, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM raw e
      JOIN composed ca ON ca.v = e.a
      JOIN composed cb ON cb.v = e.b AND cb.c = ca.c
      GROUP BY ca.c
    ),
    summary AS (
      SELECT cm.c AS community,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d.k) AS BIGINT) AS sum_deg
      FROM composed cm JOIN deg1 d ON d.v = cm.v
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


@register("graph_louvain_two_level", oracle=_louvain2_oracle())
def graph_louvain_two_level_q(spark, sf_dir):
    """TWO-LEVEL Louvain — the full iterate → coarsen → REPEAT structure
    of Blondel et al. 2008, closing the loop `graph_louvain_rounds`
    opened (that row runs one level + the coarsening; this one runs the
    coarsened supergraph through ``3`` further WEIGHTED move rounds
    (``_LOUVAIN_L2_ROUNDS``):
    supervertices carry inter-community edge weights and self-loop
    weights, strengths are k_i = Σ_j w(i,j) + 2·w(i,i), and the weighted
    exact-integer gain 2m·(w_ic − w_i,d∖i) − k_i·(Σ_c − Σ_d + k_i)
    drives the same locally-dominant handshake matching — merging two
    supervertices changes Q on the ORIGINAL graph by exactly this gain
    (the Louvain coarsening identity), so modularity keeps strictly
    ascending and the final partition is ≥ level-1's (pinned by test,
    with non-vacuity: level 2 must actually merge supervertices).
    The face is the same per-community summary, computed over the
    original unit-weight graph under the composed v → l1 → l2 mapping.

    100 TB shape: level 1 is `graph_louvain_rounds`'s shape; the
    coarsening is two keyed joins + community-grain aggs; level 2 runs
    on the supergraph — orders of magnitude smaller, which is exactly
    why Louvain coarsens — so its rounds cost ~nothing at any corpus
    size.  Oracle: both levels unrolled through one weighted round
    template (w = 1 at level 1), MATERIALIZED against CTE-inlining
    blowup."""
    from ..plans.graph_query import louvain_two_level

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("dst"),
    )
    return louvain_two_level(
        edges, n_rounds1=_LOUVAIN_ROUNDS, n_rounds2=_LOUVAIN_L2_ROUNDS
    )


# --------------------------------------------------------------------------
# stream_isotonic_maintain — the PAV calibration fit as IVM
# --------------------------------------------------------------------------
# reuse the batch row's oracle verbatim: the maintained state IS the
# (score, n, pos) tie census the batch fit pools, so stream == batch.
from . import ORACLES as _ORACLES  # noqa: E402


@register("stream_isotonic_maintain", oracle=_ORACLES["eval_isotonic_calibration"])
def stream_isotonic_maintain_q(spark, sf_dir):
    """`eval_isotonic_calibration` as incremental view maintenance — the
    calibration monitor running ON the scoring stream: the maintained
    state is the (score_ppm, n, pos) TIE CENSUS — a pure-SUM lattice
    (bundling- and order-independent; a late row folds into its score
    cell), while the PAV pooling itself is a READ-TIME face — pool
    boundaries can move as mass arrives, so the FIT is not batch-
    additive while its sufficient statistic is (the census-not-face
    doctrine of `stream_weighted_median_maintain` applied to monotone
    regression).  Shares the batch row's oracle verbatim: stream ==
    batch == DuckDB, hash-exact.

    100 TB shape: per trigger one projection + one keyed census merge
    (state = distinct scores, the value GRID — ppm-quantized, so
    bounded); the face runs PAV on the grid, never the row stream."""
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from ..io import read_state_parquet
    from ..streaming import read_documents_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_isotonic_")
    state_path = root + "/census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.select(
            F.expr(
                "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
                " t -> t IN ('the','a','of','and','to','in','is')))"
                " DIV size(split(text, '\\\\s+')) AS BIGINT)"
            ).alias("score_ppm"),
            (F.col("lang") == "en").cast("long").alias("y"),
        ).groupBy("score_ppm").agg(
            F.count(F.lit(1)).cast("long").alias("n0"),
            F.sum("y").cast("long").alias("pos0"),
        )
        state = read_state_parquet(sp, state_path)
        merged = (
            state.unionByName(part)
            .groupBy("score_ppm")
            .agg(
                F.sum("n0").cast("long").alias("n0"),
                F.sum("pos0").cast("long").alias("pos0"),
            )
            if state is not None
            else part
        )
        commit_state_parquet(merged, state_path)

    query = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    ties = spark.read.parquet(state_path)

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("score_ppm").reset_index(drop=True)
        st: list[list[int]] = []
        for _, r in pdf.iterrows():
            st.append([int(r.n0), int(r.pos0), int(r.score_ppm), int(r.score_ppm)])
            while len(st) >= 2 and st[-2][1] * st[-1][0] > st[-1][1] * st[-2][0]:
                a, b = st[-2], st[-1]
                st[-2:] = [[a[0] + b[0], a[1] + b[1], a[2], b[3]]]
        return pd.DataFrame(
            [
                {
                    "pool": i + 1,
                    "n": n,
                    "n_pos": pos,
                    "score_lo": lo,
                    "score_hi": hi,
                    "rate_ppm": 1_000_000 * pos // n,
                }
                for i, (n, pos, lo, hi) in enumerate(st)
            ]
        )

    schema = StructType(
        [
            StructField("pool", LongType()),
            StructField("n", LongType()),
            StructField("n_pos", LongType()),
            StructField("score_lo", LongType()),
            StructField("score_hi", LongType()),
            StructField("rate_ppm", LongType()),
        ]
    )
    out = ties.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda key, pdf: pav(pdf), schema=schema
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# dedup_simhash_multiprobe — banded SimHash candidates with 1-flip probing
# --------------------------------------------------------------------------
_SIMHASH_CORPUS_SQL = """
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    toks AS (
      SELECT doc_id AS id, t.tok FROM corpus,
        LATERAL unnest(string_split_regex(text, '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    bits AS (
      SELECT id, tok, b.b,
        (CAST(floor((strpos('0123456789abcdef',
                substring(md5(tok), CAST(b.b // 4 AS INT) + 1, 1)) - 1)
              / power(2.0, CAST(3 - b.b % 4 AS DOUBLE))) AS BIGINT) % 2) AS bit
      FROM toks, generate_series(0, 15) AS b(b)
    ),
    votes AS (
      SELECT id, b, SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
      FROM bits GROUP BY id, b
    ),
    sh AS (
      SELECT id, CAST(SUM(CASE WHEN v > 0
                    THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS s
      FROM votes GROUP BY id
    )
"""


@register(
    "dedup_simhash_multiprobe",
    oracle=f"""
    WITH {_SIMHASH_CORPUS_SQL}
    SELECT a.id AS a, b.id AS b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON b.id > a.id
    WHERE bit_count(xor(a.s, b.s)) <= 2
    """,
)
def dedup_simhash_multiprobe_q(spark, sf_dir):
    """Multiprobe SimHash near-dup candidates — ALL pairs at Hamming
    distance ≤ 2 on the 16-bit fingerprint, found WITHOUT an all-pairs
    scan: fingerprints split into two 8-bit bands; candidates come from
    (a) the hi-band equi-join, (b) the lo-band equi-join, and (c) the
    MULTIPROBE join — each document also probes the 8 hi-band values at
    Hamming distance 1 (the multi-probe LSH idea: query neighboring
    buckets instead of adding tables).  Completeness is STRUCTURAL, not
    statistical: a ≤2-bit difference splits across the two bands as
    2+0 (lo exact), 0+2 (hi exact), or 1+1 — and the 1+1 case is exactly
    what the hi 1-flip probes catch, so banding ∪ probing finds EVERY
    ≤2 pair (the oracle verifies against a brute-force all-pairs
    popcount — it cross-checks the completeness theorem, not a replay of
    the probe machinery).  The exact integer Hamming distance refines
    candidates and ships as the gated column.  Gate corpus: 200 docs,
    739 pairs at ≤2 (16 identical) — non-vacuous at every distance.

    100 TB shape: fingerprints are one census agg (`simhash16`);
    candidates come from THREE band-keyed equi-joins (the probe join
    costs 8× the hi join's left side — constant fanout, the
    join_spatial_grid offset pattern); the refine is a projection.
    Nothing all-pairs; bucket skew is bounded by band cardinality (256),
    and the df-cap family's hot-bucket treatment applies if a band
    degenerates."""
    from ..operators.dedup import simhash16

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = simhash16(docs, "text", "doc_id").select(
        F.col("id"), F.col("simhash").alias("s")
    )
    sh = sh.select(
        "id",
        "s",
        F.shiftright("s", 8).alias("hi"),
        F.col("s").bitwiseAND(F.lit(255)).alias("lo"),
    ).localCheckpoint(eager=True)

    a = sh.select(F.col("id").alias("a"), F.col("s").alias("sa"),
                  F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"))
    b = sh.select(F.col("id").alias("b"), F.col("s").alias("sb"),
                  F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"))

    cand_hi = a.join(b, a["hi_a"] == b["hi_b"]).filter(F.col("b") > F.col("a"))
    cand_lo = a.join(b, a["lo_a"] == b["lo_b"]).filter(F.col("b") > F.col("a"))
    probes = a.select(
        "a", "sa",
        F.explode(
            F.expr("transform(sequence(0, 7), f -> hi_a ^ shiftleft(1, f))")
        ).alias("hi_probe"),
    )
    cand_probe = probes.join(b, probes["hi_probe"] == b["hi_b"]).filter(
        F.col("b") > F.col("a")
    )
    cand = (
        cand_hi.select("a", "b", "sa", "sb")
        .unionByName(cand_lo.select("a", "b", "sa", "sb"))
        .unionByName(cand_probe.select("a", "b", "sa", "sb"))
        .distinct()
    )
    return (
        cand.select(
            "a",
            "b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 2)
    )


# --------------------------------------------------------------------------
# quality_referential_integrity — FK orphan audit across the star schema
# --------------------------------------------------------------------------
# md5-planted ingest corruption (the repo's planting doctrine): 2% of events
# (md5(event_id) bucket) get their user key shifted out of the parent range,
# so the audited FK has real orphans while the clean FKs prove the zero case.
_REFINT_CORRUPT_SQL = """
      SELECT CASE WHEN ('0x' || substring(md5('refint|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 50 = 0
                  THEN user_id + 1000000 ELSE user_id END AS fk, event_id
      FROM events
"""

_REFINT_ORACLE = f"""
    WITH staged AS (
{_REFINT_CORRUPT_SQL}
    ),
    fk1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
             CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphan_rows,
             CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL THEN s.fk END) AS BIGINT) AS n_orphan_keys
      FROM staged s LEFT JOIN customer c ON c.c_custkey = s.fk
    ),
    fk2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
             CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_orphan_rows,
             CAST(COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL THEN o.o_custkey END) AS BIGINT) AS n_orphan_keys
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    fk3 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_child,
             CAST(COUNT(*) FILTER (WHERE su.s_suppkey IS NULL) AS BIGINT) AS n_orphan_rows,
             CAST(COUNT(DISTINCT CASE WHEN su.s_suppkey IS NULL THEN l.l_suppkey END) AS BIGINT) AS n_orphan_keys
      FROM lineitem l LEFT JOIN supplier su ON su.s_suppkey = l.l_suppkey
    )
    SELECT 'events.user_id->customer' AS fk_name, n_child, n_orphan_rows, n_orphan_keys,
           CAST(1000000 * n_orphan_rows // n_child AS BIGINT) AS orphan_ppm FROM fk1
    UNION ALL
    SELECT 'orders.o_custkey->customer', n_child, n_orphan_rows, n_orphan_keys,
           CAST(1000000 * n_orphan_rows // n_child AS BIGINT) FROM fk2
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier', n_child, n_orphan_rows, n_orphan_keys,
           CAST(1000000 * n_orphan_rows // n_child AS BIGINT) FROM fk3
    """


def _refint_staged_events(events):
    corrupt = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("refint|"), F.col("event_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 50
        == 0
    )
    return events.select(
        F.when(corrupt, F.col("user_id") + 1000000)
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("fk"),
        "event_id",
    )


def _refint_face(spark, sf_dir, fk1_census):
    """The 3-row audit face given FK #1's (fk, cnt) census — shared by the
    batch row and the IVM twin (static FKs recompute at read time, the
    stream_star_rollup pattern)."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    fk1 = (
        fk1_census.join(
            F.broadcast(customer), fk1_census["fk"] == F.col("c_custkey"), "left"
        )
        .agg(
            F.sum("cnt").cast("long").alias("n_child"),
            F.sum(F.when(F.col("c_custkey").isNull(), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_orphan_rows"),
            F.countDistinct(F.when(F.col("c_custkey").isNull(), F.col("fk")))
            .cast("long")
            .alias("n_orphan_keys"),
        )
        .select(F.lit("events.user_id->customer").alias("fk_name"), "*")
    )
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("fk"))
    fk2 = (
        orders.join(F.broadcast(customer), orders["fk"] == F.col("c_custkey"), "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphan_rows"),
            F.countDistinct(F.when(F.col("c_custkey").isNull(), F.col("fk")))
            .cast("long")
            .alias("n_orphan_keys"),
        )
        .select(F.lit("orders.o_custkey->customer").alias("fk_name"), "*")
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("fk"))
    fk3 = (
        li.join(F.broadcast(supplier), li["fk"] == F.col("s_suppkey"), "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.sum(F.when(F.col("s_suppkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphan_rows"),
            F.countDistinct(F.when(F.col("s_suppkey").isNull(), F.col("fk")))
            .cast("long")
            .alias("n_orphan_keys"),
        )
        .select(F.lit("lineitem.l_suppkey->supplier").alias("fk_name"), "*")
    )
    out = fk1.unionByName(fk2).unionByName(fk3)
    return out.select(
        "fk_name",
        "n_child",
        "n_orphan_rows",
        "n_orphan_keys",
        F.expr("CAST(1000000 * n_orphan_rows DIV n_child AS BIGINT)").alias(
            "orphan_ppm"
        ),
    )


@register("quality_referential_integrity", oracle=_REFINT_ORACLE)
def quality_referential_integrity_q(spark, sf_dir):
    """Referential-integrity (foreign-key orphan) audit across the star
    schema — the ingest gate every warehouse load runs before exposing a
    batch: per FK edge, child rows, orphan rows (no matching parent key),
    DISTINCT orphan keys (how many bad values, vs how much bad mass), and
    exact floored orphan ppm.  Three edges: a staged events→customer FK
    with md5-planted 2% key corruption (keys shifted out of the parent
    range — the audit must COUNT them: non-vacuity by construction), and
    two clean production FKs (orders→customer, lineitem→supplier) proving
    the zero case.  Orphan detection is the LEFT JOIN + null-parent count
    (one pass carries rows, keys, and mass together — an anti-join would
    need a second pass for the totals).

    100 TB shape: parents broadcast (dimension tables); the child side is
    one projection + one left join + a 1-row agg per FK — no shuffle of
    child data beyond the (already tiny) aggregate; for same-magnitude
    parent/child the join falls back to the keyed shuffle and everything
    else is unchanged."""
    staged = _refint_staged_events(_t(spark, sf_dir, "events"))
    census = staged.groupBy("fk").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return _refint_face(spark, sf_dir, census)


@register("stream_referential_maintain", oracle=_REFINT_ORACLE)
def stream_referential_maintain_q(spark, sf_dir):
    """`quality_referential_integrity` as incremental view maintenance —
    the orphan monitor running ON the ingest stream: the maintained state
    is the streamed child's (fk, count) KEY CENSUS (a pure-SUM lattice —
    bundling/order-independent, late rows fold into their key cell); the
    orphan classification is a READ-TIME face (a key's orphan-hood can
    flip if the parent dimension is reloaded, so it must NOT be frozen
    into state — the census-not-face doctrine), and the two static FKs
    recompute from their tables at read time (the stream_star_rollup
    static-dim pattern).  Shares the batch oracle verbatim.

    100 TB shape: per trigger one projection + one keyed census merge
    (state = distinct child keys); the face is three broadcast left
    joins + 1-row aggs."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_refint_")
    state_path = root + "/census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = (
            _refint_staged_events(batch_df)
            .groupBy("fk")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        state = read_state_parquet(sp, state_path)
        merged = (
            state.unionByName(part)
            .groupBy("fk")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            if state is not None
            else part
        )
        commit_state_parquet(merged, state_path)

    query = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    census = spark.read.parquet(state_path)
    return finish_and_clean(_refint_face(spark, sf_dir, census), root)


# --------------------------------------------------------------------------
# window_sessionize_gap_sweep — the inactivity-gap knob, measured
# --------------------------------------------------------------------------
_SESSION_GAPS_S = [300, 1800, 7200]


def _gap_sweep_branch_sql(gap: int) -> str:
    return f"""
      SELECT {gap} AS gap_s, user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id,
             dur
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER w) > {gap}
                    THEN 1 ELSE 0 END AS is_new,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS dur
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )"""


@register(
    "window_sessionize_gap_sweep",
    oracle=f"""
    WITH numbered AS (
      {" UNION ALL ".join(_gap_sweep_branch_sql(g) for g in _SESSION_GAPS_S)}
    ),
    sess AS (
      SELECT gap_s, user_id, session_id,
             CAST(COUNT(*) AS BIGINT) AS n_ev,
             MAX(dur) - MIN(dur) AS dur_s
      FROM numbered GROUP BY gap_s, user_id, session_id
    )
    SELECT CAST(gap_s AS BIGINT) AS gap_s,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
           CAST(MAX(n_ev) AS BIGINT) AS max_events,
           CAST(SUM(dur_s) // COUNT(*) AS BIGINT) AS mean_dur_floor_s,
           CAST(1000000 * SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS singleton_ppm
    FROM sess GROUP BY gap_s
    """,
)
def window_sessionize_gap_sweep_q(spark, sf_dir):
    """The sessionization inactivity-gap threshold, MEASURED instead of
    assumed (the `agg_attribution_lookback_sweep` knob doctrine applied
    to `window_sessionize`'s 30-minute default): the same gaps-and-
    islands pass at 5 min / 30 min / 2 h, each gap's session census —
    session count, singleton (bounce-like) count and ppm, largest
    session, floored mean duration — side by side, which is exactly the
    evidence a team needs to PICK the gap (the bounce-rate elbow and the
    session-count curve are the standard diagnostics).  Same total order
    (ts, event_id) as the parent row, so tie handling is identical; all
    outputs integer-exact (durations in floored epoch seconds).

    100 TB shape: the event stream is scanned once per gap branch (the
    union is |gaps|×, a CONSTANT fanout — and each branch is the parent
    row's exact two-window shape on the same (user) keyed exchange);
    session-grain then 3-row gap-grain aggs collapse map-side."""
    from ..operators import window_sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    out = None
    for gap in _SESSION_GAPS_S:
        sess = window_sessionize(
            ev, ["user_id"], "ts", gap, tiebreak_cols=["event_id"]
        ).select(
            F.lit(gap).cast("long").alias("gap_s"),
            "user_id",
            "session_id",
            # timestampdiff from the NTZ epoch, not unix_timestamp: the
            # latter interprets NTZ in the SESSION timezone, so a session
            # spanning a DST transition would shift its duration (the
            # repo-standard truncated-epoch pin)
            F.expr(
                "CAST(timestampdiff(SECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT)"
            ).alias("dur"),
        )
        out = sess if out is None else out.unionByName(sess)
    per_sess = out.groupBy("gap_s", "user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        (F.max("dur") - F.min("dur")).cast("long").alias("dur_s"),
    )
    return per_sess.groupBy("gap_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
        F.max("n_ev").cast("long").alias("max_events"),
        F.expr("CAST(SUM(dur_s) DIV COUNT(1) AS BIGINT)").alias("mean_dur_floor_s"),
        F.expr(
            "CAST(1000000 * SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)"
            " DIV COUNT(1) AS BIGINT)"
        ).alias("singleton_ppm"),
    )


# --------------------------------------------------------------------------
# multimodal_scene_boundaries — fingerprint-delta scene splitting
# --------------------------------------------------------------------------
_SCENE_HAMMING_T = 11


@register(
    "multimodal_scene_boundaries",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text,
             CAST(octet_length(encode(text)) % 10 + 1 AS BIGINT) AS n_frames
      FROM documents WHERE doc_id < 500
    ),
    frames AS (
      SELECT doc_id, n_frames, CAST(j AS BIGINT) AS frame_idx,
             ('0x' || substring(md5(substring(text, CAST(j * 8 + 1 AS INT), 8)),
                                1, 4))::BIGINT AS fp
      FROM d, generate_series(0, 9) t(j)
      WHERE j < n_frames
    ),
    deltas AS (
      SELECT doc_id, n_frames, frame_idx,
             CASE WHEN lag(fp) OVER w IS NULL THEN 1
                  WHEN bit_count(xor(fp, lag(fp) OVER w)) > {_SCENE_HAMMING_T}
                  THEN 1 ELSE 0 END AS is_boundary
      FROM frames
      WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
    ),
    scenes AS (
      SELECT doc_id, n_frames, frame_idx,
             SUM(is_boundary) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                    ROWS UNBOUNDED PRECEDING) AS scene_idx
      FROM deltas
    )
    SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
           CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
           CAST(MAX(frame_idx) AS BIGINT) AS end_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames_in_scene
    FROM scenes GROUP BY doc_id, scene_idx
    """,
)
def multimodal_scene_boundaries_q(spark, sf_dir):
    """Scene splitting over sampled video frames — the shot-boundary
    detector a video-training pipeline runs before clip-level sampling
    (training on whole videos wastes tokens on intra-shot redundancy;
    scene grain is the curation unit): every frame of every payload gets
    a 16-bit content fingerprint, and a scene boundary falls where
    consecutive fingerprints differ in MORE THAN {_SCENE_HAMMING_T} of
    16 bits — the classic frame-difference threshold, on fingerprints
    instead of pixels so the comparison is engine-exact.  Gaps-and-
    islands numbering (the `window_sessionize` shape on the frame axis)
    turns boundaries into (doc, scene, start, end, n_frames) rows.
    The decode stage is the explicit stub (`decode_payloads`), so frame
    counts and stub frame bytes are deterministic and the whole chain —
    binary payload → frames → fingerprints → deltas → scenes — is
    oracle-checkable while keeping the Spark-side plumbing (binary
    column, bounded frame explode, keyed windows) production-real.

    100 TB shape: the frame explode is bounded by the decode metadata
    (never unbounded); fingerprints are a projection; the two windows
    run on the (doc) keyed exchange; output is scene-grain."""
    from ..operators.multimodal import (
        attach_binary_payload,
        decode_payloads,
        sample_frames,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    payloads = attach_binary_payload(docs)
    frames = sample_frames(
        decode_payloads(payloads), payloads, every_k=1, frame_bytes=8
    )
    fp = frames.select(
        "doc_id",
        "frame_idx",
        F.conv(F.substring(F.md5("frame_stub"), 1, 4), 16, 10)
        .cast("long")
        .alias("fp"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("frame_idx")
    deltas = fp.select(
        "doc_id",
        "frame_idx",
        F.when(F.lag("fp").over(w).isNull(), 1)
        .when(
            F.bit_count(F.col("fp").bitwiseXOR(F.lag("fp").over(w)))
            > _SCENE_HAMMING_T,
            1,
        )
        .otherwise(0)
        .alias("is_boundary"),
    )
    scenes = deltas.select(
        "doc_id",
        "frame_idx",
        F.sum("is_boundary")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("scene_idx"),
    )
    return scenes.groupBy(
        "doc_id", F.col("scene_idx").cast("long").alias("scene_idx")
    ).agg(
        F.min("frame_idx").cast("long").alias("start_frame"),
        F.max("frame_idx").cast("long").alias("end_frame"),
        F.count(F.lit(1)).cast("long").alias("n_frames_in_scene"),
    )


# --------------------------------------------------------------------------
# graph_coreness_bounded — full k-core decomposition, capped
# --------------------------------------------------------------------------
_CORENESS_CAP = 8
_CORENESS_INNER = 3


def _coreness_oracle(k_cap: int = _CORENESS_CAP, inner: int = _CORENESS_INNER) -> str:
    """Unroll the level-by-level peel as MATERIALIZED CTEs: per level k,
    `inner` rounds of (degree, keep, endpoint semi-join), then the removed
    set (vertices entering the level minus vertices leaving it) labels
    coreness k−1; level-k_cap survivors label k_cap."""
    parts = [
        """
    WITH raw AS (
      SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
             CAST(100000 + l_partkey % 1500 AS BIGINT) AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    u_1_0 AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw
    )"""
    ]
    for k in range(1, k_cap + 1):
        for r in range(inner):
            parts.append(
                f""",
    d_{k}_{r} AS MATERIALIZED (
      SELECT src AS v, COUNT(*) AS deg FROM u_{k}_{r} GROUP BY src
    ),
    kp_{k}_{r} AS MATERIALIZED (SELECT v FROM d_{k}_{r} WHERE deg >= {k}),
    u_{k}_{r + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM u_{k}_{r} e
      JOIN kp_{k}_{r} k1 ON e.src = k1.v
      JOIN kp_{k}_{r} k2 ON e.dst = k2.v
    )"""
            )
        nxt = f"u_{k + 1}_0" if k < k_cap else f"u_done"
        parts.append(
            f""",
    rm_{k} AS MATERIALIZED (
      SELECT v, CAST({k - 1} AS BIGINT) AS coreness FROM (
        SELECT DISTINCT src AS v FROM u_{k}_0
        EXCEPT
        SELECT DISTINCT src AS v FROM u_{k}_{inner}
      )
    ),
    {nxt} AS MATERIALIZED (SELECT src, dst FROM u_{k}_{inner})"""
        )
    unions = "\n    UNION ALL ".join(f"SELECT v, coreness FROM rm_{k}" for k in range(1, k_cap + 1))
    parts.append(
        f"""
    {unions}
    UNION ALL
    SELECT DISTINCT src AS v, CAST({k_cap} AS BIGINT) AS coreness FROM u_done"""
    )
    return "".join(parts)


@register("graph_coreness_bounded", oracle=_coreness_oracle())
def graph_coreness_bounded_q(spark, sf_dir):
    """FULL k-core decomposition, capped — every vertex's coreness (the
    largest k whose k-core contains it) up to the 8+ bucket
    (``_CORENESS_CAP``): the one-number-per-vertex answer that replaces
    a k-by-k sweep of `graph_kcore` membership queries, and the
    standard curation dial ("train on coreness ≥ k entities"; the cap
    keeps the bounded-loop oracle bounded — coreness beyond 8 is
    deliberately reported as 8).  Levels k = 1..8, each peeling a FIXED
    3 inner rounds (``_CORENESS_INNER``; convergence pinned by test:
    a 4th inner round changes nothing at either gate scale); vertices
    removed during level k survived the (k−1)-core but not the k-core —
    coreness k−1 exactly.  Pinned against an independent driver-side
    peel AND consistent with `graph_kcore` (its k=20 members all report
    the 8+ bucket).

    100 TB shape: per inner round one degree agg + one double semi-join
    on the live (shrinking) edge list; the live frame stats-cuts once
    per level (3 joins/round — the §stats-compounding rule); output is
    vertex-grain."""
    from ..plans.graph_query import coreness_bounded

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("dst"),
    )
    return coreness_bounded(
        edges, k_cap=_CORENESS_CAP, inner_rounds=_CORENESS_INNER
    )
