"""Round-14 extension batch.

The VERDICT r13 prescriptions first:

- `eval_bleu_parts` + `stream_bleu_maintain` (#4) — BLEU's full sufficient
  statistic (clipped n-gram matches for n = 1..4, candidate totals, and the
  corpus candidate/reference length sums the brevity penalty needs), batch
  and incrementally maintained, completing the MT-eval triad chrF (r13) /
  ROUGE-L (r13) / BLEU.
- `dedup_segment_boundary_audit` (#5) — the window-grain recall bound of
  the aligned-segment dedup tier stated as a GATED output: planted
  aligned / boundary-straddling / shorter-than-window duplicates, censused
  against both the aligned-segment pass and the stride-1 window pass.

Then the round-14 batch: METEOR parts (exact-match unigram variant),
tie-broken precision/recall hit rows, exact Spearman rank correlation,
two-sample Kolmogorov-Smirnov distance + its IVM twin, and windowed
audio-energy profiling over stub-decoded payloads.

Shared doctrines (see frontier4.py's module docstring): no RNG, no float
logs in gated outputs, truncating divisions proven non-negative or relying
on the measured DuckDB-`//`-truncates-like-Spark-`DIV` equivalence, large
ppm literals pre-folded.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# eval_bleu_parts / stream_bleu_maintain — BLEU sufficient statistic
# --------------------------------------------------------------------------
_BLEU_NMAX = 4

_BLEU_ORACLE = """
    WITH pairs AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(substring(text, 1, 200)),
                                            '\\s+'), t -> t <> '') AS ct,
             list_filter(string_split_regex(lower(substring(text, 11, 200)),
                                            '\\s+'), t -> t <> '') AS rt
      FROM documents WHERE doc_id < 100
    ),
    ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
    cg AS (
      SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT p.doc_id, ns.n,
               unnest(list_transform(range(1, len(p.ct) - ns.n + 2),
                      i -> array_to_string(p.ct[i:i+ns.n-1], ' '))) AS g
        FROM pairs p, ns
      ) GROUP BY doc_id, n, g
    ),
    rg AS (
      SELECT doc_id, n, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT p.doc_id, ns.n,
               unnest(list_transform(range(1, len(p.rt) - ns.n + 2),
                      i -> array_to_string(p.rt[i:i+ns.n-1], ' '))) AS g
        FROM pairs p, ns
      ) GROUP BY doc_id, n, g
    ),
    matched AS (
      SELECT c.n, CAST(SUM(LEAST(c.c, COALESCE(r.c, 0))) AS BIGINT) AS m
      FROM cg c LEFT JOIN rg r
        ON r.doc_id = c.doc_id AND r.n = c.n AND r.g = c.g
      GROUP BY c.n
    ),
    tot AS (
      SELECT ns.n,
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cg
              WHERE cg.n = ns.n) AS tc
      FROM ns
    ),
    lens AS (
      SELECT CAST(COALESCE(SUM(len(ct)), 0) AS BIGINT) AS clen,
             CAST(COALESCE(SUM(len(rt)), 0) AS BIGINT) AS rlen
      FROM pairs
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(COALESCE(m.m, 0) AS BIGINT) AS clipped_matches,
           t.tc AS total_cand,
           CAST(1000000 * COALESCE(m.m, 0) // NULLIF(t.tc, 0) AS BIGINT)
             AS precision_ppm,
           l.clen AS cand_len_total,
           l.rlen AS ref_len_total,
           l.clen < l.rlen AS bp_applies
    FROM tot t LEFT JOIN matched m ON m.n = t.n CROSS JOIN lens l
    """


def _bleu_pairs(docs):
    """Candidate/reference token arrays — the `eval_bleu_ngram_precision`
    fixture (cand = chars 1-200, ref = chars 11-200, doc_id < 100),
    pre-tokenized once so every consumer shares the split."""

    def tok(c):
        return F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))

    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        tok(F.lower(F.substring("text", 1, 200))).alias("ct"),
        tok(F.lower(F.expr("substring(text, 11, 200)"))).alias("rt"),
    )


def _bleu_gram_census(pairs, col):
    """(doc_id, n, g, c) word-n-gram census for n = 1..4, built from the
    token ARRAY with transform(sequence) + slice — no positional self-join
    (contrast `eval_bleu_ngram_precision`'s adjacency join, which this
    batch-of-n generalization would need n−1 of)."""
    out = None
    for n in range(1, _BLEU_NMAX + 1):
        grams = F.expr(
            f"CASE WHEN size({col}) >= {n} THEN"
            f" transform(sequence(1, size({col}) - {n} + 1),"
            f" i -> array_join(slice({col}, i, {n}), ' '))"
            f" ELSE array() END"
        )
        part = pairs.select(
            "doc_id", F.lit(n).alias("n"), F.explode(grams).alias("g")
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def _bleu_batch_counts(docs):
    """Corpus-level (n, clipped_matches, total_cand, cand_len_total,
    ref_len_total) — every column a pure SUM over arriving rows, so the
    IVM twin folds this frame additively."""
    pairs = _bleu_pairs(docs)
    cg = _bleu_gram_census(pairs, "ct")
    rg = _bleu_gram_census(pairs, "rt").select(
        "doc_id", "n", "g", F.col("c").alias("rc")
    )
    matched = (
        cg.join(rg, on=["doc_id", "n", "g"], how="left")
        .groupBy("n")
        .agg(
            F.sum(F.least("c", F.coalesce("rc", F.lit(0))))
            .cast("long")
            .alias("clipped_matches"),
            F.sum("c").cast("long").alias("total_cand"),
        )
    )
    lens = pairs.agg(
        F.coalesce(F.sum(F.size("ct")), F.lit(0)).cast("long").alias("cand_len_total"),
        F.coalesce(F.sum(F.size("rt")), F.lit(0)).cast("long").alias("ref_len_total"),
    )
    ns = docs.sparkSession.range(1, _BLEU_NMAX + 1).select(
        F.col("id").cast("int").alias("n")
    )
    return (
        ns.join(matched, on="n", how="left")
        .crossJoin(lens)
        .select(
            "n",
            F.coalesce("clipped_matches", F.lit(0)).cast("long").alias("clipped_matches"),
            F.coalesce("total_cand", F.lit(0)).cast("long").alias("total_cand"),
            "cand_len_total",
            "ref_len_total",
        )
    )


def _bleu_face(parts):
    """(n, parts...) -> the gated face: exact floored ppm precision plus
    the brevity-penalty PARTS (length sums and the c < r trigger) — BP's
    e^(1−r/c) itself stays with the consumer, the transcendental-free
    doctrine shared with `eval_bleu_ngram_precision` and the
    assortativity rule."""
    return parts.select(
        F.col("n").cast("long").alias("n"),
        "clipped_matches",
        "total_cand",
        F.expr(
            "CAST(1000000 * clipped_matches DIV NULLIF(total_cand, 0) AS BIGINT)"
        ).alias("precision_ppm"),
        "cand_len_total",
        "ref_len_total",
        (F.col("cand_len_total") < F.col("ref_len_total")).alias("bp_applies"),
    )


@register("eval_bleu_parts", oracle=_BLEU_ORACLE)
def eval_bleu_parts_q(spark, sf_dir):
    """BLEU's FULL sufficient statistic (VERDICT r13 #4), completing the
    MT-eval triad beside `text_chrf_parts` (char grams) and `eval_rouge_l`
    (LCS): per n = 1..4 the corpus-level clipped n-gram matches
    Σ min(c_cand, c_ref) and candidate gram totals — extending
    `eval_bleu_ngram_precision`'s n ≤ 2 to the standard BLEU-4 — PLUS the
    two integer length sums the brevity penalty needs (Σ|cand|, Σ|ref|)
    and the bp_applies trigger (c < r).  Every part is integer-exact; the
    one transcendental step of BLEU (geometric mean of precisions × BP =
    exp(Σ log p_n / 4 + 1 − r/c)) stays with the consumer, per the chrF
    doctrine.  N-grams come from the token ARRAY via transform+slice —
    one projection per n, no positional self-joins.

    100 TB shape: gram censuses are projections + one (doc, n, gram) hash
    agg each; the clip join is census-shaped; four 4-row aggs finish.
    Nothing pair-quadratic, and the corpus text itself never shuffles —
    only grams and counts."""
    return _bleu_face(_bleu_batch_counts(_t(spark, sf_dir, "documents")))


@register("stream_bleu_maintain", oracle=_BLEU_ORACLE)
def stream_bleu_maintain_q(spark, sf_dir):
    """`eval_bleu_parts` as incremental view maintenance — the BLEU
    monitor running ON the eval stream: candidate and reference both
    derive from the same arriving row, so the corpus sufficient statistic
    (per n: clipped matches, cand gram total, and the two length sums) is
    a pure per-row SUM — state is FOUR rows, constant-size, batch-equal
    under any bundling (the `stream_chrf_maintain` constant-state class);
    the ppm/bp faces are read-time.  Shares the batch oracle verbatim.

    100 TB shape: per trigger one per-batch parts computation folded into
    4-row state by SUM; the face is four divisions and a comparison."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_documents_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_bleu_")
    state_path = root + "/counters"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = _bleu_batch_counts(batch_df)
        state = read_state_parquet(sp, state_path)
        merged = (
            state.unionByName(part)
            .groupBy("n")
            .agg(
                F.sum("clipped_matches").cast("long").alias("clipped_matches"),
                F.sum("total_cand").cast("long").alias("total_cand"),
                F.sum("cand_len_total").cast("long").alias("cand_len_total"),
                F.sum("ref_len_total").cast("long").alias("ref_len_total"),
            )
            if state is not None
            else part
        )
        staging = state_path + "_staging"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(state_path)
        shutil.rmtree(staging, ignore_errors=True)

    query = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    return finish_and_clean(_bleu_face(spark.read.parquet(state_path)), root)


# --------------------------------------------------------------------------
# eval_meteor_parts — exact-match unigram METEOR parts
# --------------------------------------------------------------------------
@register(
    "eval_meteor_parts",
    oracle="""
    WITH pairs AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(substring(text, 1, 200)),
                                            '\\s+'), t -> t <> '') AS ct,
             list_filter(string_split_regex(lower(substring(text, 11, 200)),
                                            '\\s+'), t -> t <> '') AS rt
      FROM documents WHERE doc_id < 100
    ),
    rc AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT doc_id, unnest(rt) AS g FROM pairs
      ) GROUP BY doc_id, g
    ),
    cpos AS (
      SELECT p.doc_id, t.i, t.tok,
             row_number() OVER (PARTITION BY p.doc_id, t.tok ORDER BY t.i)
               AS occ
      FROM pairs p, LATERAL (
        SELECT UNNEST(p.ct) AS tok,
               UNNEST(generate_series(1, len(p.ct))) AS i
      ) t
    ),
    mk AS (
      SELECT c.doc_id, c.i, (c.occ <= COALESCE(r.c, 0)) AS matched
      FROM cpos c LEFT JOIN rc r ON r.doc_id = c.doc_id AND r.g = c.tok
    ),
    runs AS (
      SELECT doc_id, matched,
             CASE WHEN matched AND NOT COALESCE(
                    lag(matched) OVER (PARTITION BY doc_id ORDER BY i), FALSE)
                  THEN 1 ELSE 0 END AS run_start
      FROM mk
    ),
    per AS (
      SELECT p.doc_id,
             CAST(len(p.ct) AS BIGINT) AS n_cand,
             CAST(len(p.rt) AS BIGINT) AS n_ref,
             CAST(COALESCE(m.m, 0) AS BIGINT) AS m,
             CAST(COALESCE(m.ch, 0) AS BIGINT) AS chunks
      FROM pairs p LEFT JOIN (
        SELECT doc_id,
               SUM(CASE WHEN matched THEN 1 ELSE 0 END) AS m,
               SUM(run_start) AS ch
        FROM runs GROUP BY doc_id
      ) m ON m.doc_id = p.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, m, chunks, n_cand, n_ref,
           CAST(10000000 * m // NULLIF(n_cand + 9 * n_ref, 0) AS BIGINT)
             AS f_mean_ppm,
           CASE WHEN m = 0 THEN NULL
                ELSE CAST(1000000 * chunks * chunks * chunks
                          // (2 * m * m * m) AS BIGINT)
           END AS frag_penalty_ppm
    FROM per
    """,
)
def eval_meteor_parts_q(spark, sf_dir):
    """METEOR parts, exact-match unigram variant (Banerjee & Lavie 2005
    without stem/synonym modules — those need external resources; the
    exact-match core is where the counting lives) — the fourth corpus MT
    metric beside BLEU/chrF/ROUGE-L, and the only one of the four that
    scores word ORDER via fragmentation: per pair, m = count-clipped
    unigram matches (candidate occurrence index ≤ reference count — the
    deterministic alignment), chunks = maximal runs of CONSECUTIVE
    matched candidate positions (the candidate-run reading of METEOR's
    chunk count, documented: the reference-adjacency refinement needs the
    aligner), and the two rationals METEOR derives from them gate exactly:
    F_mean = 10PR/(R+9P) simplifies to 10m/(c+9r) (denominators cleared),
    and the fragmentation penalty 0.5·(ch/m)³ is ch³/(2m³) — ppm-floored
    with BIGINT-safe magnitudes (ch, m ≤ |cand| ≤ ~66 here; 10⁶·ch³
    ≤ ~3·10¹¹).  The final score F·(1−penalty) composes two floored parts
    and stays with the consumer.

    100 TB shape: one (doc, tok) census join + two windows at candidate
    token grain, all keyed on doc — nothing corpus-quadratic."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _bleu_pairs(docs)
    rc = (
        pairs.select("doc_id", F.explode("rt").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cpos = pairs.select(
        "doc_id", F.posexplode("ct").alias("i", "tok")
    )
    occ_w = Window.partitionBy("doc_id", "tok").orderBy("i")
    mk = (
        cpos.withColumn("occ", F.row_number().over(occ_w))
        .join(
            rc.select("doc_id", F.col("g").alias("tok"), "c"),
            on=["doc_id", "tok"],
            how="left",
        )
        .select(
            "doc_id",
            "i",
            (F.col("occ") <= F.coalesce("c", F.lit(0))).alias("matched"),
        )
    )
    run_w = Window.partitionBy("doc_id").orderBy("i")
    runs = mk.select(
        "doc_id",
        "matched",
        F.when(
            F.col("matched")
            & ~F.coalesce(F.lag("matched").over(run_w), F.lit(False)),
            1,
        )
        .otherwise(0)
        .alias("run_start"),
    )
    m_agg = runs.groupBy("doc_id").agg(
        F.sum(F.when(F.col("matched"), 1).otherwise(0)).alias("m"),
        F.sum("run_start").alias("ch"),
    )
    per = pairs.join(m_agg, on="doc_id", how="left").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce("m", F.lit(0)).cast("long").alias("m"),
        F.coalesce("ch", F.lit(0)).cast("long").alias("chunks"),
        F.size("ct").cast("long").alias("n_cand"),
        F.size("rt").cast("long").alias("n_ref"),
    )
    return per.select(
        "doc_id",
        "m",
        "chunks",
        "n_cand",
        "n_ref",
        F.expr(
            "CAST(10000000 * m DIV NULLIF(n_cand + 9 * n_ref, 0) AS BIGINT)"
        ).alias("f_mean_ppm"),
        F.expr(
            "CASE WHEN m = 0 THEN NULL"
            " ELSE CAST(1000000 * chunks * chunks * chunks"
            " DIV (2 * m * m * m) AS BIGINT) END"
        ).alias("frag_penalty_ppm"),
    )


# --------------------------------------------------------------------------
# eval_average_precision — AP at the hit grain (the PR-curve's exact rows)
# --------------------------------------------------------------------------
@register(
    "eval_precision_recall_hits",
    oracle="""
    WITH scored AS (
      SELECT source, doc_id, n_chars AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents WHERE doc_id < 1000
    ),
    npos AS (
      SELECT source, CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM scored GROUP BY source
    ),
    ranked AS (
      SELECT source, doc_id, pos,
             row_number() OVER (PARTITION BY source ORDER BY s DESC, doc_id)
               AS k,
             SUM(pos) OVER (PARTITION BY source ORDER BY s DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_hits
      FROM scored
    )
    SELECT r.source, CAST(r.doc_id AS BIGINT) AS doc_id,
           CAST(r.k AS BIGINT) AS k,
           CAST(r.cum_hits AS BIGINT) AS cum_hits,
           CAST(1000000 * r.cum_hits // r.k AS BIGINT) AS prec_at_k_ppm,
           CAST(1000000 * r.cum_hits // NULLIF(n.n_pos, 0) AS BIGINT)
             AS recall_ppm
    FROM ranked r JOIN npos n ON n.source = r.source
    WHERE r.pos = 1
    """,
)
def eval_precision_recall_hits_q(spark, sf_dir):
    """Precision/recall at the HIT grain — the tie-BROKEN document-level
    companion to `eval_pr_curve` (distinct-score threshold points, ties
    pooled) and `eval_average_precision` (the step-interpolated AP
    scalar): per group, documents rank by score DESC with ties broken to
    the smaller doc_id (the sklearn `average_precision_score` convention,
    where a tie group's positives each get their own rank), and every
    POSITIVE emits its rank k, cumulative hit count, exact floored
    precision@k = hits/k and recall = hits/n_pos in ppm — the raw
    material of the non-interpolated AP, carrying DOCUMENT IDENTITY so
    "which documents are the early hits" is answerable (the pooled curve
    rows cannot say).  Score = n_chars, label = lang = 'en', grouped by
    source (the `eval_auc_rank` fixture, so all three rankers'
    conventions reconcile on the gate).

    100 TB shape: one hash agg to group grain for n_pos + one window sort
    per group at document grain; output is positives-only.  The sort is
    per-group (score, id) — Spark's range-partitioned window, never a
    global sort."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    scored = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").cast("long").alias("pos"),
    )
    npos = scored.groupBy("source").agg(
        F.sum("pos").cast("long").alias("n_pos")
    )
    w = Window.partitionBy("source").orderBy(F.col("s").desc(), "doc_id")
    ranked = scored.select(
        "source",
        "doc_id",
        "pos",
        F.row_number().over(w).alias("k"),
        F.sum("pos").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum_hits"
        ),
    )
    return (
        ranked.filter(F.col("pos") == 1)
        .join(npos, on="source")
        .select(
            "source",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("k").cast("long").alias("k"),
            F.col("cum_hits").cast("long").alias("cum_hits"),
            F.expr("CAST(1000000 * cum_hits DIV k AS BIGINT)").alias(
                "prec_at_k_ppm"
            ),
            F.expr(
                "CAST(1000000 * cum_hits DIV NULLIF(n_pos, 0) AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


# --------------------------------------------------------------------------
# eval_spearman_rho — exact rational Spearman rank correlation
# --------------------------------------------------------------------------
_SPEARMAN_ORACLE = """
    WITH spend AS (
      SELECT o_custkey AS ck,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS sp
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT c_custkey, c_nationkey, c_acctbal,
             COALESCE(s.sp, CAST(0 AS DECIMAL(18,6))) AS spend
      FROM customer LEFT JOIN spend s ON s.ck = c_custkey
    ),
    ranked AS (
      SELECT c_nationkey,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS ra,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY spend, c_custkey) AS rb
      FROM cust
    ),
    per AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
      FROM ranked GROUP BY c_nationkey
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey, n, sum_d2,
           CAST(n * (n * n - 1) - 6 * sum_d2 AS BIGINT) AS rho_num,
           CAST(n * (n * n - 1) AS BIGINT) AS rho_den,
           CASE WHEN n < 2 THEN NULL
                ELSE CAST(1000000 * (n * (n * n - 1) - 6 * sum_d2)
                          // (n * (n * n - 1)) AS BIGINT)
           END AS rho_ppm
    FROM per
    """


def _spearman_face(spark, sf_dir, spend):
    """(ck, sp) spend frame -> the gated Spearman face: join the static
    customer dimension, double-rank with deterministic tie-breaks, and
    emit the exact rational parts.  Shared by the batch row and the IVM
    twin (whose state IS the spend frame)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .join(spend, F.col("c_custkey") == F.col("ck"), how="left")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.coalesce(
                "sp", F.lit(0).cast("decimal(18,6)")
            ).alias("spend"),
        )
    )
    ranked = cust.select(
        "c_nationkey",
        F.row_number()
        .over(
            Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
        )
        .alias("ra"),
        F.row_number()
        .over(
            Window.partitionBy("c_nationkey").orderBy("spend", "c_custkey")
        )
        .alias("rb"),
    )
    per = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("long")
        .alias("sum_d2"),
    )
    return per.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "n",
        "sum_d2",
        F.expr("CAST(n * (n * n - 1) - 6 * sum_d2 AS BIGINT)").alias("rho_num"),
        F.expr("CAST(n * (n * n - 1) AS BIGINT)").alias("rho_den"),
        F.expr(
            "CASE WHEN n < 2 THEN NULL"
            " ELSE CAST(1000000 * (n * (n * n - 1) - 6 * sum_d2)"
            " DIV (n * (n * n - 1)) AS BIGINT) END"
        ).alias("rho_ppm"),
    )


@register("eval_spearman_rho", oracle=_SPEARMAN_ORACLE)
def eval_spearman_rho_q(spark, sf_dir):
    """Exact Spearman rank correlation per group — the monotone-
    association companion to `eval_kendall_tau_full` (concordant pairs)
    and `profile_correlation_pairs` (Pearson moments): does account
    balance predict realized spend, per nation?  Ranks are tie-broken
    deterministically by customer key (documented: the midrank/tie-
    corrected variant needs the Pearson-on-ranks form; the tie-broken
    rank form keeps rho = 1 − 6Σd²/(n(n²−1)) EXACTLY rational), spend is
    summed in DECIMAL(18,6) so the rank sort key is exact cross-engine,
    and the gated face carries the integer numerator/denominator plus a
    ppm quotient — rho can be NEGATIVE, which is safe because DuckDB's
    integer `//` truncates toward zero exactly like Spark's DIV (measured,
    frontier4 module doctrine).

    100 TB shape: one keyed agg to customer grain, two per-group window
    sorts at member grain, one group agg — the `eval_auc_rank` shape;
    rank windows sort within nation partitions only."""
    spend = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("sp")
        )
    )
    return _spearman_face(spark, sf_dir, spend)


# --------------------------------------------------------------------------
# agg_ks_two_sample / stream_ks_maintain — exact two-sample KS distance
# --------------------------------------------------------------------------
_KS_ORACLE = """
    WITH vals AS (
      SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS v,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp_a
      FROM orders
    ),
    pv AS (
      SELECT v, CAST(SUM(grp_a) AS BIGINT) AS ca,
             CAST(SUM(1 - grp_a) AS BIGINT) AS cb
      FROM vals GROUP BY v
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM pv
    ),
    ecdf AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
      FROM pv
    ),
    d AS (
      SELECT e.v, ABS(t.nb * e.cuma - t.na * e.cumb) AS dn
      FROM ecdf e CROSS JOIN tot t
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           CAST((SELECT MAX(dn) FROM d) AS BIGINT) AS d_num,
           CAST((SELECT MIN(v) FROM d
                 WHERE dn = (SELECT MAX(dn) FROM d)) AS BIGINT) AS d_at_value,
           CAST(1000000 * (SELECT MAX(dn) FROM d) // (t.na * t.nb) AS BIGINT)
             AS ks_ppm
    FROM tot t
    """


def _ks_counts(orders):
    """Per-value group counts (v, ca, cb) — the KS sufficient statistic at
    distinct-value grain, additive under batching (the IVM state)."""
    vals = orders.select(
        F.floor("o_totalprice").cast("long").alias("v"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("long")
        .alias("grp_a"),
    )
    return vals.groupBy("v").agg(
        F.sum("grp_a").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("grp_a")).cast("long").alias("cb"),
    )


def _ks_face(pv):
    """(v, ca, cb) -> the one-row KS face: D's exact integer numerator
    max|n_b·cumA(v) − n_a·cumB(v)|, its denominator n_a·n_b, the first
    value attaining the max, and the floored ppm quotient."""
    tot = pv.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = pv.select(
        "v",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    d = ecdf.crossJoin(tot).select(
        "v",
        "n_a",
        "n_b",
        F.abs(F.col("n_b") * F.col("cuma") - F.col("n_a") * F.col("cumb")).alias(
            "dn"
        ),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = d.withColumn("dmax", F.max("dn").over(wall))
    return d.groupBy("n_a", "n_b").agg(
        F.max("dn").cast("long").alias("d_num"),
        F.min(F.when(F.col("dn") == F.col("dmax"), F.col("v")))
        .cast("long")
        .alias("d_at_value"),
    ).select(
        "n_a",
        "n_b",
        "d_num",
        "d_at_value",
        F.expr("CAST(1000000 * d_num DIV (n_a * n_b) AS BIGINT)").alias(
            "ks_ppm"
        ),
    )


@register("agg_ks_two_sample", oracle=_KS_ORACLE)
def agg_ks_two_sample_q(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov distance — the
    distribution-drift family's CDF-supremum member beside `agg_drift_tvd`
    (per-bucket L1) and `quality_ab_chi2_parts` (frequency chi²): KS sees
    location/shape shifts that bucketed TVD smears away, and its exact
    sufficient statistic is tiny — per distinct value the two group
    counts, then D = max_v |F_A(v) − F_B(v)| computed as the INTEGER
    max|n_b·cumA − n_a·cumB| over the merged value grid (denominators
    cleared, so the gate is exact; the ppm face divides once at the end).
    Urgent-priority orders vs the rest over floored order totals; FLOOR
    not CAST because Spark's double→long cast truncates while DuckDB's
    rounds (the frontier4 rounding doctrine).

    100 TB shape: one hash agg to distinct-value grain (map-side combine
    collapses the corpus), one window cumsum over distinct values, one
    1-row agg.  Measured caveat (SCALE.md §r14-probes): near-unique
    doubles floor to a NON-collapsing grid (129,698 distinct of 150,000
    rows at sf0.1), so at real scale the value axis must be binned
    coarser (cents → dollars → log-bins) for the distinct-grain claim to
    bite — KS on a binned variable is the KS of that binned variable,
    stated contract.  BIGINT bound: d_num ≤ n_a·n_b and the ppm step
    needs 10⁶·n_a·n_b < 2⁶³ — n_a·n_b < 9.2·10¹², fine to ~3M rows per
    side; beyond that, divide n_a·n_b's gcd out or rescale to
    per-mille."""
    return _ks_face(_ks_counts(_t(spark, sf_dir, "orders")))


@register("stream_ks_maintain", oracle=_KS_ORACLE)
def stream_ks_maintain_q(spark, sf_dir):
    """`agg_ks_two_sample` as incremental view maintenance — continuous
    distribution-shift monitoring on the order stream: the state is the
    per-value pair-count frame (v, ca, cb), folded by SUM per value (the
    `stream_tfidf_maintain` value-grain state class), and the KS face —
    ECDF cumsum + 1-row max — recomputes from state at read time (the
    supremum is NOT additive; the sufficient statistic is).  Batch-equal
    under any bundling; shares the batch oracle verbatim.

    100 TB shape: per trigger O(batch + touched values) state fold; face
    cost is distinct-value grain, not corpus grain."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_orders_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_ks_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = _ks_counts(batch_df)
        state = read_state_parquet(sp, state_path)
        merged = (
            state.unionByName(part)
            .groupBy("v")
            .agg(
                F.sum("ca").cast("long").alias("ca"),
                F.sum("cb").cast("long").alias("cb"),
            )
            if state is not None
            else part
        )
        staging = state_path + "_staging"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(state_path)
        shutil.rmtree(staging, ignore_errors=True)

    query = (
        read_orders_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    return finish_and_clean(_ks_face(spark.read.parquet(state_path)), root)


# --------------------------------------------------------------------------
# dedup_segment_boundary_audit — the window-grain recall bound, gated
# --------------------------------------------------------------------------
_SEG_W = 10

_BOUNDARY_ORACLE = f"""
    WITH tok0 AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '') AS ws
      FROM documents WHERE doc_id < 200
    ),
    plants AS (
      SELECT doc_id + 200000 AS doc_id, 'aligned' AS plant_class,
             ws[1:40] AS ws
      FROM tok0 WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 300000, 'straddle',
             list_concat(['j' || doc_id || 'a', 'j' || doc_id || 'b',
                          'j' || doc_id || 'c'], ws[1:40])
      FROM tok0 WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id + 400000, 'short',
             list_concat(list_concat(['j' || doc_id || 'a'], ws[1:6]),
                         ['j' || doc_id || 'b'])
      FROM tok0 WHERE doc_id % 10 = 2
    ),
    corpus AS (
      SELECT doc_id, 'base' AS plant_class, ws FROM tok0
      UNION ALL SELECT doc_id, plant_class, ws FROM plants
    ),
    segs AS (
      SELECT doc_id, plant_class,
             md5(array_to_string(ws[i * {_SEG_W} + 1 : i * {_SEG_W} + {_SEG_W}],
                                 ' ')) AS h
      FROM corpus, generate_series(0, 63) t(i)
      WHERE i * {_SEG_W} < len(ws)
    ),
    seg_dup AS (
      SELECT h FROM segs GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ),
    wins AS (
      SELECT doc_id, plant_class,
             md5(array_to_string(ws[i : i + {_SEG_W} - 1], ' ')) AS h
      FROM corpus CROSS JOIN UNNEST(range(1, len(ws) - {_SEG_W} + 2)) AS u(i)
      WHERE len(ws) >= {_SEG_W}
    ),
    win_dup AS (
      SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ),
    seg_stats AS (
      SELECT s.plant_class,
             CAST(COUNT(*) AS BIGINT) AS n_seg_total,
             CAST(COUNT(*) FILTER (WHERE d.h IS NOT NULL) AS BIGINT)
               AS n_seg_dup,
             CAST(COUNT(DISTINCT s.doc_id)
                  FILTER (WHERE d.h IS NOT NULL) AS BIGINT) AS n_docs_seg_hit
      FROM segs s LEFT JOIN seg_dup d ON d.h = s.h
      WHERE s.plant_class <> 'base' GROUP BY s.plant_class
    ),
    win_stats AS (
      SELECT w.plant_class,
             CAST(COUNT(*) AS BIGINT) AS n_win_total,
             CAST(COUNT(*) FILTER (WHERE d.h IS NOT NULL) AS BIGINT)
               AS n_win_dup,
             CAST(COUNT(DISTINCT w.doc_id)
                  FILTER (WHERE d.h IS NOT NULL) AS BIGINT) AS n_docs_win_hit
      FROM wins w LEFT JOIN win_dup d ON d.h = w.h
      WHERE w.plant_class <> 'base' GROUP BY w.plant_class
    ),
    classes AS (
      SELECT plant_class, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(ws)) AS BIGINT) AS n_tokens
      FROM plants GROUP BY plant_class
    )
    SELECT c.plant_class, c.n_docs, c.n_tokens,
           COALESCE(s.n_seg_total, 0) AS n_seg_total,
           COALESCE(s.n_seg_dup, 0) AS n_seg_dup,
           COALESCE(s.n_docs_seg_hit, 0) AS n_docs_seg_hit,
           COALESCE(w.n_win_total, 0) AS n_win_total,
           COALESCE(w.n_win_dup, 0) AS n_win_dup,
           COALESCE(w.n_docs_win_hit, 0) AS n_docs_win_hit,
           CAST(1000000 * COALESCE(s.n_docs_seg_hit, 0) // c.n_docs AS BIGINT)
             AS seg_doc_recall_ppm,
           CAST(1000000 * COALESCE(w.n_docs_win_hit, 0) // c.n_docs AS BIGINT)
             AS win_doc_recall_ppm
    FROM classes c
    LEFT JOIN seg_stats s ON s.plant_class = c.plant_class
    LEFT JOIN win_stats w ON w.plant_class = c.plant_class
    """


@register("dedup_segment_boundary_audit", oracle=_BOUNDARY_ORACLE)
def dedup_segment_boundary_audit_q(spark, sf_dir):
    """The window-grain recall bound of the substring-dedup tier stated
    as a GATED census (VERDICT r13 #5, the MinHash-cap audit precedent):
    `dedup_remove_segments` hashes ALIGNED 10-token segments and
    `dedup_substring_spans` stride-1 windows, so duplicated spans SHORTER
    than the window, or straddling segment boundaries at misaligned
    offsets, are invisible to the aligned pass — the exact miss class of
    the Lee et al. 2022 suffix-array semantics both approximate.  Three
    duplicate classes are PLANTED: `aligned` (a doc's first 40 tokens
    re-inserted at offset 0 — segmentation-compatible), `straddle` (the
    same 40 tokens behind 3 unique junk tokens — every aligned segment
    crosses a boundary), `short` (6 copied tokens between junk — shorter
    than the window).  Each class is censused against BOTH detectors:
    expected and measured here, aligned-segment recall is ~full for
    `aligned`, ZERO for `straddle` and `short`; stride-1 window recall is
    full for `aligned` AND `straddle` (this is the production answer: an
    offset-stride sweep is exactly the stride-1 pass), and zero for
    `short` (sub-window spans need a smaller window or suffix grain).
    Junk tokens embed the doc id so they can never collide cross-doc.

    100 TB shape: both censuses explode only 32-char md5 hashes (the
    `duplicated_span_hashes` doctrine); the dup sets are census-grain
    HAVING filters; the audit joins are hash-keyed.  The stride-1 tier
    costs W× the aligned tier's explode — the measured price of closing
    the straddle miss class."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok0 = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
        ).alias("ws"),
    )
    jt = lambda suf: F.concat(F.lit("j"), F.col("doc_id").cast("string"), F.lit(suf))
    plants = (
        tok0.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.lit("aligned").alias("plant_class"),
            F.slice("ws", 1, 40).alias("ws"),
        )
        .unionByName(
            tok0.filter(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.lit("straddle").alias("plant_class"),
                F.concat(
                    F.array(jt("a"), jt("b"), jt("c")), F.slice("ws", 1, 40)
                ).alias("ws"),
            )
        )
        .unionByName(
            tok0.filter(F.col("doc_id") % 10 == 2).select(
                (F.col("doc_id") + 400000).alias("doc_id"),
                F.lit("short").alias("plant_class"),
                F.concat(
                    F.array(jt("a")), F.slice("ws", 1, 6), F.array(jt("b"))
                ).alias("ws"),
            )
        )
    )
    corpus = tok0.select(
        "doc_id", F.lit("base").alias("plant_class"), "ws"
    ).unionByName(plants)

    seg_hashes = F.expr(
        f"transform(sequence(0, CAST((size(ws) - 1) DIV {_SEG_W} AS INT)),"
        f" i -> md5(array_join(slice(ws, i * {_SEG_W} + 1, {_SEG_W}), ' ')))"
    )
    segs = corpus.select(
        "doc_id", "plant_class", F.explode(seg_hashes).alias("h")
    )
    win_hashes = F.expr(
        f"CASE WHEN size(ws) >= {_SEG_W} THEN"
        f" transform(sequence(1, size(ws) - {_SEG_W} + 1),"
        f" i -> md5(array_join(slice(ws, i, {_SEG_W}), ' ')))"
        f" ELSE array() END"
    )
    wins = corpus.select(
        "doc_id", "plant_class", F.explode(win_hashes).alias("h")
    )

    def dup_set(df):
        return (
            df.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") > 1)
            .select("h")
        )

    def stats(df, pre):
        d = dup_set(df).withColumn("_dup", F.lit(1))
        return (
            df.filter(F.col("plant_class") != "base")
            .join(d, on="h", how="left")
            .groupBy("plant_class")
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"n_{pre}_total"),
                F.sum(F.coalesce("_dup", F.lit(0))).cast("long").alias(f"n_{pre}_dup"),
                F.countDistinct(
                    F.when(F.col("_dup") == 1, F.col("doc_id"))
                )
                .cast("long")
                .alias(f"n_docs_{pre}_hit"),
            )
        )

    classes = plants.groupBy("plant_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("ws")).cast("long").alias("n_tokens"),
    )
    out = (
        classes.join(stats(segs, "seg"), on="plant_class", how="left")
        .join(stats(wins, "win"), on="plant_class", how="left")
    )
    zero = lambda c: F.coalesce(c, F.lit(0)).cast("long")
    return out.select(
        "plant_class",
        "n_docs",
        "n_tokens",
        zero(F.col("n_seg_total")).alias("n_seg_total"),
        zero(F.col("n_seg_dup")).alias("n_seg_dup"),
        zero(F.col("n_docs_seg_hit")).alias("n_docs_seg_hit"),
        zero(F.col("n_win_total")).alias("n_win_total"),
        zero(F.col("n_win_dup")).alias("n_win_dup"),
        zero(F.col("n_docs_win_hit")).alias("n_docs_win_hit"),
        F.expr(
            "CAST(1000000 * COALESCE(n_docs_seg_hit, 0) DIV n_docs AS BIGINT)"
        ).alias("seg_doc_recall_ppm"),
        F.expr(
            "CAST(1000000 * COALESCE(n_docs_win_hit, 0) DIV n_docs AS BIGINT)"
        ).alias("win_doc_recall_ppm"),
    )


# --------------------------------------------------------------------------
# multimodal_audio_energy — windowed energy profile over stub samples
# --------------------------------------------------------------------------
_AUDIO_W = 40

_AUDIO_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS L
      FROM documents WHERE doc_id < 300
    ),
    samples AS (
      SELECT doc_id, CAST((i - 1) // {_AUDIO_W} AS BIGINT) AS win_idx,
             ascii(substring(text, CAST(i AS INT), 1)) - 96 AS a
      FROM d, LATERAL (
        SELECT UNNEST(generate_series(1, CAST(L AS INT))) AS i
      ) t
    ),
    wins AS (
      SELECT doc_id, win_idx, CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(SUM(a * a) AS BIGINT) AS energy
      FROM samples GROUP BY doc_id, win_idx
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, win_idx, n_samples, energy,
           energy = MAX(energy) OVER (PARTITION BY doc_id) AS is_peak,
           CAST(energy // n_samples AS BIGINT) AS mean_power_floor
    FROM wins
    """


@register("multimodal_audio_energy", oracle=_AUDIO_ORACLE)
def multimodal_audio_energy_q(spark, sf_dir):
    """Windowed audio-energy profiling over STUB-decoded samples — the
    silence-trim / loudness-segmentation primitive an audio-training
    pipeline runs before clip selection (energy gating is the standard
    first curation pass; clips are cut at low-energy valleys), on the
    repo's multimodal stand-in doctrine (`multimodal_scene_boundaries`):
    the real PCM decoder isn't in this container, so the deterministic
    stand-in sample stream is the payload's character codes (centered at
    'a'−1 = one code unit per sample), and everything AROUND the decode —
    fixed-width framing, per-window integer energy Σa², peak flagging,
    floored mean power — is the real Spark-side plumbing a decoder would
    feed.  Window = 40 samples; is_peak marks each payload's loudest
    window (max-energy, engine-exact on integers).

    100 TB shape: the sample explode is per-row expression work fanning
    out L rows per payload (with a real decoder this is the
    arrow-batched mapInPandas of `multimodal_cdc_chunks_arrow`, emitting
    only (id, win, energy)); one (payload, window) hash agg + one
    per-payload window max — no shuffle carries raw samples except the
    window-grain agg exchange."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    samples = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(text)),"
                " i -> ascii(substring(text, i, 1)) - 96)"
            )
        ).alias("i0", "a"),
    ).select(
        "doc_id",
        (F.col("i0") / F.lit(_AUDIO_W)).cast("long").alias("win_idx"),
        "a",
    )
    wins = samples.groupBy("doc_id", "win_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("energy"),
    )
    wmax = Window.partitionBy("doc_id")
    return wins.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "win_idx",
        "n_samples",
        "energy",
        (F.col("energy") == F.max("energy").over(wmax)).alias("is_peak"),
        F.expr("CAST(energy DIV n_samples AS BIGINT)").alias(
            "mean_power_floor"
        ),
    )


# --------------------------------------------------------------------------
# stream_spearman_maintain — rank correlation as IVM (entity-grain state)
# --------------------------------------------------------------------------
@register("stream_spearman_maintain", oracle=_SPEARMAN_ORACLE)
def stream_spearman_maintain_q(spark, sf_dir):
    """`eval_spearman_rho` as incremental view maintenance — the
    balance-vs-spend monitor running ON the order stream: ranks are NOT
    additive (one arriving order can shift every customer's spend rank),
    but the sufficient statistic under them IS — the per-customer exact
    DECIMAL spend sum, folded additively per batch (the
    `stream_drawdown_maintain` entity-grain state class).  The face —
    static customer dim join, double rank windows, rational rho parts —
    recomputes from state at read time, so stream == batch under any
    bundling BY CONSTRUCTION of the decimal sum (exact, order-free).
    Shares the batch oracle verbatim.

    100 TB shape: per trigger O(batch + touched customers) keyed fold;
    the face costs the batch row's two rank windows at entity grain —
    run on read, not per trigger."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_orders_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_spearman_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.groupBy(F.col("o_custkey").alias("ck")).agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("sp")
        )
        state = read_state_parquet(sp, state_path)
        merged = (
            state.unionByName(part)
            .groupBy("ck")
            .agg(F.sum("sp").cast("decimal(18,6)").alias("sp"))
            if state is not None
            else part
        )
        staging = state_path + "_staging"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(state_path)
        shutil.rmtree(staging, ignore_errors=True)

    query = (
        read_orders_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    return finish_and_clean(
        _spearman_face(spark, sf_dir, spark.read.parquet(state_path)), root
    )


# --------------------------------------------------------------------------
# temporal_acf_profile — multi-lag autocorrelation moment parts
# --------------------------------------------------------------------------
@register(
    "temporal_acf_profile",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag),
    pairs AS (
      SELECT l.lag, d.y AS x, p.y AS px
      FROM daily d
      CROSS JOIN lags l
      JOIN daily p ON p.day = d.day - CAST(l.lag AS INT)
    ),
    moms AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(px) AS BIGINT) AS spx,
             COUNT(*) * SUM(CAST(x AS HUGEINT) * px)
               - SUM(CAST(x AS HUGEINT)) * SUM(px) AS cov,
             COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
               - SUM(CAST(x AS HUGEINT)) * SUM(x) AS vx,
             COUNT(*) * SUM(CAST(px AS HUGEINT) * px)
               - SUM(CAST(px AS HUGEINT)) * SUM(px) AS vp
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n, sx, spx,
           CAST(cov AS BIGINT) AS cov_num,
           CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END
                AS INT) AS corr_sign,
           CAST(((cov * cov) // NULLIF(vx, 0)) * 1000000 // NULLIF(vp, 0)
                AS BIGINT) AS corr_sq_e6
    FROM moms
    """,
)
def temporal_acf_profile_q(spark, sf_dir):
    """Multi-lag autocorrelation PROFILE of the daily event-count series
    — the full ACF head (lags 1..7) that `temporal_autocorr_lag1`'s
    single-lag per-entity moments cannot draw: the shape of these seven
    numbers is how one reads persistence vs weekly seasonality vs white
    noise before fitting any AR model (a lag-7 spike over flat 2..6 IS
    the weekly signature; `temporal_seasonal_profile` shows the means,
    this shows the memory).  Per lag: exact integer covariance numerator
    n·Σ(x·px) − Σx·Σpx (sign = correlation sign), and ρ² in exact e6
    units via the two-step floored division in DECIMAL(38,0) — the
    `profile_correlation_pairs` doctrine verbatim (ρ's sqrt stays with
    the consumer; ρ² is what gets thresholded).  Lag pairs come from a
    date-arithmetic self-join, so calendar gaps drop pairs instead of
    silently shifting the series (stated contract).

    100 TB shape: the corpus collapses to day grain in ONE hash agg;
    the 7-lag expansion joins the tiny daily frame to itself — constant
    fanout on a frame that is |days| rows at any corpus size."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    d = daily.select(F.col("day").alias("d_day"), F.col("y").alias("x"))
    p = daily.select(F.col("day").alias("p_day"), F.col("y").alias("px"))
    pairs = (
        d.crossJoin(lags)
        .join(p, F.expr("p_day = date_sub(d_day, lag)"))
        .select("lag", "x", "px")
    )
    moms = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("px").cast("long").alias("spx"),
        F.expr(
            "COUNT(1) * SUM(CAST(x AS DECIMAL(38,0)) * px)"
            " - SUM(CAST(x AS DECIMAL(38,0))) * SUM(px)"
        ).alias("cov"),
        F.expr(
            "COUNT(1) * SUM(CAST(x AS DECIMAL(38,0)) * x)"
            " - SUM(CAST(x AS DECIMAL(38,0))) * SUM(x)"
        ).alias("vx"),
        F.expr(
            "COUNT(1) * SUM(CAST(px AS DECIMAL(38,0)) * px)"
            " - SUM(CAST(px AS DECIMAL(38,0))) * SUM(px)"
        ).alias("vp"),
    )
    return moms.select(
        F.col("lag").cast("long").alias("lag"),
        "n",
        "sx",
        "spx",
        F.col("cov").cast("long").alias("cov_num"),
        F.expr(
            "CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END"
            " AS INT)"
        ).alias("corr_sign"),
        F.expr(
            "CAST(((cov * cov) DIV NULLIF(vx, 0)) * 1000000 DIV NULLIF(vp, 0)"
            " AS BIGINT)"
        ).alias("corr_sq_e6"),
    )


# --------------------------------------------------------------------------
# text_kneser_ney_counts — KN smoothing ingredients as exact censuses
# --------------------------------------------------------------------------
@register(
    "text_kneser_ney_counts",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '') AS ws
      FROM documents WHERE doc_id < 500
    ),
    big AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(list_transform(range(1, len(ws)),
               i -> ws[CAST(i AS INT)] || ' ' || ws[CAST(i + 1 AS INT)])) AS g
        FROM toks
      ) GROUP BY g
    ),
    nn AS (
      SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
             CAST(SUM(c) AS BIGINT) AS n_bigram_tokens
      FROM big
    ),
    wstats AS (
      SELECT split_part(g, ' ', 2) AS word,
             CAST(COUNT(*) AS BIGINT) AS continuation_types,
             CAST(SUM(c) AS BIGINT) AS right_tokens
      FROM big GROUP BY 1
    ),
    fan AS (
      SELECT split_part(g, ' ', 1) AS word,
             CAST(COUNT(*) AS BIGINT) AS fanout_types
      FROM big GROUP BY 1
    )
    SELECT w.word, w.continuation_types,
           COALESCE(f.fanout_types, 0) AS fanout_types,
           w.right_tokens,
           nn.n1, nn.n2, nn.n_bigram_types, nn.n_bigram_tokens,
           CAST(1000000 * w.continuation_types // nn.n_bigram_types
                AS BIGINT) AS p_cont_ppm,
           CAST(1000000 * nn.n1 // (nn.n1 + 2 * nn.n2) AS BIGINT)
             AS discount_ppm
    FROM wstats w LEFT JOIN fan f ON f.word = w.word CROSS JOIN nn
    WHERE w.continuation_types >= 5
    """,
)
def text_kneser_ney_counts_q(spark, sf_dir):
    """Kneser-Ney smoothing INGREDIENTS as exact censuses — what
    separates KN from every count-based smoother is that its backoff
    unigram uses CONTINUATION counts (how many distinct left contexts a
    word follows), not raw frequency ('Francisco' is frequent but only
    ever follows 'San' — KN correctly refuses to predict it cold), and
    every ingredient is a pure integer census: per word N1+(·w)
    (continuation types — the KN base distribution numerator), N1+(w·)
    (fanout types — the normalizer of the bigram back-off weight),
    right-position token count; corpus-level n1/n2 (bigram types seen
    once/twice) and the absolute discount D = n1/(n1+2n2) in exact
    floored ppm (Ney et al.'s leave-one-out estimate).  P_cont(w) gates
    as exact ppm of bigram types.  The probability MODEL assembled from
    these (discounted bigram + interpolated continuation base) is
    read-time float work for the consumer — the `text_lm_bigram_score`
    split.  Words with continuation_types ≥ 5 gate (bounds the face;
    the censuses underneath are corpus-complete).

    100 TB shape: ONE bigram hash census (map-side combine collapses
    the corpus), then three census-grain aggs — the n1/n2 frame is one
    row, word stats are vocabulary-grain; nothing re-scans text."""
    toks = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select(
        F.filter(
            F.split(F.lower("text"), r"\s+"), lambda x: x != F.lit("")
        ).alias("ws")
    )
    grams = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
    )
    big = (
        toks.filter(F.size("ws") >= 2)
        .select(F.explode(grams).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nn = big.agg(
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_bigram_types"),
        F.sum("c").cast("long").alias("n_bigram_tokens"),
    )
    wstats = big.groupBy(
        F.substring_index("g", " ", -1).alias("word")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("continuation_types"),
        F.sum("c").cast("long").alias("right_tokens"),
    )
    fan = big.groupBy(F.substring_index("g", " ", 1).alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("fanout_types")
    )
    return (
        wstats.filter(F.col("continuation_types") >= 5)
        .join(fan, on="word", how="left")
        .crossJoin(nn)
        .select(
            "word",
            "continuation_types",
            F.coalesce("fanout_types", F.lit(0)).cast("long").alias(
                "fanout_types"
            ),
            "right_tokens",
            "n1",
            "n2",
            "n_bigram_types",
            "n_bigram_tokens",
            F.expr(
                "CAST(1000000 * continuation_types DIV n_bigram_types"
                " AS BIGINT)"
            ).alias("p_cont_ppm"),
            F.expr(
                "CAST(1000000 * n1 DIV (n1 + 2 * n2) AS BIGINT)"
            ).alias("discount_ppm"),
        )
    )
