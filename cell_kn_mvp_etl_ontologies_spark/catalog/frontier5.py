"""Round-8 extension batch: the rank-correlation / paired-detector /
uplift corner of the evaluation family (SURVEY §2.12).

- `eval_spearman_rank` — Spearman ρ between two per-customer metrics
  under a KEYED TOTAL ORDER (tie-broken ranks, so d² is deterministic
  and the whole statistic is BIGINT-exact; classic fractional tie-ranks
  would reintroduce engine-specific averaging).  Ranks come from the
  two-pass distributed `with_global_rank` — no single-partition sort.
- `eval_kendall_tau` — Kendall τ_a from exact concordant/discordant/tied
  pair counts on the raw metric pairs (no rank distortion), sign-
  decomposed ppm (negative-operand integer division is engine-specific,
  the frontier4 doctrine).  All-pairs on a bounded eval slice — the
  documented O(|slice|²) gate tier; production samples the slice.
- `eval_mcnemar` — paired binary detectors on the same corpus: the
  discordant-cell χ² (plain + continuity-corrected), the standard test
  for "did detector B actually change verdicts vs detector A".
- `eval_gains_deciles` — cumulative gains / lift table over score
  deciles (the campaign-targeting twin of the calibration diagram),
  deciles assigned by the distributed `ntile_exact` under the
  (score DESC, doc_id) total order.
- `eval_uplift_qini` (round 9, VERDICT r8 #6) — treated-vs-control
  Qini / uplift table over the same deciles, treatment assigned by the
  deterministic md5 coin; sign-decomposed integer ratios.

Shared doctrines: integer/rational identities end-to-end, truncating
division only on proven-non-negative operands or sign-decomposed, eval
cost O(run) or O(slice²) with the slice bounded and named.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# eval_spearman_rank — total-order Spearman over two customer metrics
# --------------------------------------------------------------------------
SPEARMAN_RANK_ORACLE = """
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
    SELECT n, sum_d2,
           CAST(1000000 - 6000000 * sum_d2 // (n * (n * n - 1)) AS BIGINT)
             AS rho_ppm
    FROM agg
    """


@register("eval_spearman_rank", oracle=SPEARMAN_RANK_ORACLE)
def eval_spearman_rank_q(spark, sf_dir):
    """Spearman rank correlation between order FREQUENCY and total SPEND
    per customer — the monotone-association audit (do heavy orderers
    spend more?), reported as ρ·1e6.

    Exactness: both rank vectors use the keyed total order
    ``(metric, cust)`` — ranks are permutations of 1..n in BOTH engines,
    so Σd² is BIGINT-exact and ρ = 1 − 6Σd²/(n(n²−1)) reduces to one
    truncating division with non-negative operands.  (Classic Spearman
    averages tied ranks — a fractional, engine-orderable quantity; the
    keyed variant is the deterministic twin, documented contract.)

    100 TB shape: per-customer agg is one keyed exchange; each rank
    vector is `with_global_rank`'s two-pass range-rank (ADVICE r7's
    distributed-ntile machinery — no single-partition window anywhere);
    the d² reduction is map-side.  ρ itself is a 1-row aggregate.

    Headroom bound (ADVICE r8): the ppm numerator ``6e6 · Σd²`` is
    BIGINT; worst-case Σd² (perfect anti-correlation) is (n³−n)/3, so
    the numerator overflows int64 once n ≳ 16.6k ranked entities.
    Realistic positive-correlation Σd² is far smaller, but the contract
    bound is the worst case: for large-n production use, rescale first
    (e.g. compute ``Σd² DIV n`` before multiplying, giving n ≲ 2.5e7,
    or emit ρ in double) — this query is the exact gate tier and keeps
    the integer identity; the n ≤ 16.6k bound is the documented limit."""
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
        "sum_d2",
        F.expr(
            "CAST(1000000 - 6000000 * sum_d2 DIV (n * (n * n - 1)) AS BIGINT)"
        ).alias("rho_ppm"),
    )


# --------------------------------------------------------------------------
# eval_kendall_tau — exact concordant/discordant census on a bounded slice
# --------------------------------------------------------------------------
@register(
    "eval_kendall_tau",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
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
           CAST(CASE WHEN n_conc >= n_disc
                THEN 1000000 * (n_conc - n_disc) // n_pairs
                ELSE -(1000000 * (n_disc - n_conc) // n_pairs) END AS BIGINT)
             AS tau_a_ppm
    FROM census
    """,
)
def eval_kendall_tau_q(spark, sf_dir):
    """Kendall τ_a between order frequency and spend on a BOUNDED eval
    slice (custkey < 200): exact concordant / discordant / tied pair
    census on the RAW metric pairs — no rank transform, so ties are
    counted honestly instead of being broken away (the ordinal-
    association companion to `eval_spearman_rank`'s keyed-rank ρ).

    Exactness: every pair verdict is a sign of an int64 product;
    τ_a = (C − D)/n_pairs is emitted sign-decomposed (CASE on C ≥ D with
    non-negative division on each branch — negative-operand DIV rounds
    engine-specifically, the frontier4 doctrine).

    100 TB shape: the all-pairs join is O(|slice|²) BY CONTRACT — the
    slice is the eval run (hundreds of entities), never the corpus; the
    corpus-scale work is the one keyed agg producing the metrics.
    Production τ over large n uses a sampled slice or the O(n log n)
    inversion count; this is the exact gate tier."""
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
    )
    a = per_cust.select(
        F.col("cust").alias("ca"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = per_cust.select(
        F.col("cust").alias("cb"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, F.col("ca") < F.col("cb")).select(
        ((F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))).alias("prod")
    )
    census = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("prod") > 0).cast("long")).cast("long").alias("n_conc"),
        F.sum((F.col("prod") < 0).cast("long")).cast("long").alias("n_disc"),
        F.sum((F.col("prod") == 0).cast("long")).cast("long").alias("n_tied"),
    )
    return census.select(
        "n_pairs",
        "n_conc",
        "n_disc",
        "n_tied",
        F.expr(
            "CAST(CASE WHEN n_conc >= n_disc"
            " THEN 1000000 * (n_conc - n_disc) DIV n_pairs"
            " ELSE -(1000000 * (n_disc - n_conc) DIV n_pairs) END AS BIGINT)"
        ).alias("tau_a_ppm"),
    )


# --------------------------------------------------------------------------
# eval_mcnemar — paired binary detectors, discordant-cell chi-square
# --------------------------------------------------------------------------
@register(
    "eval_mcnemar",
    oracle="""
    WITH verdicts AS (
      SELECT
        CASE WHEN 1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) >= 40000
             THEN 1 ELSE 0 END AS da,
        CASE WHEN text LIKE '% the %' THEN 1 ELSE 0 END AS db
      FROM documents
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN da = 0 AND db = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        CAST(SUM(CASE WHEN da = 0 AND db = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(SUM(CASE WHEN da = 1 AND db = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(SUM(CASE WHEN da = 1 AND db = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
      FROM verdicts
    )
    SELECT n00, n01, n10, n11,
           CAST(CASE WHEN n01 + n10 = 0 THEN 0
                ELSE 1000 * (n10 - n01) * (n10 - n01) // (n01 + n10) END AS BIGINT)
             AS chi2_milli,
           CAST(CASE WHEN n01 + n10 = 0 OR abs(n10 - n01) < 1 THEN 0
                ELSE 1000 * (abs(n10 - n01) - 1) * (abs(n10 - n01) - 1)
                     // (n01 + n10) END AS BIGINT) AS chi2_cc_milli
    FROM cells
    """,
)
def eval_mcnemar_q(spark, sf_dir):
    """McNemar's test for PAIRED binary detectors — the right test when
    two quality screens run on the SAME documents (a two-proportion test
    would ignore the pairing): detector A = stopword-ratio ≥ 4% (the
    calibration family's score), detector B = the literal ' the '
    substring screen.  Only the discordant cells carry information:
    χ² = (n10 − n01)²/(n01 + n10), plus the continuity-corrected
    (|n10 − n01| − 1)² variant — both in milli-units, squared numerators
    so every division is non-negative.

    100 TB shape: two codegen verdict columns on the scan, one 4-cell
    aggregate — single pass, no shuffle beyond the final 1-row reduce."""
    score = F.expr(
        "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
        " t -> t IN ('the','a','of','and','to','in','is')))"
        " DIV size(split(text, '\\\\s+')) AS BIGINT)"
    )
    verdicts = _t(spark, sf_dir, "documents").select(
        (score >= 40000).cast("long").alias("da"),
        F.col("text").like("% the %").cast("long").alias("db"),
    )
    cells = verdicts.agg(
        F.sum(((F.col("da") == 0) & (F.col("db") == 0)).cast("long"))
        .cast("long")
        .alias("n00"),
        F.sum(((F.col("da") == 0) & (F.col("db") == 1)).cast("long"))
        .cast("long")
        .alias("n01"),
        F.sum(((F.col("da") == 1) & (F.col("db") == 0)).cast("long"))
        .cast("long")
        .alias("n10"),
        F.sum(((F.col("da") == 1) & (F.col("db") == 1)).cast("long"))
        .cast("long")
        .alias("n11"),
    )
    return cells.select(
        "n00",
        "n01",
        "n10",
        "n11",
        F.expr(
            "CAST(CASE WHEN n01 + n10 = 0 THEN 0"
            " ELSE 1000 * (n10 - n01) * (n10 - n01) DIV (n01 + n10) END AS BIGINT)"
        ).alias("chi2_milli"),
        F.expr(
            "CAST(CASE WHEN n01 + n10 = 0 OR abs(n10 - n01) < 1 THEN 0"
            " ELSE 1000 * (abs(n10 - n01) - 1) * (abs(n10 - n01) - 1)"
            " DIV (n01 + n10) END AS BIGINT)"
        ).alias("chi2_cc_milli"),
    )


# --------------------------------------------------------------------------
# eval_gains_deciles — cumulative gains / lift over score deciles
# --------------------------------------------------------------------------
@register(
    "eval_gains_deciles",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
        CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) AS score_ppm,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    binned AS (
      SELECT y, ntile(10) OVER (ORDER BY score_ppm DESC, doc_id) AS decile
      FROM scored
    ),
    per AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM binned GROUP BY decile
    ),
    cum AS (
      SELECT CAST(decile AS BIGINT) AS decile, n, n_pos,
             SUM(n) OVER (ORDER BY decile) AS cum_n,
             SUM(n_pos) OVER (ORDER BY decile) AS cum_pos,
             SUM(n) OVER () AS tot_n,
             SUM(n_pos) OVER () AS tot_pos
      FROM per
    )
    SELECT decile, n, n_pos,
           CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST(1000000 * cum_pos // tot_pos AS BIGINT) AS gains_ppm,
           CAST(1000000 * cum_pos * tot_n // (cum_n * tot_pos) AS BIGINT)
             AS lift_ppm
    FROM cum
    """,
)
def eval_gains_deciles_q(spark, sf_dir):
    """Cumulative gains / lift table — the campaign-targeting rendering
    of the calibration family: rank the corpus by the English-ness score
    DESCENDING, cut into deciles, and report what share of all positives
    the top-k deciles capture (gains) and how much better than random
    that is (lift).  Decile 1 lift ≫ 1e6 means the score concentrates
    positives at the top even if its absolute calibration is off — the
    decision-quality view `eval_calibration_bins` can't show.

    Exactness: deciles via the distributed `ntile_exact` under the
    (−score, doc_id) total order (bit-equal to ntile(10) OVER score
    DESC); gains/lift are cumulative-integer ratios with non-negative
    truncating division (cum_pos·tot_n ≤ n² ≤ ~1e9 at gate SF — BIGINT
    headroom to ~3e9 corpus rows before the lift numerator needs
    rescaling, documented bound).

    100 TB shape: same cost as the calibration diagram — one two-pass
    range-rank + a 10-row cumulative window."""
    from ..operators.windows import ntile_exact

    scored = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("score_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    # descending score == ascending (−score, doc_id) — a total order
    binned = ntile_exact(
        scored.withColumn("neg_score", -F.col("score_ppm")),
        10,
        ["neg_score", "doc_id"],
        "decile",
    )
    per = binned.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w_cum).cast("long").alias("cum_n"),
        F.sum("n_pos").over(w_cum).cast("long").alias("cum_pos"),
        F.sum("n").over(w_all).cast("long").alias("tot_n"),
        F.sum("n_pos").over(w_all).cast("long").alias("tot_pos"),
    )
    return cum.select(
        "decile",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        F.expr("CAST(1000000 * cum_pos DIV tot_pos AS BIGINT)").alias("gains_ppm"),
        F.expr(
            "CAST(1000000 * cum_pos * tot_n DIV (cum_n * tot_pos) AS BIGINT)"
        ).alias("lift_ppm"),
    )


# --------------------------------------------------------------------------
# eval_uplift_qini — treated-vs-control Qini / uplift table over deciles
# --------------------------------------------------------------------------
@register(
    "eval_uplift_qini",
    oracle="""
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
      SELECT CAST(decile AS BIGINT) AS decile, n_t, n_c, pos_t, pos_c,
             CAST(SUM(n_t) OVER (ORDER BY decile) AS BIGINT) AS cum_n_t,
             CAST(SUM(n_c) OVER (ORDER BY decile) AS BIGINT) AS cum_n_c,
             CAST(SUM(pos_t) OVER (ORDER BY decile) AS BIGINT) AS cum_pos_t,
             CAST(SUM(pos_c) OVER (ORDER BY decile) AS BIGINT) AS cum_pos_c
      FROM per
    )
    SELECT decile, n_t, n_c, pos_t, pos_c, cum_n_t, cum_n_c, cum_pos_t, cum_pos_c,
           CAST(CASE WHEN cum_n_c = 0 THEN 0
                WHEN cum_pos_t * cum_n_c >= cum_pos_c * cum_n_t
                THEN 1000 * (cum_pos_t * cum_n_c - cum_pos_c * cum_n_t) // cum_n_c
                ELSE -(1000 * (cum_pos_c * cum_n_t - cum_pos_t * cum_n_c) // cum_n_c)
                END AS BIGINT) AS qini_milli,
           CAST(CASE WHEN cum_n_c = 0 OR cum_n_t = 0 THEN 0
                WHEN cum_pos_t * cum_n_c >= cum_pos_c * cum_n_t
                THEN 1000000 * (cum_pos_t * cum_n_c - cum_pos_c * cum_n_t)
                     // (cum_n_t * cum_n_c)
                ELSE -(1000000 * (cum_pos_c * cum_n_t - cum_pos_t * cum_n_c)
                     // (cum_n_t * cum_n_c)) END AS BIGINT) AS uplift_ppm
    FROM cum
    """,
)
def eval_uplift_qini_q(spark, sf_dir):
    """Qini / uplift table over score deciles — the treated-vs-control
    completion of `eval_gains_deciles` (VERDICT r8 #6): a deterministic
    md5 coin (``hash_bucket(doc_id, 2, 'uplift')``, the sample_split_hash
    contract) assigns each document to treatment (t=1) or control (t=0);
    the corpus is ranked by the English-ness score DESC and cut into the
    SAME `ntile_exact` deciles for both arms; each cumulative cut k
    reports

      qini(k)   = cum_pos_t − cum_pos_c · cum_n_t / cum_n_c   (milli)
      uplift(k) = cum_pos_t/cum_n_t − cum_pos_c/cum_n_c       (ppm)

    — the incremental-positives curve a campaign-targeting model is
    judged by.  With a pure-hash treatment independent of y, uplift ≈ 0
    at every cut (the A/A null), so the table doubles as a randomization
    audit: |uplift_ppm| far from 0 at large cum_n flags a broken split.

    Exactness: both statistics are sign-decomposed integer ratios
    (CASE on the cross-product comparison, truncating division only on
    proven-non-negative operands — the frontier4 doctrine; eval_mcnemar's
    squared-numerator trick doesn't apply since uplift is signed).
    Headroom: numerators are ≤ 1e6·n², int64-safe to n ≈ 3e6 units per
    arm — beyond that rescale cum counts first (documented bound, same
    class as eval_gains_deciles' ~3e9 note).

    100 TB shape: one codegen projection (score + md5 coin), one
    two-pass `ntile_exact` range-rank, a 10-row cumulative window —
    identical cost envelope to the gains table; the treatment column
    adds zero shuffles."""
    from ..operators.training import hash_bucket
    from ..operators.windows import ntile_exact

    scored = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("score_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
        hash_bucket(F.col("doc_id"), 2, "uplift").cast("long").alias("t"),
    )
    binned = ntile_exact(
        scored.withColumn("neg_score", -F.col("score_ppm")),
        10,
        ["neg_score", "doc_id"],
        "decile",
    )
    per = binned.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.sum("t").cast("long").alias("n_t"),
        F.sum(F.lit(1) - F.col("t")).cast("long").alias("n_c"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("pos_t"),
        F.sum((F.lit(1) - F.col("t")) * F.col("y")).cast("long").alias("pos_c"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        "n_t",
        "n_c",
        "pos_t",
        "pos_c",
        F.sum("n_t").over(w_cum).cast("long").alias("cum_n_t"),
        F.sum("n_c").over(w_cum).cast("long").alias("cum_n_c"),
        F.sum("pos_t").over(w_cum).cast("long").alias("cum_pos_t"),
        F.sum("pos_c").over(w_cum).cast("long").alias("cum_pos_c"),
    )
    return cum.select(
        "decile",
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
        F.expr(
            "CAST(CASE WHEN cum_n_c = 0 OR cum_n_t = 0 THEN 0"
            " WHEN cum_pos_t * cum_n_c >= cum_pos_c * cum_n_t"
            " THEN 1000000 * (cum_pos_t * cum_n_c - cum_pos_c * cum_n_t)"
            " DIV (cum_n_t * cum_n_c)"
            " ELSE -(1000000 * (cum_pos_c * cum_n_t - cum_pos_t * cum_n_c)"
            " DIV (cum_n_t * cum_n_c)) END AS BIGINT)"
        ).alias("uplift_ppm"),
    )
