"""Round-10 extension batch: directed-graph structure audits, magnitude
histograms, lexical richness, targeting/evaluation economics, planted-
missingness quality auditing, 1-D nearest-value joining, and sequence
fingerprinting (SURVEY §2.12, §2.11).

- `graph_reciprocity` — per-node edge reciprocity over a derived directed
  slice: the directed-graph health metric (mutual-follow rate) next to
  `graph_degree_stats`; one keyed self-join against the reversed edge set.
- `stream_reciprocity_maintain` — the same table as IVM: the maintained
  state is the DISTINCT edge set (per-batch anti-join merge); the per-node
  reciprocity profile is a read-time face over state.  Shares the batch
  oracle constant.
- `agg_log_histogram` — decimal-magnitude (digit-count) histogram of
  order totals: the scale-free distribution profile that catches unit
  errors (a 100× ingest bug moves every row two buckets) without
  assuming a parametric shape.  Exact integer bucket stats.
- `text_hapax_ratio` — per-language lexical richness: vocabulary size,
  hapax-legomenon count and ratio, integer type-token ratio — the
  vocabulary-health face of the Zipf/vocab-growth family on the shared
  tokenizer convention.
- `eval_lift_at_k` — targeting lift at top-k% score cutoffs (the
  campaign-economics face of the detector-metrics family): exact integer
  rank cutoffs, lift in ppm against the base rate.
- `sample_inverse_propensity` — per-stratum inverse-propensity weights
  for a deterministically-assigned treatment with stratum-varying rate:
  propensity and IPW weight in exact ppm, zero-treated strata NULL by
  contract (the largest-remainder guard doctrine).
- `temporal_ewma_crossover` — fast/slow finite-impulse EWMA crossover
  signals per user: integer-weighted windows (4-2-1 over 3 events vs
  32-16-8-4-2-1 over 6) compared by cross-multiplication so the engines
  never divide; crossover = sign flip of the cross-multiplied diff.
- `quality_seasonal_null_audit` — per-hour missingness audit with a
  PLANTED hour-dependent null mask: per-bucket null rates vs the overall
  rate, buckets flagged by exact integer cross-multiplication (rate >
  1.5× overall) — the seasonal data-quality monitor.
- `join_nearest_value` — 1-D nearest-neighbor join WITHIN a group by
  VALUE (each order to its same-customer nearest-price other order):
  sort-adjacency production shape (equal-value runs resolved by min/
  second-min key, distinct-value neighbors by lag/lead) vs the oracle's
  per-group quadratic argmin — never a cross join in the engine.
- `dedup_sequence_fingerprint` — per-document min-4 rolling 3-gram
  fingerprint (winnowing-lite): token codes from md5, gram codes by
  modular polynomial combination (all < 2^61, overflow-proof), the 4
  smallest as the document signature — the order-sensitive dedup blocker
  that exact/MinHash hashing misses (re-shuffled documents share bags
  but not sequences).

Shared doctrines: integer/rational identities (ppm/milli, DIV), md5-
derived determinism for planted scenarios, explicit NULL guards on empty
denominators, additive or keyed-join IVM only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import commit_state_parquet, load_table, read_state_parquet
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# graph_reciprocity — per-node edge reciprocity on a derived directed slice
# --------------------------------------------------------------------------
_RECIP_EDGES_SQL = """
      SELECT DISTINCT
        CAST(user_id % 300 AS BIGINT) AS src,
        CAST((user_id * 31 + event_id) % 300 AS BIGINT) AS dst
      FROM events
      WHERE user_id % 300 <> (user_id * 31 + event_id) % 300
"""

_RECIP_ORACLE_SQL = f"""
    WITH e AS ({_RECIP_EDGES_SQL}
    ),
    r AS (
      SELECT a.src, a.dst,
             CASE WHEN b.src IS NULL THEN 0 ELSE 1 END AS recip
      FROM e a LEFT JOIN e b ON b.src = a.dst AND b.dst = a.src
    )
    SELECT src AS node,
           CAST(COUNT(*) AS BIGINT) AS out_deg,
           CAST(SUM(recip) AS BIGINT) AS n_recip,
           CAST(1000000 * SUM(recip) // COUNT(*) AS BIGINT) AS recip_ppm
    FROM r GROUP BY src
"""


def _recip_edges(spark, sf_dir):
    """ONE definition of the reciprocity slice, shared by the batch row and
    the streaming maintainer (the `_scc_edges` single-slice doctrine)."""
    ev = _t(spark, sf_dir, "events")
    src = (F.col("user_id") % 300).cast("long")
    dst = ((F.col("user_id") * 31 + F.col("event_id")) % 300).cast("long")
    return (
        ev.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def reciprocity_profile(edges):
    """(node, out_deg, n_recip, recip_ppm) per source node: one keyed
    LEFT SEMI-shaped join against the reversed edge set (expressed as a
    left join + indicator so non-reciprocal edges still count), then a
    per-node aggregate.  100 TB shape: both sides shuffle once on the
    (dst, src)/(src, dst) key — no broadcast needed, no closure; skewed
    hub nodes salt like any hot join key."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("_r"))
    marked = edges.join(rev, on=["src", "dst"], how="left").select(
        "src", F.coalesce(F.col("_r"), F.lit(0)).alias("recip")
    )
    return marked.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("out_deg"),
        F.sum("recip").cast("long").alias("n_recip"),
        F.expr("CAST(1000000 * sum(recip) DIV count(*) AS BIGINT)").alias("recip_ppm"),
    )


@register("graph_reciprocity", oracle=_RECIP_ORACLE_SQL)
def graph_reciprocity_q(spark, sf_dir):
    """Per-node edge reciprocity — the mutual-link rate that separates
    broadcast-shaped graphs (news feeds, citation) from conversational
    ones (follows-back, co-purchase): for every directed edge, is the
    reverse edge present?  Exact integers; recip_ppm = 1e6·n_recip DIV
    out_deg (out_deg ≥ 1 by grouping, no zero guard needed)."""
    return reciprocity_profile(_recip_edges(spark, sf_dir))


# --------------------------------------------------------------------------
# agg_log_histogram — decimal-magnitude histogram of order totals
# --------------------------------------------------------------------------
@register(
    "agg_log_histogram",
    oracle="""
    WITH v AS (
      SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS whole,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0
    )
    SELECT CAST(LENGTH(CAST(whole AS VARCHAR)) AS BIGINT) AS magnitude,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM v GROUP BY 1
    """,
)
def agg_log_histogram_q(spark, sf_dir):
    """Decimal-magnitude histogram (bucket = digit count of the integer
    part): the scale-free distribution profile that catches unit errors —
    a 100× ingest bug shifts every row exactly two buckets, visible at a
    glance where a mean would just grow.  Digit count via string length
    of the BIGINT cast (exact in both engines, no float log10 edge at
    powers of ten).

    100 TB shape: one narrow projection + a hash aggregate over ≤ ~19
    buckets — map-side combine collapses everything; output is O(1)."""
    v = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor("o_totalprice").cast("long").alias("whole"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    return v.groupBy(
        F.length(F.col("whole").cast("string")).cast("long").alias("magnitude")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


# --------------------------------------------------------------------------
# text_hapax_ratio — per-language lexical richness
# --------------------------------------------------------------------------
@register(
    "text_hapax_ratio",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
      FROM documents
    ),
    freq AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS f
      FROM tok WHERE w <> '' GROUP BY lang, w
    )
    SELECT lang,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(1000000 * SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) // COUNT(*)
                AS BIGINT) AS hapax_ppm,
           CAST(1000 * COUNT(*) // SUM(f) AS BIGINT) AS ttr_milli
    FROM freq GROUP BY lang
    """,
)
def text_hapax_ratio_q(spark, sf_dir):
    """Per-language lexical richness: vocabulary size, hapax legomena
    (once-occurring terms) and their share of the vocabulary, and the
    integer type-token ratio — the vocabulary-health companion of
    `text_zipf_rank`/`text_vocab_growth` (a template-generated corpus
    shows collapsed hapax share; scraped natural text runs ~40-60%).
    Shared tokenizer convention ([^a-z0-9]+ on lowercased text).

    100 TB shape: corpus-linear token explode into a (lang, w) hash agg
    (map-side combined), then a |vocab|-row second aggregate — no joins,
    no windows; vocab grows sub-linearly (Heaps' law) so the second agg
    shrinks relative to the corpus as data scales."""
    tok = _t(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    freq = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("long").alias("f"))
    return freq.groupBy("lang").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) DIV count(*) AS BIGINT)"
        ).alias("hapax_ppm"),
        F.expr("CAST(1000 * count(*) DIV sum(f) AS BIGINT)").alias("ttr_milli"),
    )


# --------------------------------------------------------------------------
# eval_lift_at_k — targeting lift at top-k% cutoffs
# --------------------------------------------------------------------------
@register(
    "eval_lift_at_k",
    oracle="""
    WITH scored AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             row_number() OVER (ORDER BY FLOOR(o_totalprice * 100) DESC,
                                o_orderkey ASC) AS rnk
      FROM orders
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos FROM scored
    ),
    ks AS (SELECT unnest([1, 5, 10, 25]) AS pct)
    SELECT CAST(k.pct AS BIGINT) AS pct,
           CAST(t.n * k.pct // 100 AS BIGINT) AS k,
           CAST(SUM(CASE WHEN s.rnk <= t.n * k.pct // 100 THEN s.y ELSE 0 END)
                AS BIGINT) AS pos_k,
           CASE WHEN t.n * k.pct // 100 = 0 OR t.pos = 0 THEN NULL
                ELSE CAST(1000000 *
                     (SUM(CASE WHEN s.rnk <= t.n * k.pct // 100 THEN s.y ELSE 0 END) * t.n)
                     // ((t.n * k.pct // 100) * t.pos) AS BIGINT)
           END AS lift_ppm
    FROM scored s, tot t, ks k
    GROUP BY k.pct, t.n, t.pos
    """,
)
def eval_lift_at_k_q(spark, sf_dir):
    """Targeting lift at top-k% score cutoffs — the campaign-economics
    face of the detector family (`eval_gains_deciles` reports the whole
    decile curve; this answers 'how much better than random is the slice
    I can afford to act on').  Score = order total in cents, label =
    finalized order; cutoff k = n·pct DIV 100 rows by (score DESC, key
    ASC) — an exact integer rank cutoff both engines agree on; lift_ppm
    = 1e6·(pos_k·n) DIV (k·pos), NULL when the cutoff or positive count
    is empty (explicit guard, the largest-remainder doctrine).

    100 TB shape: one global rank — at corpus scale the cutoffs come from
    the distributed two-pass rank (the ntile_exact machinery); here the
    rank feeds a conditional aggregate, output is 4 rows."""
    scored = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        "o_orderkey",
    )
    w = Window.orderBy(F.desc("score"), F.asc("o_orderkey"))
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    ks = ranked.sparkSession.createDataFrame([(1,), (5,), (10,), (25,)], "pct int")
    joined = ranked.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ks))
    return (
        joined.groupBy(F.col("pct").cast("long").alias("pct"), "n", "pos")
        .agg(
            F.expr("CAST(max(n * pct DIV 100) AS BIGINT)").alias("k"),
            F.expr(
                "CAST(sum(CASE WHEN rnk <= n * pct DIV 100 THEN y ELSE 0 END) AS BIGINT)"
            ).alias("pos_k"),
        )
        .select(
            "pct",
            "k",
            "pos_k",
            F.expr(
                "CASE WHEN k = 0 OR pos = 0 THEN NULL"
                " ELSE CAST(1000000 * (pos_k * n) DIV (k * pos) AS BIGINT) END"
            ).alias("lift_ppm"),
        )
    )


# --------------------------------------------------------------------------
# sample_inverse_propensity — stratified IPW weights, exact ppm
# --------------------------------------------------------------------------
@register(
    "sample_inverse_propensity",
    oracle="""
    WITH assigned AS (
      SELECT lang, source,
             CASE WHEN ('0x' || substring(md5('ipw|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < 10 + (LENGTH(source) * 7) % 30
                  THEN 1 ELSE 0 END AS treated
      FROM documents
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(treated) AS BIGINT) AS n_treated,
           CAST(1000000 * SUM(treated) // COUNT(*) AS BIGINT) AS p_ppm,
           CASE WHEN SUM(treated) = 0 THEN NULL
                ELSE CAST(1000000 * COUNT(*) // SUM(treated) AS BIGINT)
           END AS w_ppm
    FROM assigned GROUP BY lang, source
    """,
)
def sample_inverse_propensity_q(spark, sf_dir):
    """Per-stratum inverse-propensity weights for a deterministic
    md5-assigned treatment whose RATE VARIES BY STRATUM (10-39% by source
    name) — the reweighting table observational-analysis pipelines join
    onto treated rows so stratum-skewed assignment stops biasing the
    estimate.  Propensity p̂ and weight 1/p̂ in exact ppm; a zero-treated
    stratum yields NULL weight by contract (explicit guard — silently
    dividing would diverge between engines).

    100 TB shape: one hash aggregate at stratum grain; the weight table is
    dimension-sized and broadcasts back onto the corpus."""
    docs = _t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ipw|"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    thr = F.lit(10) + (F.length("source") * 7) % 30
    assigned = docs.select(
        "lang", "source", F.when(h % 100 < thr, 1).otherwise(0).alias("treated")
    )
    return assigned.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("treated").cast("long").alias("n_treated"),
        F.expr("CAST(1000000 * sum(treated) DIV count(*) AS BIGINT)").alias("p_ppm"),
        F.expr(
            "CASE WHEN sum(treated) = 0 THEN NULL"
            " ELSE CAST(1000000 * count(*) DIV sum(treated) AS BIGINT) END"
        ).alias("w_ppm"),
    )


# --------------------------------------------------------------------------
# temporal_ewma_crossover — integer fast/slow EWMA crossover signals
# --------------------------------------------------------------------------
@register(
    "temporal_ewma_crossover",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             lag(CAST(FLOOR(value * 100) AS BIGINT), 1) OVER w AS v1,
             lag(CAST(FLOOR(value * 100) AS BIGINT), 2) OVER w AS v2,
             lag(CAST(FLOOR(value * 100) AS BIGINT), 3) OVER w AS v3,
             lag(CAST(FLOOR(value * 100) AS BIGINT), 4) OVER w AS v4,
             lag(CAST(FLOOR(value * 100) AS BIGINT), 5) OVER w AS v5
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sig AS (
      SELECT user_id, rn,
             CASE WHEN 9 * (4*v + 2*v1 + v2) > (32*v + 16*v1 + 8*v2 + 4*v3 + 2*v4 + v5) THEN 1
                  WHEN 9 * (4*v + 2*v1 + v2) < (32*v + 16*v1 + 8*v2 + 4*v3 + 2*v4 + v5) THEN -1
                  ELSE 0 END AS sgn
      FROM seq WHERE rn >= 6
    ),
    x AS (
      SELECT user_id, sgn,
             lag(sgn) OVER (PARTITION BY user_id ORDER BY rn) AS prev_sgn
      FROM sig
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN prev_sgn * sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross,
           CAST(SUM(sgn) AS BIGINT) AS sum_sign
    FROM x GROUP BY user_id
    """,
)
def temporal_ewma_crossover_q(spark, sf_dir):
    """Fast/slow EWMA crossover detection per user — the trading-signal /
    regime-change primitive, made hash-exact by FINITE integer-weighted
    windows (fast = 4-2-1 over the last 3 events ÷7, slow = 32-16-8-4-2-1
    over 6 ÷63) compared by CROSS-MULTIPLICATION (fast/7 vs slow/63 ⟺
    9·fast_num vs slow_num) so no engine ever divides.  Crossover = the
    cross-multiplied sign flipping between consecutive evaluable events
    (zero = neither side, not a cross).

    100 TB shape: one user-keyed window pass (6 lags + the sign lag fuse
    into a single WindowExec), then a user-grain aggregate — corpus-linear,
    no joins."""
    v = F.floor(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        v.alias("v"),
        F.row_number().over(w).alias("rn"),
        *[F.lag(v, i).over(w).alias(f"v{i}") for i in range(1, 6)],
    )
    sig = seq.filter(F.col("rn") >= 6).select(
        "user_id",
        "rn",
        F.expr(
            "CASE WHEN 9 * (4*v + 2*v1 + v2) > (32*v + 16*v1 + 8*v2 + 4*v3 + 2*v4 + v5) THEN 1"
            " WHEN 9 * (4*v + 2*v1 + v2) < (32*v + 16*v1 + 8*v2 + 4*v3 + 2*v4 + v5) THEN -1"
            " ELSE 0 END"
        ).alias("sgn"),
    )
    wx = Window.partitionBy("user_id").orderBy("rn")
    x = sig.select("user_id", "sgn", F.lag("sgn").over(wx).alias("prev_sgn"))
    return x.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.when(F.col("prev_sgn") * F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_cross"),
        F.sum("sgn").cast("long").alias("sum_sign"),
    )


# --------------------------------------------------------------------------
# quality_seasonal_null_audit — per-hour missingness vs overall
# --------------------------------------------------------------------------
@register(
    "quality_seasonal_null_audit",
    oracle="""
    WITH masked AS (
      SELECT EXTRACT(hour FROM ts) AS h,
             CASE WHEN ('0x' || substring(md5('null|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < 5 + CASE WHEN EXTRACT(hour FROM ts) BETWEEN 2 AND 4
                                        THEN 15 ELSE 0 END
                  THEN 1 ELSE 0 END AS is_null
      FROM events
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
             CAST(SUM(is_null) AS BIGINT) AS null_tot
      FROM masked
    )
    SELECT CAST(m.h AS BIGINT) AS h,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(m.is_null) AS BIGINT) AS n_null,
           CAST(1000000 * SUM(m.is_null) // COUNT(*) AS BIGINT) AS null_ppm,
           CAST(CASE WHEN 2 * SUM(m.is_null) * t.n_tot > 3 * t.null_tot * COUNT(*)
                     THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM masked m, tot t
    GROUP BY m.h, t.n_tot, t.null_tot
    """,
)
def quality_seasonal_null_audit_q(spark, sf_dir):
    """Seasonal missingness audit: per-hour null rate of a measurement vs
    the overall rate, hours flagged when their rate exceeds 1.5× overall —
    by EXACT integer cross-multiplication (2·null_h·n_tot > 3·null_tot·n_h),
    never a float ratio compare.  The missingness is PLANTED with an
    md5-derived hour-dependent mask (base 5%, hours 02-04 at 20%) so the
    audit's detection is verifiable: exactly the planted hours must flag.
    This is the monitor that catches 'the overnight ETL job drops a
    column' class of regressions.

    100 TB shape: one projection + hour-grain hash aggregate (24 groups,
    map-side combined) + a broadcast of the 1-row total."""
    ev = _t(spark, sf_dir, "events")
    h_expr = F.hour("ts")
    mask = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("null|"), F.col("event_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    ) < (F.lit(5) + F.when(h_expr.between(2, 4), 15).otherwise(0))
    masked = ev.select(
        h_expr.alias("h"), F.when(mask, 1).otherwise(0).alias("is_null")
    )
    tot = masked.agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.sum("is_null").cast("long").alias("null_tot"),
    )
    per_h = masked.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("is_null").cast("long").alias("n_null"),
    )
    return per_h.crossJoin(F.broadcast(tot)).select(
        F.col("h").cast("long").alias("h"),
        "n",
        "n_null",
        F.expr("CAST(1000000 * n_null DIV n AS BIGINT)").alias("null_ppm"),
        F.expr(
            "CAST(CASE WHEN 2 * n_null * n_tot > 3 * null_tot * n THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("flagged"),
    )


# --------------------------------------------------------------------------
# join_nearest_value — 1-D nearest-neighbor join within a group, by value
# --------------------------------------------------------------------------
@register(
    "join_nearest_value",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS cust, o_orderkey AS okey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    ranked AS (
      SELECT a.okey, b.okey AS partner_key, b.cents AS partner_cents,
             row_number() OVER (PARTITION BY a.okey
                                ORDER BY abs(a.cents - b.cents), b.cents, b.okey)
               AS rn
      FROM o a JOIN o b ON b.cust = a.cust AND b.okey <> a.okey
    ),
    best AS (
      SELECT okey, partner_key, partner_cents FROM ranked WHERE rn = 1
    )
    SELECT o.cust, o.okey, o.cents,
           CAST(b.partner_key AS BIGINT) AS partner_key,
           CAST(b.partner_cents AS BIGINT) AS partner_cents,
           CAST(abs(o.cents - b.partner_cents) AS BIGINT) AS diff_cents
    FROM o LEFT JOIN best b ON b.okey = o.okey
    """,
)
def join_nearest_value_q(spark, sf_dir):
    """1-D nearest-neighbor join by VALUE within a group — each order
    paired to its same-customer order with the closest total (ties →
    lower partner value, then lower partner key; single-order customers
    → NULL).  The oracle computes the naive per-group quadratic argmin;
    the ENGINE never builds a pair: after one sort by (cust, cents, key),

    - an equal-value RUN resolves internally (partner = the run's min key,
      or its second-min for the min-key holder itself — Δ = 0 beats any
      distinct-value neighbor, and among Δ=0 candidates min key wins);
    - a unique value compares its lag/lead DISTINCT-value neighbors by
      (|Δ|, then lower value) and takes that value's min key.

    100 TB shape: one keyed sort + two window passes + one dim-sized
    self-join at (cust, value) grain — O(n log n) vs the oracle's
    Σ|group|²; this is the sort-adjacency trick that makes value-nearest
    joins feasible where a band join would explode."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("okey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # per (cust, cents): run size, min key, second-min key
    grp = o.groupBy("cust", "cents").agg(
        F.count(F.lit(1)).alias("n_same"),
        F.min("okey").alias("min_key"),
    )
    second = (
        o.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("cust", "cents").orderBy("okey")
            ),
        )
        .filter(F.col("_rk") == 2)
        .select("cust", "cents", F.col("okey").alias("min2_key"))
    )
    grp = grp.join(second, on=["cust", "cents"], how="left")
    # distinct-value adjacency per customer
    wv = Window.partitionBy("cust").orderBy("cents")
    adj = grp.select(
        "cust",
        "cents",
        "n_same",
        "min_key",
        "min2_key",
        F.lag("cents").over(wv).alias("prev_c"),
        F.lead("cents").over(wv).alias("next_c"),
    )
    joined = o.join(adj, on=["cust", "cents"])
    # choose the partner VALUE: own run if n_same > 1 (diff 0), else the
    # nearer of prev/next (tie -> lower value); then the partner KEY is that
    # value's min key (or second-min when self is the run's min)
    chosen = joined.select(
        "cust",
        "okey",
        "cents",
        "n_same",
        "min_key",
        "min2_key",
        "prev_c",
        "next_c",
        F.expr(
            "CASE WHEN n_same > 1 THEN cents"
            " WHEN prev_c IS NULL AND next_c IS NULL THEN NULL"
            " WHEN prev_c IS NULL THEN next_c"
            " WHEN next_c IS NULL THEN prev_c"
            " WHEN cents - prev_c <= next_c - cents THEN prev_c"
            " ELSE next_c END"
        ).alias("partner_cents"),
    )
    partner_keys = grp.select(
        "cust",
        F.col("cents").alias("partner_cents"),
        F.col("min_key").alias("p_min_key"),
        F.col("min2_key").alias("p_min2_key"),
    )
    out = chosen.join(partner_keys, on=["cust", "partner_cents"], how="left").select(
        "cust",
        "okey",
        "cents",
        # within the chosen partner-value group the min key wins, except a
        # same-value probe that IS the group's min key takes the second-min
        F.expr(
            "CASE WHEN partner_cents IS NULL THEN NULL"
            " WHEN partner_cents = cents AND okey = p_min_key THEN p_min2_key"
            " ELSE p_min_key END"
        ).cast("long").alias("partner_key"),
        F.col("partner_cents").cast("long").alias("partner_cents"),
        F.expr("CAST(abs(cents - partner_cents) AS BIGINT)").alias("diff_cents"),
    )
    return out


# --------------------------------------------------------------------------
# dedup_sequence_fingerprint — min-4 rolling 3-gram document signature
# --------------------------------------------------------------------------
@register(
    "dedup_sequence_fingerprint",
    oracle="""
    WITH raw AS (
      SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS toks
      FROM documents
    ),
    -- positional explode via generate_series (this DuckDB has no WITH
    -- ORDINALITY); 2000 comfortably exceeds the ~100-token max (udf_surface
    -- pattern)
    idx AS (
      SELECT doc_id, toks[i] AS w, i
      FROM raw, generate_series(1, 2000) t(i)
      WHERE i <= len(toks)
    ),
    tok AS (
      SELECT doc_id,
             ('0x' || substring(md5(w), 1, 8))::BIGINT % 1048573 AS c,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS p
      FROM idx WHERE w <> ''
    ),
    gram AS (
      SELECT DISTINCT a.doc_id,
             (a.c * 1048573 + b.c) * 1048573 + c3.c AS g
      FROM tok a
      JOIN tok b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      JOIN tok c3 ON c3.doc_id = a.doc_id AND c3.p = a.p + 2
    ),
    ranked AS (
      SELECT doc_id, g,
             row_number() OVER (PARTITION BY doc_id ORDER BY g) AS slot
      FROM gram
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(slot AS BIGINT) AS slot,
           CAST(g AS BIGINT) AS fp
    FROM ranked WHERE slot <= 4
    """,
)
def dedup_sequence_fingerprint_q(spark, sf_dir):
    """Winnowing-lite sequence fingerprint: per document, the 4 SMALLEST
    distinct rolling 3-gram codes — the ORDER-SENSITIVE dedup blocker the
    bag-of-words family (exact hash, MinHash) cannot provide: a document
    whose sentences were re-shuffled keeps its token bag (same MinHash)
    but loses most of its 3-gram sequence, so these fingerprints diverge.
    Token code = md5 first-8-hex mod 1048573; gram code = base-1048573
    polynomial combination (max < 2^61 — overflow-proof in BIGINT, no
    modular reduction needed so both engines compute bit-identically).

    100 TB shape: corpus-linear posexplode + two self-joins keyed on
    (doc, position) — each is a narrow co-partitioned join (same key
    distribution, one shuffle reused) — then a per-doc bottom-4 window
    (WindowGroupLimit pushes the 4-row cap map-side).  Matching
    signatures group docs into candidate buckets exactly like the LSH
    band join."""
    raw = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("i", "w"),
    )
    tok = (
        raw.filter(F.col("w") != "")
        .withColumn(
            "c",
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % 1048573,
        )
        .withColumn(
            "p",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("i")),
        )
        .select("doc_id", "c", "p")
    )
    b = tok.select("doc_id", F.col("c").alias("c2"), (F.col("p") - 1).alias("p"))
    c3 = tok.select("doc_id", F.col("c").alias("c3"), (F.col("p") - 2).alias("p"))
    gram = (
        tok.join(b, on=["doc_id", "p"])
        .join(c3, on=["doc_id", "p"])
        .select(
            "doc_id",
            ((F.col("c") * 1048573 + F.col("c2")) * 1048573 + F.col("c3")).alias("g"),
        )
        .distinct()
    )
    ranked = gram.withColumn(
        "slot", F.row_number().over(Window.partitionBy("doc_id").orderBy("g"))
    )
    return ranked.filter(F.col("slot") <= 4).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("slot").cast("long").alias("slot"),
        F.col("g").cast("long").alias("fp"),
    )


# --------------------------------------------------------------------------
# stream_reciprocity_maintain — the reciprocity profile as IVM
# --------------------------------------------------------------------------
@register("stream_reciprocity_maintain", oracle=_RECIP_ORACLE_SQL)
def stream_reciprocity_maintain_q(spark, sf_dir):
    """`graph_reciprocity` as incremental view maintenance: the maintained
    state is the DISTINCT derived edge set — each micro-batch derives its
    edges with the shared slice definition and merges them by anti-join
    (only never-seen edges append, so re-delivered events are absorbed:
    idempotent under at-least-once).  The per-node reciprocity profile is
    a READ-TIME face over state (the `stream_pr_curve_maintain`
    state-vs-face doctrine: edge membership is IVM-legitimate, the
    reverse-join profile is not batch-additive).  Shares the batch row's
    oracle constant: stream-maintained == batch == DuckDB, hash-exact.

    100 TB shape: per trigger O(batch) projection + one keyed anti-join
    against edge-cardinality state; the face runs over state rows, never
    the event corpus."""
    import shutil
    import tempfile

    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_recip_")
    edges_path = root + "/edges"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        src = (F.col("user_id") % 300).cast("long")
        dst = ((F.col("user_id") * 31 + F.col("event_id")) % 300).cast("long")
        new = (
            batch_df.select(src.alias("src"), dst.alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # read_state_parquet: None ONLY on a genuinely absent first-batch
        # path; transient read errors propagate (ADVICE r10).
        state = read_state_parquet(sp, edges_path)
        if state is not None:
            fresh = new.join(state, on=["src", "dst"], how="left_anti")
            merged = state.unionByName(fresh)
        else:  # first batch
            merged = new
        commit_state_parquet(merged, edges_path)

    query = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    out = reciprocity_profile(spark.read.parquet(edges_path))
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# eval_cindex — survival concordance index on the bounded eval slice
# --------------------------------------------------------------------------
@register(
    "eval_cindex",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS e,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
      FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    ),
    pairs AS (
      SELECT a.s AS si, b.s AS sj
      FROM per a JOIN per b
        ON a.t < b.t AND a.e = 1 AND a.cust <> b.cust
    ),
    census AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_comparable,
             CAST(SUM(CASE WHEN si > sj THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
             CAST(SUM(CASE WHEN si = sj THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
      FROM pairs
    )
    SELECT n_comparable, n_conc, n_tied,
           CASE WHEN n_comparable = 0 THEN NULL
                ELSE CAST(1000000 * (2 * n_conc + n_tied)
                          // (2 * n_comparable) AS BIGINT)
           END AS c_ppm
    FROM census
    """,
)
def eval_cindex_q(spark, sf_dir):
    """Harrell's concordance index (C-index) for a risk score against
    censored event times — THE discrimination metric of survival
    analysis, completing `temporal_survival_hazard`'s risk table: a pair
    (i, j) is comparable when i's event time is strictly earlier AND i's
    event was observed (j may be censored); concordant when the earlier
    failer carries the HIGHER risk score; ties count half.  Here
    t = order count, event = any finalized order, risk = total spend
    cents; c_ppm = 1e6·(2·conc + tied) DIV (2·comparable), NULL when no
    pair is comparable (explicit guard).

    Gate tier: the all-pairs census on the contract-BOUNDED slice
    (custkey < 200 — the `eval_kendall_tau` slice doctrine, documented
    O(slice²)).  Production at corpus scale is the
    `eval_kendall_tau_full` dominance-counting machinery: sort by t,
    sweep the score CDF — O(|t-values|·n), no pair materialized."""
    per = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("e"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("s"),
        )
    )
    a = per.select(
        F.col("cust").alias("ci"), F.col("t").alias("ti"), F.col("e").alias("ei"),
        F.col("s").alias("si"),
    )
    b = per.select(
        F.col("cust").alias("cj"), F.col("t").alias("tj"), F.col("s").alias("sj")
    )
    pairs = a.join(
        b,
        (F.col("ti") < F.col("tj")) & (F.col("ei") == 1) & (F.col("ci") != F.col("cj")),
    )
    census = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_comparable"),
        F.sum(F.when(F.col("si") > F.col("sj"), 1).otherwise(0))
        .cast("long")
        .alias("n_conc"),
        F.sum(F.when(F.col("si") == F.col("sj"), 1).otherwise(0))
        .cast("long")
        .alias("n_tied"),
    )
    return census.select(
        "n_comparable",
        "n_conc",
        "n_tied",
        F.expr(
            "CASE WHEN n_comparable = 0 THEN NULL"
            " ELSE CAST(1000000 * (2 * n_conc + n_tied) DIV (2 * n_comparable)"
            " AS BIGINT) END"
        ).alias("c_ppm"),
    )


# --------------------------------------------------------------------------
# graph_dag_path_count — aggregated root-path counting on the DAG slice
# --------------------------------------------------------------------------
@register(
    "graph_dag_path_count",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT
        CAST(GREATEST(l_orderkey % 60, l_partkey % 60) AS BIGINT) AS child,
        CAST(LEAST(l_orderkey % 60, l_partkey % 60) AS BIGINT) AS parent
      FROM lineitem
      WHERE l_orderkey % 60 <> l_partkey % 60
        AND ('0x' || substring(md5('dag|' || CAST(GREATEST(l_orderkey % 60, l_partkey % 60) AS VARCHAR)
             || '|' || CAST(LEAST(l_orderkey % 60, l_partkey % 60) AS VARCHAR)), 1, 8))::BIGINT % 100 < 6
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT child AS node FROM e UNION ALL SELECT parent FROM e)
    ),
    roots AS (
      SELECT node FROM nodes
      WHERE node NOT IN (SELECT child FROM e)
    ),
    -- UNION ALL path enumeration: on a DAG every walk is a path, and the
    -- recursion terminates; one row PER PATH (the naive tier the engine's
    -- aggregated counting must equal)
    walk(src, dst) AS (
      SELECT child, parent FROM e
      UNION ALL
      SELECT w.src, e2.parent FROM walk w JOIN e e2 ON w.dst = e2.child
    )
    SELECT CAST(n.node AS BIGINT) AS node,
           CAST(COALESCE(p.n_paths, 0) AS BIGINT) AS n_paths
    FROM nodes n
    LEFT JOIN (
      SELECT src AS node, COUNT(*) AS n_paths
      FROM walk WHERE dst IN (SELECT node FROM roots)
      GROUP BY src
    ) p ON p.node = n.node
    """,
)
def graph_dag_path_count_q(spark, sf_dir):
    """Distinct root-path count per DAG node — the ontology multiplicity
    audit ('how many distinct is-a routes does this term have to a
    root?'): high counts mark diamond-heavy regions where naive closure
    materialization explodes, exactly the rows a 100 TB plan must know
    about.  The oracle ENUMERATES one row per path (UNION ALL recursive
    CTE — the naive tier); the engine only ever AGGREGATES: per-hop
    frontier (src, dst, cnt) with (src, dst)-keyed SUM, root mass peeled
    off each round, rounds capped LOUDLY at 64 (a silent partial count
    would under-report) — the `bounded_shortest_counts` matrix-power
    shape run to exhaustion on the contract-bounded slice.

    100 TB shape: per-round keyed join + partial-agg sum; path COUNTS
    stay one row per (src, frontier-node) no matter how exponential the
    path set is — the whole point of counting in the aggregate domain."""
    from ..plans.graph_query import dag_root_path_counts

    edges = _t(spark, sf_dir, "lineitem")
    a = (F.col("l_orderkey") % 60).cast("long")
    b = (F.col("l_partkey") % 60).cast("long")
    child, parent = F.greatest(a, b), F.least(a, b)
    key = F.concat(
        F.lit("dag|"), child.cast("string"), F.lit("|"), parent.cast("string")
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    e = (
        edges.select(child.alias("child"), parent.alias("parent"))
        .filter(F.col("child") != F.col("parent"))
        .filter(h % 100 < 6)
        .distinct()
    )
    return dag_root_path_counts(e)


# --------------------------------------------------------------------------
# stream_hapax_maintain — the vocabulary census as IVM
# --------------------------------------------------------------------------
@register(
    "stream_hapax_maintain",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
      FROM documents
    ),
    freq AS (
      SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS f
      FROM tok WHERE w <> '' GROUP BY lang, w
    )
    SELECT lang,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(1000000 * SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) // COUNT(*)
                AS BIGINT) AS hapax_ppm,
           CAST(1000 * COUNT(*) // SUM(f) AS BIGINT) AS ttr_milli
    FROM freq GROUP BY lang
    """,
)
def stream_hapax_maintain_q(spark, sf_dir):
    """`text_hapax_ratio` as incremental view maintenance: the maintained
    state is the (lang, word, count) vocabulary census — counts fold by
    pure SUM, so state is bundling-independent (any micro-batch split of
    the corpus converges to the same census); the hapax/richness profile
    is a READ-TIME face over state rows (hapax-ness is NOT batch-additive
    — a word can stop being a hapax — which is exactly why the census,
    not the profile, is the IVM-legitimate statistic: the
    `stream_pr_curve_maintain` doctrine).  Same oracle as the batch row:
    stream-maintained == batch == DuckDB, hash-exact.

    100 TB shape: per trigger O(batch tokens) explode + keyed partial
    agg into vocab-cardinality state (Heaps-sublinear); the face runs
    over state rows, never the corpus."""
    import shutil
    import tempfile

    from ..streaming import read_documents_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_hapax_")
    census_path = root + "/census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        tok = batch_df.select(
            "lang",
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
            ).alias("w"),
        ).filter(F.col("w") != "")
        part = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).cast("long").alias("f"))
        state = read_state_parquet(sp, census_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("lang", "w")
                .agg(F.sum("f").cast("long").alias("f"))
            )
        else:  # first batch
            merged = part
        commit_state_parquet(merged, census_path)

    query = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    freq = spark.read.parquet(census_path)
    out = freq.groupBy("lang").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long").alias("hapax"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) DIV count(*) AS BIGINT)"
        ).alias("hapax_ppm"),
        F.expr("CAST(1000 * count(*) DIV sum(f) AS BIGINT)").alias("ttr_milli"),
    )
    return finish_and_clean(out, root)


def _km_curve(per):
    """The KM read-time face shared by the batch row and the streaming
    maintainer (one source of truth for the pinned fold order): entity
    (t, e) table → (t, d, c) census → suffix risk window → ascending-t
    integer survival fold over the bounded step table."""
    at_t = per.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("e")).cast("long").alias("c"),
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = at_t.select(
        "t", "d", "c", F.sum(F.col("d") + F.col("c")).over(w).cast("long").alias("n_risk")
    )
    # ascending-t fold over the bounded step table: one collected array,
    # one aggregate HOF producing the running product alongside the steps
    folded = risk.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c", "n_risk"))).alias("steps")
    ).select(
        F.explode(
            F.aggregate(
                "steps",
                F.expr(
                    "CAST(array() AS ARRAY<STRUCT<t BIGINT, n_risk BIGINT,"
                    " d BIGINT, c BIGINT, s_ppm BIGINT>>)"
                ),
                lambda acc, s: F.concat(
                    acc,
                    F.array(
                        F.struct(
                            s["t"].alias("t"),
                            s["n_risk"].alias("n_risk"),
                            s["d"].alias("d"),
                            s["c"].alias("c"),
                            (
                                F.when(
                                    F.size(acc) == 0, F.lit(1000000).cast("long")
                                ).otherwise(F.element_at(acc, -1)["s_ppm"])
                                * (s["n_risk"] - s["d"])
                                / s["n_risk"]
                            )
                            # products stay < 2^41, far inside double
                            # exactness; floor == truncating DIV here
                            # (all terms positive)
                            .cast("long")
                            .alias("s_ppm"),
                        )
                    ),
                ),
            )
        ).alias("km")
    )
    return folded.select(
        F.col("km.t").alias("t"),
        F.col("km.n_risk").alias("n_risk"),
        F.col("km.d").alias("d"),
        F.col("km.c").alias("c"),
        F.col("km.s_ppm").alias("s_ppm"),
    )


# --------------------------------------------------------------------------
# temporal_kaplan_meier — exact integer KM survival curve
# --------------------------------------------------------------------------
@register(
    "temporal_kaplan_meier",
    oracle="""
    WITH RECURSIVE per AS (
      SELECT o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS e
      FROM orders GROUP BY o_custkey
    ),
    at_t AS (
      SELECT t,
             CAST(SUM(e) AS BIGINT) AS d,
             CAST(SUM(1 - e) AS BIGINT) AS c
      FROM per GROUP BY t
    ),
    risk AS (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk,
             CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rk
      FROM at_t
    ),
    km(rk, t, d, c, n_risk, s_ppm) AS (
      SELECT rk, t, d, c, n_risk,
             CAST(1000000 * (n_risk - d) // n_risk AS BIGINT)
      FROM risk WHERE rk = 1
      UNION ALL
      SELECT r.rk, r.t, r.d, r.c, r.n_risk,
             CAST(km.s_ppm * (r.n_risk - r.d) // r.n_risk AS BIGINT)
      FROM km JOIN risk r ON r.rk = km.rk + 1
    )
    SELECT t, n_risk, d, c, s_ppm FROM km
    """,
)
def temporal_kaplan_meier_q(spark, sf_dir):
    """Kaplan-Meier survival curve in EXACT integer ppm — the estimator
    behind every retention/churn curve, made hash-gateable by fixing the
    fold order: the survival product S(t) = Π (n_i − d_i)/n_i is evaluated
    as the integer recurrence s_k = s_{k-1}·(n_k − d_k) DIV n_k over event
    times ASCENDING (a product of ppm fractions is order-DEPENDENT under
    truncating division, so the contract pins ascending-t — both engines
    replay the same sequence; DuckDB via a recursive CTE, Spark via one
    aggregate-HOF fold over the collected step table).  Here t = orders
    per customer (the tenure proxy), event = any finalized order,
    censored otherwise; risk set n_t = Σ_{u≥t}(d_u + c_u) by a suffix
    window.

    100 TB shape: entity-grain agg → |distinct t|-grain agg (bounded: a
    tenure axis has tens of steps) → the fold runs on that bounded
    step table driver-free via F.aggregate — the largest-remainder
    bounded-dim doctrine; the corpus is touched exactly once."""
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("e"),
        )
    )
    return _km_curve(per)


# --------------------------------------------------------------------------
# stream_seasonal_null_maintain — the hour census as IVM
# --------------------------------------------------------------------------
@register(
    "stream_seasonal_null_maintain",
    oracle="""
    WITH masked AS (
      SELECT EXTRACT(hour FROM ts) AS h,
             CASE WHEN ('0x' || substring(md5('null|' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 < 5 + CASE WHEN EXTRACT(hour FROM ts) BETWEEN 2 AND 4
                                        THEN 15 ELSE 0 END
                  THEN 1 ELSE 0 END AS is_null
      FROM events
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
             CAST(SUM(is_null) AS BIGINT) AS null_tot
      FROM masked
    )
    SELECT CAST(m.h AS BIGINT) AS h,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(m.is_null) AS BIGINT) AS n_null,
           CAST(1000000 * SUM(m.is_null) // COUNT(*) AS BIGINT) AS null_ppm,
           CAST(CASE WHEN 2 * SUM(m.is_null) * t.n_tot > 3 * t.null_tot * COUNT(*)
                     THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM masked m, tot t
    GROUP BY m.h, t.n_tot, t.null_tot
    """,
)
def stream_seasonal_null_maintain_q(spark, sf_dir):
    """`quality_seasonal_null_audit` as IVM: the maintained state is the
    24-row (hour, n, n_null) census — pure-SUM folds, bundling-independent
    — and the flag computation (rates + the 1.5×-overall cross-
    multiplication) is a READ-TIME face: a bucket's flag can flip as
    other buckets' mass arrives, so the flag is NOT batch-additive while
    the census is (the stream_pr_curve_maintain doctrine, again).  Same
    oracle as the batch row.

    100 TB shape: per trigger O(batch) projection + a 24-group partial
    agg folded into constant-size state; the face is O(24)."""
    import shutil
    import tempfile

    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_nullaudit_")
    census_path = root + "/census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        h_expr = F.hour("ts")
        mask = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("null|"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ) < (F.lit(5) + F.when(h_expr.between(2, 4), 15).otherwise(0))
        part = (
            batch_df.select(
                h_expr.alias("h"), F.when(mask, 1).otherwise(0).alias("is_null")
            )
            .groupBy("h")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("is_null").cast("long").alias("n_null"),
            )
        )
        state = read_state_parquet(sp, census_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("h")
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.sum("n_null").cast("long").alias("n_null"),
                )
            )
        else:  # first batch
            merged = part
        commit_state_parquet(merged, census_path)

    query = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    census = spark.read.parquet(census_path)
    tot = census.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("n_null").cast("long").alias("null_tot"),
    )
    out = census.crossJoin(F.broadcast(tot)).select(
        F.col("h").cast("long").alias("h"),
        "n",
        "n_null",
        F.expr("CAST(1000000 * n_null DIV n AS BIGINT)").alias("null_ppm"),
        F.expr(
            "CAST(CASE WHEN 2 * n_null * n_tot > 3 * null_tot * n THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("flagged"),
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# eval_cindex_full — the C-index production path (dominance counting)
# --------------------------------------------------------------------------
@register(
    "eval_cindex_full",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS e,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey
    ),
    pairs AS (
      SELECT a.s AS si, b.s AS sj
      FROM per a JOIN per b
        ON a.t < b.t AND a.e = 1 AND a.cust <> b.cust
    ),
    census AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_comparable,
             CAST(SUM(CASE WHEN si > sj THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
             CAST(SUM(CASE WHEN si = sj THEN 1 ELSE 0 END) AS BIGINT) AS n_tied
      FROM pairs
    )
    SELECT n_comparable, n_conc, n_tied,
           CASE WHEN n_comparable = 0 THEN NULL
                ELSE CAST(1000000 * (2 * n_conc + n_tied)
                          // (2 * n_comparable) AS BIGINT)
           END AS c_ppm
    FROM census
    """,
)
def eval_cindex_full_q(spark, sf_dir):
    """`eval_cindex`'s PRODUCTION path over ALL customers (the
    `eval_kendall_tau_full` twin discipline, applied to survival
    concordance): NO comparable-pairs join anywhere.  The tenure axis t
    (distinct event times) is BOUNDED (order counts — tens of values), so
    the census decomposes exactly:

    - the event side expands to (t_big, s) cells through the strict
      (t_small < t_big) combo dim — the documented O(|t-values|·n)
      expansion, a broadcast of a ≤ T² dim, never an all-pairs join;
    - per t_big, a PARTITIONED descending-s window turns the expanded
      event multiset into a strict-CDF (cum-greater / tied-at-s), and
      probe rows read their counts off the same merged frame;
    - comparability mass comes from the per-t event totals' exclusive
      prefix sum — one T-row window.

    The oracle is the naive all-pairs census (DuckDB affords n² at the
    gate SF); identical output contract to the bounded gate tier."""
    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("e"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("s"),
        )
    )
    tvals = per.select("t").distinct()
    combos = (
        tvals.select(F.col("t").alias("t_small"))
        .join(tvals.select(F.col("t").alias("t_big")), F.expr("t_small < t_big"))
    )
    ev_ts = (
        per.filter(F.col("e") == 1)
        .groupBy("t", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("ev_c"))
    )
    grid = (
        ev_ts.join(F.broadcast(combos), ev_ts["t"] == combos["t_small"])
        .groupBy("t_big", "s")
        .agg(F.sum("ev_c").cast("long").alias("ev_c"))
    )
    probes = per.groupBy(F.col("t").alias("t_big"), "s").agg(
        F.count(F.lit(1)).cast("long").alias("pr_c")
    )
    merged = (
        grid.join(probes, on=["t_big", "s"], how="full_outer")
        .select(
            "t_big",
            "s",
            F.coalesce(F.col("ev_c"), F.lit(0)).alias("ev_c"),
            F.coalesce(F.col("pr_c"), F.lit(0)).alias("pr_c"),
        )
    )
    w = (
        Window.partitionBy("t_big")
        .orderBy(F.desc("s"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = merged.select(
        "t_big",
        "s",
        "ev_c",
        "pr_c",
        (F.sum("ev_c").over(w) - F.col("ev_c")).alias("ev_greater"),
    )
    conc_tied = cdf.agg(
        F.sum(F.col("pr_c") * F.col("ev_greater")).cast("long").alias("n_conc"),
        F.sum(F.col("pr_c") * F.col("ev_c")).cast("long").alias("n_tied"),
    )
    # comparability mass: per-t event totals, exclusive ascending prefix
    ev_t = per.filter(F.col("e") == 1).groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev")
    )
    pr_t = per.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n_pr"))
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        pr_t.join(ev_t, on="t", how="left")
        .select("t", "n_pr", F.coalesce(F.col("n_ev"), F.lit(0)).alias("n_ev"))
        .select("t", "n_pr", F.coalesce(F.sum("n_ev").over(wt), F.lit(0)).alias("ev_before"))
    )
    comparable = prefix.agg(
        F.sum(F.col("n_pr") * F.col("ev_before")).cast("long").alias("n_comparable")
    )
    return comparable.crossJoin(conc_tied).select(
        "n_comparable",
        "n_conc",
        "n_tied",
        F.expr(
            "CASE WHEN n_comparable = 0 THEN NULL"
            " ELSE CAST(1000000 * (2 * n_conc + n_tied) DIV (2 * n_comparable)"
            " AS BIGINT) END"
        ).alias("c_ppm"),
    )


# --------------------------------------------------------------------------
# quality_k_anonymity — k-anonymity / l-diversity audit over quasi-identifiers
# --------------------------------------------------------------------------
@register(
    "quality_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS size_bucket,
             doc_id % 7 AS sensitive
      FROM documents
    ),
    grp AS (
      SELECT lang, source, size_bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l_div
      FROM q GROUP BY lang, source, size_bucket
    ),
    ks AS (SELECT unnest([2, 5, 10]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN g.n < ks.k THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           CAST(SUM(CASE WHEN g.n < ks.k THEN g.n ELSE 0 END) AS BIGINT)
             AS exposed_rows,
           CAST(SUM(CASE WHEN g.l_div < 2 THEN g.n ELSE 0 END) AS BIGINT)
             AS low_diversity_rows
    FROM grp g, ks GROUP BY ks.k
    """,
)
def quality_k_anonymity_q(spark, sf_dir):
    """k-anonymity / l-diversity release audit — the privacy companion of
    `text_pii_redact`: bucket the corpus by quasi-identifiers (language,
    source, coarse size bucket), and for k ∈ {2, 5, 10} count the
    equivalence classes smaller than k and the rows they EXPOSE (a row in
    a size-1 class is re-identifiable from its quasi-identifiers alone);
    l-diversity flags rows whose class carries fewer than 2 distinct
    sensitive values (here a derived 7-way label) — k-anonymous but
    attribute-disclosing.  All counts exact integers.

    100 TB shape: one hash aggregate at quasi-identifier grain (map-side
    combined; the class table is dimension-sized relative to the corpus),
    then a ×3 constant k-dim fanout of THAT table — the corpus is
    touched once and never joined."""
    q = _t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.expr("CAST(n_chars DIV 100 AS BIGINT)").alias("size_bucket"),
        (F.col("doc_id") % 7).alias("sensitive"),
    )
    grp = q.groupBy("lang", "source", "size_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("sensitive").cast("long").alias("l_div"),
    )
    ks = q.sparkSession.createDataFrame([(2,), (5,), (10,)], "k int")
    return (
        grp.crossJoin(F.broadcast(ks))
        .groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("violating_groups"),
            F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("exposed_rows"),
            F.sum(F.when(F.col("l_div") < 2, F.col("n")).otherwise(0))
            .cast("long")
            .alias("low_diversity_rows"),
        )
    )


# --------------------------------------------------------------------------
# stream_kaplan_meier_maintain — entity tenure state as IVM, KM at read
# --------------------------------------------------------------------------
def _km_oracle() -> str:
    return """
    WITH RECURSIVE per AS (
      SELECT o_custkey AS cust,
             CAST(COUNT(*) AS BIGINT) AS t,
             CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS e
      FROM orders GROUP BY o_custkey
    ),
    at_t AS (
      SELECT t,
             CAST(SUM(e) AS BIGINT) AS d,
             CAST(SUM(1 - e) AS BIGINT) AS c
      FROM per GROUP BY t
    ),
    risk AS (
      SELECT t, d, c,
             CAST(SUM(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk,
             CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rk
      FROM at_t
    ),
    km(rk, t, d, c, n_risk, s_ppm) AS (
      SELECT rk, t, d, c, n_risk,
             CAST(1000000 * (n_risk - d) // n_risk AS BIGINT)
      FROM risk WHERE rk = 1
      UNION ALL
      SELECT r.rk, r.t, r.d, r.c, r.n_risk,
             CAST(km.s_ppm * (r.n_risk - r.d) // r.n_risk AS BIGINT)
      FROM km JOIN risk r ON r.rk = km.rk + 1
    )
    SELECT t, n_risk, d, c, s_ppm FROM km
    """


@register("stream_kaplan_meier_maintain", oracle=_km_oracle())
def stream_kaplan_meier_maintain_q(spark, sf_dir):
    """`temporal_kaplan_meier` as incremental view maintenance — the
    INTERESTING IVM case: the (t, d, c) step census is NOT batch-additive
    (an entity's tenure t GROWS as its orders stream in, moving it
    between census buckets), so the maintained state sits one level
    down, at ENTITY grain: per customer, (order count, any-finalized)
    fold by keyed merge — count is additive, the event flag is a MAX
    lattice, both bundling-independent.  The KM curve (census + suffix
    risk window + ascending-t survival fold) is a READ-TIME face over
    the customer-cardinality state.  Same oracle as the batch row:
    stream-maintained == batch == DuckDB, hash-exact.

    100 TB shape: per trigger O(batch) projection + one keyed merge into
    entity-cardinality state; the face runs over |entities| state rows
    and its fold over the bounded tenure axis — the corpus is never
    rescanned."""
    import shutil
    import tempfile

    from ..streaming import read_orders_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_km_")
    state_path = root + "/per_cust"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.groupBy(F.col("o_custkey").alias("cust")).agg(
            F.count(F.lit(1)).cast("long").alias("t"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("e"),
        )
        state = read_state_parquet(sp, state_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("cust")
                .agg(
                    F.sum("t").cast("long").alias("t"),
                    F.max("e").cast("long").alias("e"),
                )
            )
        else:  # first batch
            merged = part
        commit_state_parquet(merged, state_path)

    query = (
        read_orders_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    out = _km_curve(spark.read.parquet(state_path))
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# graph_harmonic_centrality_bounded — Σ 1/d within the radius, exact ppm
# --------------------------------------------------------------------------
@register(
    "graph_harmonic_centrality_bounded",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT DISTINCT CAST(l_orderkey % 60 AS BIGINT) AS src,
                      CAST(l_partkey % 60 AS BIGINT) AS dst
      FROM lineitem
      WHERE l_orderkey % 60 <> l_partkey % 60
        AND ('0x' || substring(md5('scc|' || CAST(l_orderkey % 60 AS VARCHAR)
             || '|' || CAST(l_partkey % 60 AS VARCHAR)), 1, 8))::BIGINT % 100 < 4
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
           CAST(COALESCE(SUM(1000000 // m.d), 0) AS BIGINT) AS harmonic_ppm
    FROM nodes n LEFT JOIN dmin m ON m.s = n.node
    GROUP BY n.node
    """,
)
def graph_harmonic_centrality_bounded_q(spark, sf_dir):
    """Bounded-radius harmonic centrality — Σ 1/d over reachable targets
    within 6 hops, the centrality that handles DISCONNECTED graphs
    gracefully (unreachable targets contribute 0, no infinite-distance
    special case — why Boldi-Vigna recommend it over closeness).  Made
    exact by summing the PER-PAIR truncated integer 1e6 DIV d — each term
    is a pure function of the pair, so the sum is partition- and
    order-proof (the betweenness c_milli doctrine).  Completes the
    bounded-radius family on the SAME `bounded_shortest_counts` distance
    table as betweenness/eccentricity; same slice, same walk-enumerating
    naive oracle vs aggregated engine plan.

    100 TB shape: reuses the O(radius) keyed matrix-power shuffles; the
    centrality itself is one node-grain aggregate over the distance
    table.  Brandes-style source sampling applies unchanged at corpus
    scale."""
    from ..plans.graph_query import bounded_shortest_counts

    from .frontier6 import _scc_edges

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
            F.coalesce(F.sum(F.expr("1000000 DIV d")), F.lit(0))
            .cast("long")
            .alias("harmonic_ppm"),
        )
        .select(F.col("node").cast("long").alias("node"), "n_reach", "harmonic_ppm")
    )


# --------------------------------------------------------------------------
# eval_brier_decomposition — Murphy reliability / resolution / uncertainty
# --------------------------------------------------------------------------
@register(
    "eval_brier_decomposition",
    oracle="""
    WITH scored AS (
      SELECT
        CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) AS p_ppm,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    bins AS (
      SELECT p_ppm,
             CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(y) AS BIGINT) AS dk
      FROM scored GROUP BY p_ppm
    ),
    tot AS (
      SELECT CAST(SUM(nk) AS BIGINT) AS n, CAST(SUM(dk) AS BIGINT) AS pos
      FROM bins
    ),
    terms AS (
      SELECT
        SUM((CAST(nk AS HUGEINT) * p_ppm - CAST(1000000 AS HUGEINT) * dk)
            * (CAST(nk AS HUGEINT) * p_ppm - CAST(1000000 AS HUGEINT) * dk)
            // nk) AS rel_sum,
        SUM(CAST(1000000000000 AS HUGEINT)
            * (CAST(t.n AS HUGEINT) * dk - CAST(nk AS HUGEINT) * t.pos)
            * (CAST(t.n AS HUGEINT) * dk - CAST(nk AS HUGEINT) * t.pos)
            // (CAST(nk AS HUGEINT) * t.n * t.n)) AS res_sum,
        MAX(t.n) AS n, MAX(t.pos) AS pos
      FROM bins, tot t
    )
    SELECT n, pos,
           CAST(rel_sum // n AS BIGINT) AS reliability_e12,
           CAST(res_sum // n AS BIGINT) AS resolution_e12,
           CAST((1000000 * pos // n) * (1000000 * (n - pos) // n) AS BIGINT)
             AS uncertainty_e12
    FROM terms GROUP BY n, pos, rel_sum, res_sum
    """,
)
def eval_brier_decomposition_q(spark, sf_dir):
    """Murphy decomposition of the Brier score — reliability (calibration
    error mass), resolution (how far bin outcomes move from the base
    rate; what `eval_brier_score`'s single total cannot separate), and
    uncertainty (climatology ȳ(1−ȳ)) — binned by EXACT forecast value so
    the bin-mean forecast is the value itself and the only rationals are
    the per-bin outcome rates.  Those are cleared by cross-multiplication
    into 38-digit arithmetic (DECIMAL(38,0) / HUGEINT — the CUPED/Gini
    doctrine): rel_k = (n_k·p_k − 1e6·d_k)² DIV n_k, res_k =
    1e12·(N·d_k − n_k·pos)² DIV (n_k·N), each truncated PER BIN (the
    stated contract), summed then DIV N into e12 units.  BS ≈ REL − RES
    + UNC holds up to the per-bin truncations (pinned in tests).

    Same forecast/outcome derivation as `eval_brier_score` (stopword
    English-ness ppm vs lang='en') so the family composes.

    100 TB shape: one corpus projection → one (p_ppm)-grain hash agg →
    |bins|-row second agg with a 1-row broadcast of the totals; nothing
    quadratic, bins ≤ distinct forecast values."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    stop = F.filter(
        toks,
        lambda t: t.isin("the", "a", "of", "and", "to", "in", "is"),
    )
    scored = docs.select(
        (F.lit(1000000) * F.size(stop)).cast("long").alias("_num"),
        F.size(toks).cast("long").alias("_den"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    ).select(F.expr("CAST(_num DIV _den AS BIGINT)").alias("p_ppm"), "y")
    bins = scored.groupBy("p_ppm").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("y").cast("long").alias("dk"),
    )
    tot = bins.agg(
        F.sum("nk").cast("long").alias("n"), F.sum("dk").cast("long").alias("pos")
    )
    # Per-bin floor quotients stay in DECIMAL(38,0) (ADVICE r10): Spark's
    # IntegralDivide returns BIGINT, which silently WRAPS once the per-bin
    # quotient passes 9.2e18 (nk beyond ~9e6 rows per forecast bin at the
    # corpus scale the docstring claims), unlike the oracle's true HUGEINT.
    # floor(a/b) for a,b >= 0 is computed exactly as (a - pmod(a,b)) / b —
    # the adjusted numerator is divisible by b, so the decimal division is
    # exact (verified against Python bigint ground truth on 30-digit
    # numerators).
    per_bin = bins.crossJoin(F.broadcast(tot)).select(
        "nk",
        "n",
        "pos",
        F.expr(
            "(CAST(nk AS DECIMAL(38,0)) * p_ppm - CAST(1000000 AS DECIMAL(38,0)) * dk)"
            " * (CAST(nk AS DECIMAL(38,0)) * p_ppm - CAST(1000000 AS DECIMAL(38,0)) * dk)"
        ).alias("rel_num"),
        F.expr(
            "CAST(1000000000000 AS DECIMAL(38,0))"
            " * (CAST(n AS DECIMAL(38,0)) * dk - CAST(nk AS DECIMAL(38,0)) * pos)"
            " * (CAST(n AS DECIMAL(38,0)) * dk - CAST(nk AS DECIMAL(38,0)) * pos)"
        ).alias("res_num"),
        F.expr("CAST(nk AS DECIMAL(38,0)) * n * n").alias("res_den"),
    )
    terms = per_bin.agg(
        F.sum(
            F.expr(
                "CAST((rel_num - pmod(rel_num, CAST(nk AS DECIMAL(38,0)))) / nk"
                " AS DECIMAL(38,0))"
            )
        ).alias("rel_sum"),
        F.sum(
            F.expr(
                "CAST((res_num - pmod(res_num, res_den)) / res_den"
                " AS DECIMAL(38,0))"
            )
        ).alias("res_sum"),
        F.max("n").alias("n"),
        F.max("pos").alias("pos"),
    )
    return terms.select(
        F.col("n").cast("long").alias("n"),
        F.col("pos").cast("long").alias("pos"),
        F.expr("CAST(rel_sum DIV n AS BIGINT)").alias("reliability_e12"),
        F.expr("CAST(res_sum DIV n AS BIGINT)").alias("resolution_e12"),
        F.expr(
            "CAST((1000000 * pos DIV n) * (1000000 * (n - pos) DIV n) AS BIGINT)"
        ).alias("uncertainty_e12"),
    )


# --------------------------------------------------------------------------
# temporal_velocity_profile — first/second discrete differences per user
# --------------------------------------------------------------------------
@register(
    "temporal_velocity_profile",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(FLOOR(value * 100) AS BIGINT)
               - lag(CAST(FLOOR(value * 100) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d1,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    acc AS (
      SELECT user_id, d1,
             d1 - lag(d1) OVER (PARTITION BY user_id ORDER BY rn) AS d2
      FROM seq WHERE d1 IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(SUM(CASE WHEN d1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(SUM(CASE WHEN d1 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
           CAST(MAX(ABS(d1)) AS BIGINT) AS max_jump,
           CAST(SUM(ABS(d1)) AS BIGINT) AS path_len,
           CAST(SUM(CASE WHEN d2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_accel
    FROM acc GROUP BY user_id
    """,
)
def temporal_velocity_profile_q(spark, sf_dir):
    """Discrete motion profile per user — first differences (velocity:
    up/down/flat move counts, max jump, total path length) and second
    differences (acceleration count) of the value series, all exact
    integers on cents, both lags over the (ts, event_id) total order.
    The volatility-shape screen that separates drifting series from
    oscillating ones where a variance would conflate them.

    100 TB shape: one user-keyed window pass (both lags fuse) + a
    user-grain aggregate; corpus-linear, no joins."""
    v = F.floor(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        (v - F.lag(v).over(w)).alias("d1"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("d1").isNotNull())
    w2 = Window.partitionBy("user_id").orderBy("rn")
    acc = seq.select(
        "user_id", "d1", (F.col("d1") - F.lag("d1").over(w2)).alias("d2")
    )
    return acc.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_moves"),
        F.sum(F.when(F.col("d1") > 0, 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("d1") < 0, 1).otherwise(0)).cast("long").alias("n_down"),
        F.max(F.abs("d1")).cast("long").alias("max_jump"),
        F.sum(F.abs("d1")).cast("long").alias("path_len"),
        F.sum(F.when(F.col("d2") > 0, 1).otherwise(0)).cast("long").alias("n_accel"),
    )


# --------------------------------------------------------------------------
# stream_velocity_maintain — TWO-LEVEL boundary-stitched motion census
# --------------------------------------------------------------------------
@register(
    "stream_velocity_maintain",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(FLOOR(value * 100) AS BIGINT)
               - lag(CAST(FLOOR(value * 100) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d1,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    acc AS (
      SELECT user_id, d1,
             d1 - lag(d1) OVER (PARTITION BY user_id ORDER BY rn) AS d2
      FROM seq WHERE d1 IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(SUM(CASE WHEN d1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(SUM(CASE WHEN d1 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
           CAST(MAX(ABS(d1)) AS BIGINT) AS max_jump,
           CAST(SUM(ABS(d1)) AS BIGINT) AS path_len,
           CAST(SUM(CASE WHEN d2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_accel
    FROM acc GROUP BY user_id
    """,
)
def stream_velocity_maintain_q(spark, sf_dir):
    """`temporal_velocity_profile` as IVM with a TWO-LEVEL boundary
    stitch — the escalation of the markov maintainer's doctrine: a batch
    boundary severs BOTH difference orders, so per-batch windows alone
    drop one d1 per active user AND the d2 that spans the boundary, plus
    the d2 between the stored last d1 and the batch's first internal d1.
    The maintainer therefore keeps per-user (last value, last d1) state
    and stitches: boundary d1 = batch-first-value − stored-last-value
    (counted, and PAIRED with stored-last-d1 for its d2), then the
    batch's first internal d1 pairs with the boundary d1.  The census
    columns themselves are SUM/MAX lattices, so once d1/d2 events are
    correctly enumerated the fold is bundling-independent.  Same
    ordering contract as `stream_markov_maintain` (batches per-user
    event-time ordered); shares the batch row's oracle: hash-exact.

    100 TB shape: per trigger one user-keyed window over the BATCH, one
    keyed join against user-cardinality state, one census merge — the
    corpus is never rescanned."""
    import shutil
    import tempfile

    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_vel_")
    census_path = root + "/census"
    last_path = root + "/last"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        v = F.floor(F.col("value") * 100).cast("long")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = batch_df.select(
            "user_id",
            "ts",
            "event_id",
            v.alias("v"),
            (v - F.lag(v).over(w)).alias("d1"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_batch"),
        )
        internal = seq.filter(F.col("d1").isNotNull()).select(
            "user_id",
            "d1",
            (F.col("d1") - F.lag("d1").over(Window.partitionBy("user_id").orderBy("rn"))).alias(
                "d2"
            ),
            F.col("rn"),
        )
        firsts = seq.filter(F.col("rn") == 1).select(
            "user_id", F.col("v").alias("first_v")
        )
        first_internal = internal.filter(F.col("rn") == 2).select(
            "user_id", F.col("d1").alias("first_d1")
        )
        last = read_state_parquet(sp, last_path)
        has_state = last is not None
        if has_state:
            # boundary d1 per user with stored state: stitches the severed
            # first difference AND supplies both severed second differences
            boundary = (
                last.join(firsts, "user_id")
                .select(
                    "user_id",
                    (F.col("first_v") - F.col("last_v")).alias("d1"),
                    (F.col("first_v") - F.col("last_v") - F.col("last_d1")).alias("d2"),
                    F.lit(1).alias("rn"),
                )
            )
            # the batch's first internal d1 pairs with the boundary d1
            fixed_first = (
                boundary.select("user_id", F.col("d1").alias("b_d1"))
                .join(first_internal, "user_id")
                .select(
                    "user_id",
                    F.col("first_d1").alias("d1"),
                    (F.col("first_d1") - F.col("b_d1")).alias("d2"),
                    F.lit(2).alias("rn"),
                )
            )
            moves = (
                internal.join(
                    fixed_first.select("user_id", F.col("rn").alias("_fr")),
                    on="user_id",
                    how="left",
                )
                .filter(F.col("_fr").isNull() | (F.col("rn") != 2))
                .select("user_id", "d1", "d2", "rn")
                .unionByName(boundary)
                .unionByName(fixed_first)
            )
        else:
            moves = internal
        part = moves.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_moves"),
            F.sum(F.when(F.col("d1") > 0, 1).otherwise(0)).cast("long").alias("n_up"),
            F.sum(F.when(F.col("d1") < 0, 1).otherwise(0)).cast("long").alias("n_down"),
            F.max(F.abs("d1")).cast("long").alias("max_jump"),
            F.sum(F.abs("d1")).cast("long").alias("path_len"),
            F.sum(F.when(F.col("d2") > 0, 1).otherwise(0)).cast("long").alias("n_accel"),
        )
        census = read_state_parquet(sp, census_path)
        if census is not None:
            merged_census = (
                census.unionByName(part)
                .groupBy("user_id")
                .agg(
                    F.sum("n_moves").cast("long").alias("n_moves"),
                    F.sum("n_up").cast("long").alias("n_up"),
                    F.sum("n_down").cast("long").alias("n_down"),
                    F.max("max_jump").cast("long").alias("max_jump"),
                    F.sum("path_len").cast("long").alias("path_len"),
                    F.sum("n_accel").cast("long").alias("n_accel"),
                )
            )
        else:  # first batch
            merged_census = part
        # new last-state: the batch's last event value + trailing d1 (which
        # is the boundary-stitched d1 when the batch had a single event)
        w_last = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        batch_last = (
            seq.withColumn("_rl", F.row_number().over(w_last))
            .filter(F.col("_rl") == 1)
            .select("user_id", "ts", "event_id", "v", "d1", "n_batch")
        )
        if has_state:
            # trailing d1: the batch's own last d1 when it has ≥2 events,
            # else the boundary d1 (single-event batch)
            bd = boundary.select("user_id", F.col("d1").alias("_bd1"))
            new_last = (
                batch_last.join(bd, "user_id", "left")
                .select(
                    "user_id",
                    F.col("ts").alias("last_ts"),
                    F.col("event_id").alias("last_eid"),
                    F.col("v").alias("last_v"),
                    F.coalesce(
                        F.when(F.col("n_batch") >= 2, F.col("d1")),
                        F.col("_bd1"),
                    ).alias("last_d1"),
                )
            )
            carried = last.join(batch_last.select("user_id"), "user_id", "left_anti")
            merged_last = carried.unionByName(new_last)
        else:
            merged_last = batch_last.select(
                "user_id",
                F.col("ts").alias("last_ts"),
                F.col("event_id").alias("last_eid"),
                F.col("v").alias("last_v"),
                F.col("d1").alias("last_d1"),
            )
        for frame, path in ((merged_census, census_path), (merged_last, last_path)):
            commit_state_parquet(frame, path)

    query = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    out = spark.read.parquet(census_path).select(
        "user_id", "n_moves", "n_up", "n_down", "max_jump", "path_len", "n_accel"
    )
    return finish_and_clean(out, root)
