"""Round-7 extension surface (batches 3-32): the analytics / training-data
operator families added beyond the reference's own set, each with an
exactly-equivalent DuckDB oracle (integer quantization keeps every score
bit-exact across engines; see catalog/__init__ cross-engine rules).

Families in this module (SURVEY §2.12/§2.13 carries the per-query rows):

- concentration & inequality: Gini (integer rank identity), HHI
  (mergeable sum-of-squares), Lorenz curve, Pareto 80/20 coverage
- data-quality audits: Benford first-digit (hardcoded integer ppm
  expectations), completeness census, sequence gaps, freshness,
  duplication & cluster-size scorecards, split leakage/balance,
  mojibake & char-diversity & code & readability screens
- warehouse analytics: broadcast star rollup (+ streaming maintainer),
  RFM, cohort LTV, aging buckets, WoW growth, top-k pivot, association
  rules, growth accounting, activity heatmap
- sequence/temporal: Markov transitions & trigrams (+ boundary-stitched
  streaming twins), CUSUM change-point, seasonality, inter-arrival &
  dwell, interval coalesce & overlap-duration, local peaks, lag-1
  autocorrelation, LTTB-style downsampling, new-entity curve
- ER blocking: sorted-neighborhood, phonetic key (dual-dialect rule
  chain), three-blocker union audit, MinHash estimator & LSH banding
  audits, normalized-exact dedup
- graph: Jaccard/RA link prediction, clustering coefficient, k-truss,
  two-hop reach, assortativity, deterministic uniform + node2vec-biased
  walks with skip-gram pair generation
- ML infra: point-in-time features, chronological split + rolling-origin
  folds, OOF target encoding, contrastive pair assembly, Poisson
  bootstrap, negative sampling, class weights, farthest-point seeding
  (+ inertia A/B), scaler params, embedding health audits
- evaluation-as-queries: confusion matrix, P/R/F1 scorecard, calibration
  bins, per-cell chi-square feature screening, label separation

Shared doctrines: no RNG anywhere (md5 rings / hash folds); no float
logs or divisions in gated outputs (hardcoded ppm constants, digit-length
buckets, (num, den) pairs — Spark DIV truncates, DuckDB // floors);
streaming maintainers share their batch twin's oracle constant; audits
measure their own knobs (banding, lookback, seeding) instead of assuming.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table, read_state_parquet
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# agg_gini_concentration — exact integer Gini of per-customer spend
# --------------------------------------------------------------------------
@register(
    "agg_gini_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
      SELECT nation, cents,
             row_number() OVER (PARTITION BY nation
                                ORDER BY cents, cust) AS i
      FROM spend
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents) AS BIGINT)
             AS gini_num,
           CAST(COUNT(*) * SUM(cents) AS BIGINT) AS gini_den,
           CAST(1000000::HUGEINT
                * (2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents))
                // (COUNT(*)::HUGEINT * SUM(cents)) AS BIGINT) AS gini_ppm
    FROM ranked GROUP BY nation
    """,
)
def agg_gini_concentration_q(spark, sf_dir):
    """Exact Gini coefficient of per-customer spend within each nation —
    the source-concentration audit a training-data pipeline runs before
    mixing corpora (Gini 0 = perfectly even contribution, near 1 = a few
    sources dominate).  The float-free identity: with x_(1) <= ... <=
    x_(n), G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) — numerator and
    denominator exact int64 on cent-quantized spend; the ppm ratio
    multiplies by 1e6 first and so runs in 38-digit arithmetic
    (DECIMAL(38,0) / HUGEINT) before casting back.  sum(i*x_i) is invariant to how
    ties are ordered (equal x across a tied rank block contribute the
    same), but the rank itself is still made deterministic via
    (cents, cust).

    100 TB shape: one hash aggregate keyed on (nation, cust) — map-side
    partials do the heavy lifting; the ranking window and the final agg
    both run on the nation partitioning, so Catalyst plans ONE exchange
    after the spend agg; no self-join, no collect."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").cast("long").alias("nation"),
    )
    spend = (
        orders.select(
            "o_custkey", F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
        )
        .join(cust, "o_custkey")
        .groupBy("nation", F.col("o_custkey").alias("cust"))
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = Window.partitionBy("nation").orderBy("cents", "cust")
    ranked = spend.select("nation", "cents", F.row_number().over(w).alias("i"))
    n, s, t = F.count(F.lit(1)), F.sum("cents"), F.sum(F.col("i") * F.col("cents"))
    num = 2 * t - (n + 1) * s
    return ranked.groupBy("nation").agg(
        n.cast("long").alias("n_cust"),
        s.cast("long").alias("total_cents"),
        num.cast("long").alias("gini_num"),
        (n * s).cast("long").alias("gini_den"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(7,0))"
            " * CAST(2*sum(i*cents) - (count(1)+1)*sum(cents) AS DECIMAL(19,0)))"
            " DIV (CAST(count(1) AS DECIMAL(19,0))"
            " * CAST(sum(cents) AS DECIMAL(19,0))) AS BIGINT)"
        ).alias("gini_ppm"),
    )


# --------------------------------------------------------------------------
# agg_hhi_concentration — Herfindahl-Hirschman index, pure hash agg
# --------------------------------------------------------------------------
@register(
    "agg_hhi_concentration",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey AS nation, o.o_custkey AS cust,
             CAST(SUM(CAST(FLOOR(o.o_totalprice) AS BIGINT)) AS BIGINT)
               AS units
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    )
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(units) AS BIGINT) AS total_units,
           CAST(SUM(units * units) AS BIGINT) AS sq_sum,
           CAST(1000000::HUGEINT * SUM(units * units)
                // (SUM(units)::HUGEINT * SUM(units)) AS BIGINT) AS hhi_ppm
    FROM spend GROUP BY nation
    """,
)
def agg_hhi_concentration_q(spark, sf_dir):
    """Herfindahl-Hirschman concentration index per nation: HHI =
    sum(share_i^2) = sum(x_i^2) / (sum x)^2 — the sort-free companion of
    `agg_gini_concentration` (HHI is a pure algebraic aggregate, so unlike
    Gini it needs NO ranking window and is trivially mergeable — the one
    to maintain incrementally or stream).

    Overflow discipline: spend quantizes to WHOLE currency units (not
    cents — Gini's linear terms tolerate cents, squares don't: per-
    customer cents^2 sums past int64 by sf0.1), keeping sq_sum in int64
    with ~1e3 headroom at sf1; the ppm ratio's numerator (1e6 * sq_sum)
    genuinely exceeds int64, so it runs in 38-digit arithmetic on BOTH
    sides — DECIMAL(38,0) in Spark, HUGEINT in DuckDB — and casts back
    to BIGINT (verified identical under ANSI mode).

    100 TB shape: two hash aggregates back to back on narrowing keys
    ((nation, cust) then nation) — fully map-side combinable, no window,
    no sort, one exchange each."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").cast("long").alias("nation"),
    )
    spend = (
        orders.select(
            "o_custkey", F.floor(F.col("o_totalprice")).cast("long").alias("u")
        )
        .join(cust, "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(F.sum("u").cast("long").alias("units"))
    )
    return spend.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("units").cast("long").alias("total_units"),
        F.sum(F.col("units") * F.col("units")).cast("long").alias("sq_sum"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(7,0))"
            " * CAST(sum(units*units) AS DECIMAL(19,0)))"
            " DIV (CAST(sum(units) AS DECIMAL(19,0))"
            " * CAST(sum(units) AS DECIMAL(19,0))) AS BIGINT)"
        ).alias("hhi_ppm"),
    )


# --------------------------------------------------------------------------
# quality_benford — first-significant-digit distribution audit
# --------------------------------------------------------------------------
# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — hardcoded so neither engine
# ever evaluates a float log; the audit compares observed ppm against
# these exact integer constants.
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]
_BENFORD_SQL_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_PPM, start=1)
) + " END"

_BENFORD_ORACLE = f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts)
    SELECT d AS digit, n, n_total,
           CAST(1000000 * n // n_total AS BIGINT) AS observed_ppm,
           CAST({_BENFORD_SQL_CASE} AS BIGINT) AS benford_ppm,
           CAST(1000000 * n // n_total - {_BENFORD_SQL_CASE} AS BIGINT)
             AS dev_ppm
    FROM counts, tot
"""


@register("quality_benford", oracle=_BENFORD_ORACLE)
def quality_benford_q(spark, sf_dir):
    """Benford's-law first-significant-digit audit over order totals —
    the fraud/synthetic-data screen: naturally occurring magnitudes
    follow P(d) = log10(1 + 1/d), and machine-generated or tampered
    numeric columns show up as large dev_ppm on specific digits.  The
    expectations are HARDCODED integer ppm constants (floor(log10(1+1/d)
    * 1e6)) so no engine evaluates a float log, and observed shares are
    truncating-div ppm — everything int64, everything hash-gated.

    100 TB shape: a single hash aggregate over a 9-key space (map-side
    combine collapses each partition to <= 9 rows before the exchange);
    the grand total joins back as a 9-row broadcast.  Counts are
    additive, so the streaming twin `stream_benford_maintain` folds
    per-batch partials into the same result."""
    digits = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("d")
        )
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("n_total"))
    benford = F.create_map(
        *[F.lit(x) for d, p in enumerate(_BENFORD_PPM, start=1) for x in (d, p)]
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        "n",
        "n_total",
        F.expr("CAST(1000000 * n DIV n_total AS BIGINT)").alias("observed_ppm"),
        benford[F.col("d")].cast("long").alias("benford_ppm"),
        (
            F.expr("1000000 * n DIV n_total") - benford[F.col("d")]
        ).cast("long").alias("dev_ppm"),
    )


# --------------------------------------------------------------------------
# join_star_revenue_rollup — TPC-H Q5-shaped snowflake denormalization
# --------------------------------------------------------------------------
# Shared by the batch rollup and the streaming maintainer
# (`stream_star_rollup_maintain`): one oracle constant pins the broadcast
# snowflake plan and the per-batch additive merge chain mutually equal.
_STAR_ORACLE = """
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name
    """


@register("join_star_revenue_rollup", oracle=_STAR_ORACLE)
def join_star_revenue_rollup_q(spark, sf_dir):
    """The canonical star/snowflake rollup (TPC-H Q5 shape): fact
    lineitem through orders and customer up the nation -> region
    dimension chain, discounted revenue per (region, nation) in exact
    integer cents (floor-quantized per line BEFORE summing, so both
    engines sum identical int64 terms — summing doubles first would be
    association-order-dependent).

    100 TB shape: the dims (nation 25 rows, region 5) are explicitly
    `F.broadcast` — zero shuffle for the snowflake arms; the two real
    exchanges are fact->orders on orderkey and ->customer on custkey
    (both uniform TPC-H keys, no skew), then the (region, nation) agg is
    25 groups — map-side combine collapses it before the final exchange.
    This is the plan AQE cannot improve on: broadcast where small,
    shuffle only on the join keys the data requires."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_c"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("rev_c").cast("long").alias("revenue_cents"),
        )
    )


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
# temporal_seasonal_profile — day-of-week seasonality with exact deviation
# --------------------------------------------------------------------------
@register(
    "temporal_seasonal_profile",
    oracle="""
    WITH base AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow,
             CAST(FLOOR(value * 1000) AS BIGINT) AS mv
      FROM events
    ),
    per_dow AS (
      SELECT event_type, CAST(dow AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_dow,
             CAST(SUM(mv) AS BIGINT) AS sum_dow
      FROM base GROUP BY event_type, dow
    ),
    per_type AS (
      SELECT event_type, CAST(SUM(n_dow) AS BIGINT) AS n_total,
             CAST(SUM(sum_dow) AS BIGINT) AS sum_total
      FROM per_dow GROUP BY event_type
    )
    SELECT d.event_type, d.dow, d.n_dow, d.sum_dow, t.n_total, t.sum_total,
           CAST(t.n_total * d.sum_dow - d.n_dow * t.sum_total AS BIGINT)
             AS dev_num
    FROM per_dow d JOIN per_type t USING (event_type)
    """,
)
def temporal_seasonal_profile_q(spark, sf_dir):
    """Day-of-week seasonality profile per event type — the periodic-mean
    decomposition a telemetry pipeline runs before anomaly thresholds
    (weekday traffic shape vs weekend).  Each bucket's deviation from the
    type's overall mean is the CUSUM trick again: mean_dow - mean_total
    has the sign of n_total*sum_dow - n_dow*sum_total, exact in int64 —
    no float means, so direction AND magnitude numerator hash-gate
    (denominator n_dow*n_total is implied by the emitted counts).

    Engine note: Spark's dayofweek() is 1=Sunday..7; DuckDB's is
    0=Sunday..6 — the oracle adds 1 so both emit the same bucket ids.

    100 TB shape: two chained hash aggregates on narrowing keys, both
    fully map-side combinable (at most 7 rows per (type, partition)
    survive the map side); the per-type totals re-join as a
    type-cardinality broadcast."""
    base = _t(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.floor(F.col("value") * 1000).cast("long").alias("mv"),
    )
    per_dow = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_dow"),
        F.sum("mv").cast("long").alias("sum_dow"),
    )
    per_type = per_dow.groupBy("event_type").agg(
        F.sum("n_dow").cast("long").alias("n_total"),
        F.sum("sum_dow").cast("long").alias("sum_total"),
    )
    return per_dow.join(F.broadcast(per_type), "event_type").select(
        "event_type",
        "dow",
        "n_dow",
        "sum_dow",
        "n_total",
        "sum_total",
        (F.col("n_total") * F.col("sum_dow") - F.col("n_dow") * F.col("sum_total"))
        .cast("long")
        .alias("dev_num"),
    )


# --------------------------------------------------------------------------
# text_tfidf_topk — log-free integer TF-IDF term ranking per document
# --------------------------------------------------------------------------
# Shared by the batch ranking and the streaming maintainer
# (`stream_tfidf_maintain`): one oracle constant pins the single-pass
# scoring and the maintained-tf-table serve chain mutually equal.
_TFIDF_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE w <> '' GROUP BY doc_id, w
    ),
    df AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
    ),
    n_docs AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.w, tf.tf, df.df,
             CAST(tf.tf * (1000000 * nd.nd // df.df) AS BIGINT) AS score
      FROM tf JOIN df USING (w) CROSS JOIN n_docs nd
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, w ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, w, tf, df, score, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """


@register("text_tfidf_topk", oracle=_TFIDF_ORACLE)
def text_tfidf_topk_q(spark, sf_dir):
    """Top-5 characteristic terms per document by log-free integer TF-IDF:
    score = tf * (1e6 * N_docs // df) — the truncating-division rarity
    weight (the same log-free substitution `graph_resource_allocation`
    makes for Adamic-Adar), preserving the TF-IDF ordering property that
    matters (rarer terms weigh more, monotone in 1/df) while staying
    int64-exact so the gate hashes scores, not just rankings.  Tie-break
    (score DESC, w ASC) makes the cutoff deterministic.

    100 TB shape: tokenize-explode is the corpus-linear map; tf is a
    (doc, term)-keyed hash agg; df re-aggregates the TF TABLE (never the
    raw token stream — tf is one row per distinct (doc, term), typically
    10x smaller); the rarity weight joins back keyed on term, skew-safe
    because stop-terms have LOW scores (no salting needed — the hot keys
    are the ones the ranking discards); top-5 is a per-doc window on the
    doc partitioning the tf agg already established."""
    tok = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    return _tfidf_rank_from_tf(tf)


def _tfidf_rank_from_tf(tf):
    """Score + top-5 ranking over a (doc_id, w, tf) table — shared by the
    single-pass batch query and the streaming maintainer's serve step (the
    maintained tf table IS the batch tf table, so one ranking body keeps
    the two paths structurally identical)."""
    df = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").cast("long").alias("nd"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "w",
            "tf",
            "df",
            F.expr("CAST(tf * (1000000 * nd DIV df) AS BIGINT)").alias("score"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


# --------------------------------------------------------------------------
# text_zipf_rank — rank-frequency head of the corpus vocabulary
# --------------------------------------------------------------------------
@register(
    "text_zipf_rank",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
      FROM documents
    ),
    freq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM tok WHERE w <> '' GROUP BY w
    ),
    head AS (
      SELECT w, freq FROM freq ORDER BY freq DESC, w ASC LIMIT 100
    )
    SELECT w, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, w ASC) AS BIGINT) AS rnk,
           CAST(freq * row_number() OVER (ORDER BY freq DESC, w ASC) AS BIGINT)
             AS rank_freq
    FROM head
    """,
)
def text_zipf_rank_q(spark, sf_dir):
    """Rank-frequency head of the corpus vocabulary (top 100 terms) with
    the Zipf product rank*freq — near-constant under Zipf's law, so the
    column IS the diagnostic: a corpus whose head product collapses or
    explodes is template-heavy or synthetic (the curve the C4/quality
    papers eyeball before filtering).  (freq DESC, w ASC) totally orders
    the head, so the 100-row cutoff and every rank hash-gate.

    100 TB shape: one vocabulary hash agg (corpus-linear explode, map-side
    combined), then orderBy(...).limit(100) — Spark plans TakeOrderedAndProject
    (per-partition top-100 then a 100-row driver merge), NOT a global
    sort; the rank window runs on the 100-row result, cost-free."""
    tok = _t(spark, sf_dir, "documents").select(
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    head = freq.orderBy(F.desc("freq"), F.asc("w")).limit(100)
    w_rank = Window.orderBy(F.desc("freq"), F.asc("w"))
    return head.select(
        "w",
        "freq",
        F.row_number().over(w_rank).cast("long").alias("rnk"),
        (F.col("freq") * F.row_number().over(w_rank)).cast("long").alias("rank_freq"),
    )


# --------------------------------------------------------------------------
# stream_benford_maintain — streaming maintenance of the digit histogram
# --------------------------------------------------------------------------
@register("stream_benford_maintain", oracle=_BENFORD_ORACLE)
def stream_benford_maintain_q(spark, sf_dir):
    """Streaming maintenance of the Benford first-digit audit: each
    micro-batch of orders contributes per-digit counts and foreachBatch
    folds them into keyed parquet state with a SUM merge — digit counts
    are additive, so the maintained histogram is independent of how the
    file source bundles rows into micro-batches.  Shares
    `quality_benford`'s oracle constant, so stream-maintained == batch
    aggregate == DuckDB, hash-exact (the stream_drift_monitor doctrine
    applied to the quality-audit tier).  State is 9 rows; O(batch) per
    trigger — the cheapest possible continuous fraud monitor."""
    import shutil
    import tempfile

    from ..streaming import read_orders_stream
    from . import finish_and_clean

    stream = read_orders_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_benford_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = (
            batch_df.filter(F.col("o_totalprice") >= 1)
            .select(
                F.substring(
                    F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
                )
                .cast("long")
                .alias("d")
            )
            .groupBy("d")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        state = read_state_parquet(sp, state_path)
        if state is not None:
            merged = (
                state.unionByName(part).groupBy("d").agg(F.sum("n").alias("n"))
            )
        else:  # first batch: the partial IS the state
            merged = part
        staging = root + "/staging"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(state_path)
        shutil.rmtree(staging, ignore_errors=True)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    counts = spark.read.parquet(state_path).select(
        "d", F.col("n").cast("long").alias("n")
    )
    tot = counts.agg(F.sum("n").cast("long").alias("n_total"))
    benford = F.create_map(
        *[F.lit(x) for d, p in enumerate(_BENFORD_PPM, start=1) for x in (d, p)]
    )
    audit = counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        "n",
        "n_total",
        F.expr("CAST(1000000 * n DIV n_total AS BIGINT)").alias("observed_ppm"),
        benford[F.col("d")].cast("long").alias("benford_ppm"),
        (
            F.expr("1000000 * n DIV n_total") - benford[F.col("d")]
        ).cast("long").alias("dev_ppm"),
    )
    return finish_and_clean(audit, root)


# --------------------------------------------------------------------------
# temporal_markov_transitions — event-type transition matrix, exact ppm
# --------------------------------------------------------------------------
@register(
    "temporal_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS to_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type
      FROM events
    ),
    trans AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    row_tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
      FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n, r.n_from,
           CAST(1000000 * t.n // r.n_from AS BIGINT) AS p_ppm
    FROM trans t JOIN row_tot r USING (from_type)
    """,
)
def temporal_markov_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences
    — the behavioral-model / bot-detection primitive (a scripted client's
    transition rows are near-deterministic; an organic user's are
    spread), and the event-sequence sibling of `text_lm_bigram_score`'s
    token bigrams.  Each user's events totally ordered by (ts, event_id);
    transition probabilities emitted as truncating-div ppm of the
    from-state row total — everything int64, everything hash-gated.

    100 TB shape: ONE exchange on user_id serves the lag window (sequences
    never cross users, so no global sort); the transition agg collapses
    to |types|^2 rows map-side; row totals re-join as a types-cardinality
    broadcast.  State-space explosion is the consumer's choice of type
    alphabet, not the operator's."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    )
    trans = (
        seq.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    row_tot = trans.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return trans.join(F.broadcast(row_tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        F.expr("CAST(1000000 * n DIV n_from AS BIGINT)").alias("p_ppm"),
    )


# --------------------------------------------------------------------------
# dedup_sorted_neighborhood — classic ER blocking on the sorted key axis
# --------------------------------------------------------------------------
_SNM_CORPUS_SQL = """
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 10000, text || ' zq' FROM documents WHERE doc_id < 20
"""


@register(
    "dedup_sorted_neighborhood",
    oracle="""
    WITH corpus AS ({corpus}),
    norm AS (
      SELECT doc_id, lower(trim(text)) AS t FROM corpus
    ),
    ranked AS (
      SELECT doc_id, t,
             row_number() OVER (ORDER BY t, doc_id) AS rnk
      FROM norm
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
           CAST(b.rnk - a.rnk AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b
      ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10
    WHERE levenshtein(a.t, b.t) <= 4
    """.format(corpus=_SNM_CORPUS_SQL),
)
def dedup_sorted_neighborhood_q(spark, sf_dir):
    """Sorted-neighborhood entity-resolution blocking (Hernandez & Stolfo,
    SIGMOD 1995) on the same planted-edit corpus as
    `dedup_fuzzy_levenshtein`: sort every record by the normalized
    blocking key, slide a window of width w=10 down the sorted order, and
    exact-refine only in-window pairs (levenshtein <= 4).  Complements
    the prefix-bucket blocker: a prefix edit moves a record OUT of its
    prefix bucket but only a few positions in sort order, so the two
    blockers' misses are disjoint — production ER runs both and unions.
    The ORACLE states the rank theta-join definition; the ENGINE buckets
    rank by w and fans each LEFT row to {b, b+1} (the `join_band_bucketed`
    technique on the rank axis — a successor within w sits in the same or
    next bucket), each pair found exactly once since the right row owns
    one bucket.

    100 TB shape: the global rank is ONE RangePartitioner sort (Spark's
    distributed sort — the single-partition window here is the local[]
    rendering, the `agg_hist_equi_depth` doctrine); after it, candidate
    generation is a keyed equi-join with 2x fanout and per-task work
    bounded by bucket width, never all-pairs."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    edited = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    corpus = base.unionByName(edited).select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("t")
    )
    w = 10
    ranked = corpus.select(
        "doc_id", "t", F.row_number().over(Window.orderBy("t", "doc_id")).alias("rnk")
    )
    left = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("t").alias("ta"),
        F.col("rnk").alias("ra"),
        F.explode(
            F.array((F.col("rnk") / w).cast("long"), (F.col("rnk") / w + 1).cast("long"))
        ).alias("bucket"),
    )
    right = ranked.select(
        F.col("doc_id").alias("id_b"),
        F.col("t").alias("tb"),
        F.col("rnk").alias("rb"),
        (F.col("rnk") / w).cast("long").alias("bucket"),
    )
    return (
        left.join(right, "bucket")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + w))
        .filter(F.levenshtein("ta", "tb") <= 4)
        .select(
            "id_a",
            "id_b",
            (F.col("rb") - F.col("ra")).cast("long").alias("rank_gap"),
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
    )


# --------------------------------------------------------------------------
# text_vocab_growth — Heaps-law type/token + hapax profile per source
# --------------------------------------------------------------------------
@register(
    "text_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
      FROM documents
    ),
    freq AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
      FROM tok WHERE w <> '' GROUP BY source, w
    )
    SELECT source,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(1000000 * COUNT(*) // SUM(f) AS BIGINT) AS type_token_ppm,
           CAST(1000000 * SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS hapax_ppm
    FROM freq GROUP BY source
    """,
)
def text_vocab_growth_q(spark, sf_dir):
    """Vocabulary-richness profile per corpus source: type/token ratio
    (Heaps'-law operating point) and hapax-legomena share — the
    template-detection audit that complements `text_zipf_rank`'s head
    view with the TAIL view (a boilerplate-heavy source has few types
    per token and almost no hapax; an OCR-noise source has hapax_ppm
    near 1e6).  Ratios are truncating-div ppm on exact counts.

    100 TB shape: corpus-linear tokenize-explode into a (source, term)
    hash agg (map-side combined), then a source-keyed re-aggregation of
    the vocabulary-sized frequency table — the same never-reaggregate-
    the-token-stream discipline as `text_tfidf_topk`'s df."""
    tok = _t(spark, sf_dir, "documents").select(
        "source",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    freq = tok.groupBy("source", "w").agg(F.count(F.lit(1)).cast("long").alias("f"))
    return freq.groupBy("source").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("f") == 1).cast("long")).cast("long").alias("hapax"),
        F.expr("CAST(1000000 * count(1) DIV sum(f) AS BIGINT)").alias(
            "type_token_ppm"
        ),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)"
            " DIV count(1) AS BIGINT)"
        ).alias("hapax_ppm"),
    )


# --------------------------------------------------------------------------
# stream_star_rollup_maintain — incremental warehouse-rollup maintenance
# --------------------------------------------------------------------------
@register("stream_star_rollup_maintain", oracle=_STAR_ORACLE)
def stream_star_rollup_maintain_q(spark, sf_dir):
    """Streaming maintenance of the star-schema revenue rollup: each
    micro-batch of lineitem facts joins the STATIC dimension chain
    (orders -> customer -> broadcast nation/region — the stream-static
    join Structured Streaming plans per batch) and its per-(region,
    nation) partials fold into keyed parquet state with a SUM merge.
    COUNT and SUM are additive, so the maintained rollup is independent
    of fact-batch bundling — proven by sharing
    `join_star_revenue_rollup`'s oracle constant (stream-maintained ==
    batch snowflake == DuckDB, hash-exact).

    100 TB shape: per trigger the work is O(batch ⨝ dims) and the state
    is rollup-cardinality (25 rows here) — the incremental-view-
    maintenance posture (`agg_incremental_maintain` doctrine) applied to
    the warehouse fact table; the full fact corpus is never rescanned."""
    import shutil
    import tempfile

    from ..streaming import read_lineitem_stream
    from . import finish_and_clean

    stream = read_lineitem_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_star_")
    state_path = root + "/state"
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = (
            batch_df.select(
                "l_orderkey",
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
                .alias("rev_c"),
            )
            .join(orders, F.col("l_orderkey") == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_items"),
                F.sum("rev_c").cast("long").alias("revenue_cents"),
            )
        )
        state = read_state_parquet(sp, state_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("region", "nation")
                .agg(
                    F.sum("n_items").alias("n_items"),
                    F.sum("revenue_cents").alias("revenue_cents"),
                )
            )
        else:  # first batch: the partial IS the state
            merged = part
        staging = root + "/staging"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(state_path)
        shutil.rmtree(staging, ignore_errors=True)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    state = spark.read.parquet(state_path).select(
        "region",
        "nation",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
    )
    return finish_and_clean(state, root)


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
# quality_completeness_profile — one-pass column census
# --------------------------------------------------------------------------
@register(
    "quality_completeness_profile",
    oracle="""
    SELECT 'event_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'ts', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT ts) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT event_type) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'value', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT value) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'props', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT props) AS BIGINT)
    FROM events
    """,
)
def quality_completeness_profile_q(spark, sf_dir):
    """One-pass column-completeness census over the events table — row
    count, null count, and exact distinct count for EVERY column, the
    table-level profile that feeds schema-drift alerts and expectation
    suites (`quality_expectations` checks stated rules; this discovers
    the stats the rules come from).

    Engine shape: ONE aggregate computes all 18 measures in a single scan
    (count + per-column null-sum + per-column count(distinct) — Spark
    plans multi-distinct via a single expand), then the 1-row result
    UNPIVOTS via stack() into the (col_name, ...) census — the profile
    never shuffles row-level data, only the 1-row aggregate.  The oracle
    states the per-column definition as 6 scalar scans.

    100 TB shape: the null/row counts are pure map-side; exact multi-
    column distinct is the expensive facet (expand multiplies rows by the
    distinct-column count) — the production tier swaps in
    approx_count_distinct per column (`agg_approx_distinct` twin doctrine)
    and keeps this exact path for the audit tier."""
    ev = _t(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"null_{c}")
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"dist_{c}"))
    one = ev.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', null_{c}, dist_{c}" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (col_name, n_null, n_distinct)",
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct")


# --------------------------------------------------------------------------
# agg_pareto_coverage — cumulative source-coverage (80/20) curve
# --------------------------------------------------------------------------
@register(
    "agg_pareto_coverage",
    oracle="""
    WITH per_source AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS total FROM per_source),
    ranked AS (
      SELECT source, chars,
             row_number() OVER (ORDER BY chars DESC, source ASC) AS rnk,
             SUM(chars) OVER (ORDER BY chars DESC, source ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_chars
      FROM per_source
    )
    SELECT source, CAST(rnk AS BIGINT) AS rnk, chars,
           CAST(cum_chars AS BIGINT) AS cum_chars,
           CAST(1000000 * cum_chars // total AS BIGINT) AS cum_ppm,
           cum_chars * 5 >= total * 4 AS covers80
    FROM ranked, tot
    """,
)
def agg_pareto_coverage_q(spark, sf_dir):
    """Cumulative source-coverage curve (the 80/20 audit): sources ranked
    by contributed characters, with exact running share — the first rank
    where covers80 flips TRUE is "how many sources make up 80% of the
    corpus", the single number a data-mixing decision needs next to
    `agg_gini_concentration`'s scalar.  The 80% test is the cross-
    multiplied integer predicate cum*5 >= total*4 — no division at all;
    cum_ppm is the plot-ready truncating share.

    100 TB shape: one source-keyed hash agg (corpus-linear, map-side
    combined) collapses to source cardinality; the ranked cumsum window
    runs on THAT frame — thousands of rows, one partition is correct, not
    a compromise; the grand total attaches as a 1-row broadcast."""
    per_source = _t(spark, sf_dir, "documents").groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars")
    )
    tot = per_source.agg(F.sum("chars").cast("long").alias("total"))
    w = Window.orderBy(F.desc("chars"), F.asc("source"))
    ranked = per_source.select(
        "source",
        "chars",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.sum("chars")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_chars"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "source",
        "rnk",
        "chars",
        "cum_chars",
        F.expr("CAST(1000000 * cum_chars DIV total AS BIGINT)").alias("cum_ppm"),
        (F.col("cum_chars") * 5 >= F.col("total") * 4).alias("covers80"),
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
# agg_funnel_time_to_convert — conversion-latency histogram
# --------------------------------------------------------------------------
@register(
    "agg_funnel_time_to_convert",
    oracle="""
    WITH first_view AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT v.user_id,
             MIN(CAST(FLOOR(epoch(e.ts)) AS BIGINT)
                 - CAST(FLOOR(epoch(v.t_view)) AS BIGINT)) AS delta_s
      FROM first_view v JOIN events e
        ON e.user_id = v.user_id
       AND e.event_type = 'purchase' AND e.ts >= v.t_view
      GROUP BY v.user_id
    )
    SELECT CAST(delta_s // 3600 AS BIGINT) AS hour_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(delta_s) AS BIGINT) AS min_delta_s,
           CAST(MAX(delta_s) AS BIGINT) AS max_delta_s
    FROM conv GROUP BY hour_bucket
    """,
)
def agg_funnel_time_to_convert_q(spark, sf_dir):
    """Conversion-latency histogram: for each user, seconds from their
    FIRST view to the EARLIEST purchase at-or-after it, bucketed by hour —
    the time-to-convert distribution that prices attribution lookbacks
    (`agg_attribution_linear`'s 2 h window is a parameter; this measures
    what it should be).  `agg_funnel_steps` counts who converts; this
    measures how fast.  All epoch math in int64 seconds.

    100 TB shape: two user-keyed hash aggregates and one user-keyed join
    — first-view is map-side combinable MIN, the purchase probe re-uses
    the same user partitioning, and the histogram collapses to bucket
    cardinality map-side.  No window, no sort."""
    ev = _t(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_timestamp("ts").cast("long")
                - F.unix_timestamp("t_view").cast("long")
            ).alias("delta_s")
        )
    )
    return conv.groupBy(
        F.expr("CAST(delta_s DIV 3600 AS BIGINT)").alias("hour_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("delta_s").cast("long").alias("min_delta_s"),
        F.max("delta_s").cast("long").alias("max_delta_s"),
    )


# --------------------------------------------------------------------------
# dedup_minhash_estimate_audit — estimator quality of the MinHash signature
# --------------------------------------------------------------------------
_MINHASH_AUDIT_CORPUS = """
    SELECT doc_id, text FROM documents WHERE doc_id < 60
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 10
"""


@register(
    "dedup_minhash_estimate_audit",
    oracle="""
    WITH corpus AS ({corpus}),
    sh AS (
      SELECT DISTINCT doc_id AS id, substring(substring(text, 1, 60), i, 5) AS shingle
      FROM corpus, generate_series(1, 56) t(i)
      WHERE i <= greatest(length(substring(text, 1, 60)) - 4, 0)
    ),
    hs AS (
      SELECT id,
             ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(shingle), 9, 8))::BIGINT AS h2
      FROM sh
    ),
    sigs AS (
      SELECT id,
        MIN(h1 + 0 * h2) AS sig_0, MIN(h1 + 1 * h2) AS sig_1,
        MIN(h1 + 2 * h2) AS sig_2, MIN(h1 + 3 * h2) AS sig_3,
        MIN(h1 + 4 * h2) AS sig_4, MIN(h1 + 5 * h2) AS sig_5
      FROM hs GROUP BY id
    ),
    bands AS (
      SELECT id, md5('0' || '|' || CAST(sig_0 AS VARCHAR) || '|' || CAST(sig_1 AS VARCHAR)) AS band_key FROM sigs
      UNION ALL SELECT id, md5('1' || '|' || CAST(sig_2 AS VARCHAR) || '|' || CAST(sig_3 AS VARCHAR)) FROM sigs
      UNION ALL SELECT id, md5('2' || '|' || CAST(sig_4 AS VARCHAR) || '|' || CAST(sig_5 AS VARCHAR)) FROM sigs
    ),
    pairs AS (
      SELECT DISTINCT x.id AS a, y.id AS b
      FROM bands x JOIN bands y ON x.band_key = y.band_key AND x.id < y.id
    ),
    est AS (
      SELECT p.a, p.b,
        CAST((CASE WHEN sa.sig_0 = sb.sig_0 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_1 = sb.sig_1 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_2 = sb.sig_2 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_3 = sb.sig_3 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_4 = sb.sig_4 THEN 1 ELSE 0 END)
           + (CASE WHEN sa.sig_5 = sb.sig_5 THEN 1 ELSE 0 END) AS BIGINT)
          AS matches
      FROM pairs p JOIN sigs sa ON sa.id = p.a JOIN sigs sb ON sb.id = p.b
    ),
    sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT p.a, p.b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM pairs p
      JOIN sh x ON x.id = p.a
      JOIN sh y ON y.id = p.b AND y.shingle = x.shingle
      GROUP BY p.a, p.b
    )
    SELECT e.a, e.b, e.matches,
           CAST(1000000 * e.matches // 6 AS BIGINT) AS est_ppm,
           i.n_inter,
           CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union,
           CAST(1000000 * i.n_inter // (sa.n + sb.n - i.n_inter) AS BIGINT)
             AS jac_ppm,
           CAST(1000000 * e.matches // 6
                - 1000000 * i.n_inter // (sa.n + sb.n - i.n_inter) AS BIGINT)
             AS err_ppm
    FROM est e
    JOIN inter i ON i.a = e.a AND i.b = e.b
    JOIN sizes sa ON sa.id = e.a
    JOIN sizes sb ON sb.id = e.b
    """.format(corpus=_MINHASH_AUDIT_CORPUS),
)
def dedup_minhash_estimate_audit_q(spark, sf_dir):
    """Estimator-quality audit for the MinHash pipeline — for every LSH
    candidate pair, the signature-agreement estimate (matches/6 as ppm)
    NEXT TO the exact shingle Jaccard it estimates, plus the signed error
    — the recall-audit doctrine (`similarity_*_recall`) applied to the
    dedup rung: "6 hashes, 3 bands" stops being a config and becomes
    measured evidence (planted exact dups show matches=6, err 0; chance
    collisions show their true overlap).  Every term integer: match
    counts, shingle-set sizes, truncating ppm.

    100 TB shape: candidates come from the band join (never all-pairs —
    the audit only prices pairs the production pipeline would surface);
    the exact-Jaccard refinement is a shingle equi-join on candidate ids,
    the `dedup_containment` shape; signatures join back keyed on id."""
    from ..operators.dedup import minhash_band_keys, minhash_signatures, shingles

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 60).unionByName(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    sh = shingles(corpus, "text", "doc_id", width=5, prefix_len=60, distinct=True)
    sh = sh.localCheckpoint(eager=True)  # feeds sigs, sizes, and the exact join
    sigs = minhash_signatures(sh, n_hashes=6)
    bands = minhash_band_keys(sigs, n_hashes=6, n_bands=3)
    pairs = (
        bands.alias("x")
        .join(bands.alias("y"), on="band_key")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("a"), *[F.col(f"sig_{k}").alias(f"a{k}") for k in range(6)])
    sb = sigs.select(F.col("id").alias("b"), *[F.col(f"sig_{k}").alias(f"b{k}") for k in range(6)])
    matches = sum(
        (F.col(f"a{k}") == F.col(f"b{k}")).cast("long") for k in range(6)
    )
    est = pairs.join(sa, "a").join(sb, "b").select(
        "a", "b", matches.cast("long").alias("matches")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    return (
        est.join(inter, ["a", "b"])
        .join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            "matches",
            F.expr("CAST(1000000 * matches DIV 6 AS BIGINT)").alias("est_ppm"),
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter"))
            .cast("long")
            .alias("n_union"),
            F.expr(
                "CAST(1000000 * n_inter DIV (na + nb - n_inter) AS BIGINT)"
            ).alias("jac_ppm"),
            F.expr(
                "CAST(1000000 * matches DIV 6"
                " - 1000000 * n_inter DIV (na + nb - n_inter) AS BIGINT)"
            ).alias("err_ppm"),
        )
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
# stream_markov_maintain — boundary-stitched streaming transition counts
# --------------------------------------------------------------------------
@register(
    "stream_markov_maintain",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS to_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_type
      FROM events
    ),
    trans AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    row_tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
      FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n, r.n_from,
           CAST(1000000 * t.n // r.n_from AS BIGINT) AS p_ppm
    FROM trans t JOIN row_tot r USING (from_type)
    """,
)
def stream_markov_maintain_q(spark, sf_dir):
    """Streaming maintenance of the Markov transition matrix with BOUNDARY
    STITCHING: per-batch lag() only sees transitions INSIDE the batch, so
    the maintainer also keeps each user's LAST event as state and stitches
    the (stored last -> first-of-batch) transition per user — without it,
    every batch boundary silently drops one transition per active user
    and the stream never equals the batch matrix.  Transition counts then
    fold additively into keyed state (the drift/benford merge).  Shares
    `temporal_markov_transitions`'s oracle constant: stream-maintained ==
    batch lag == DuckDB, hash-exact.

    CONTRACT: batches must arrive per-user event-time ordered (file
    sources partitioned by time — the production log-shipping shape); a
    user's out-of-order late event would need the full-resequence repair
    path, not this O(batch) maintainer.  The multi-batch stitch identity
    is pinned by a 3-file planted test (tests/test_frontier3.py).

    100 TB shape: per trigger — one user-keyed window over the BATCH, a
    keyed join against user-cardinality last-event state, and a
    |types|^2-cardinality count merge; the event corpus is never
    rescanned."""
    from ..streaming import read_events_stream

    return markov_maintain_run(spark, read_events_stream(spark, sf_dir))


def markov_maintain_run(spark, stream):
    """Run the boundary-stitched Markov maintainer over ``stream`` and
    return the finalized transition matrix.  Factored out so tests can
    drive it one-file-per-batch (maxFilesPerTrigger=1 over planted
    time-split files) to pin the stitch identity across real batch
    boundaries — the sf gate's single parquet file yields one batch."""
    import shutil
    import tempfile

    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_markov_")
    counts_path = root + "/counts"
    last_path = root + "/last"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        b = batch_df.select("user_id", "ts", "event_id", "event_type")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = b.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
            F.row_number().over(w).alias("rn"),
        )
        internal = seq.filter(F.col("from_type").isNotNull()).select(
            "from_type", "to_type"
        )
        firsts = seq.filter(F.col("rn") == 1).select(
            "user_id", F.col("to_type").alias("first_type")
        )
        last = read_state_parquet(sp, last_path)
        if last is not None:
            boundary = last.join(firsts, "user_id").select(
                F.col("event_type").alias("from_type"),
                F.col("first_type").alias("to_type"),
            )
            trans = internal.unionByName(boundary)
            merged_last_src = last.unionByName(
                b.select("user_id", "ts", "event_id", "event_type")
            )
        else:  # first batch: no stored last events yet
            trans = internal
            merged_last_src = b.select("user_id", "ts", "event_id", "event_type")
        part = trans.groupBy("from_type", "to_type").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        counts = read_state_parquet(sp, counts_path)
        if counts is not None:
            merged_counts = (
                counts.unionByName(part)
                .groupBy("from_type", "to_type")
                .agg(F.sum("n").alias("n"))
            )
        else:  # first batch
            merged_counts = part
        w_last = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        merged_last = (
            merged_last_src.withColumn("rn", F.row_number().over(w_last))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        for frame, path in ((merged_counts, counts_path), (merged_last, last_path)):
            staging = path + "_staging"
            frame.write.mode("overwrite").parquet(staging)
            sp.read.parquet(staging).write.mode("overwrite").parquet(path)
            shutil.rmtree(staging, ignore_errors=True)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    trans = spark.read.parquet(counts_path).select(
        "from_type", "to_type", F.col("n").cast("long").alias("n")
    )
    row_tot = trans.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    out = trans.join(F.broadcast(row_tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        F.expr("CAST(1000000 * n DIV n_from AS BIGINT)").alias("p_ppm"),
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# stream_tfidf_maintain — continuous maintenance of the tf table + serve
# --------------------------------------------------------------------------
@register("stream_tfidf_maintain", oracle=_TFIDF_ORACLE)
def stream_tfidf_maintain_q(spark, sf_dir):
    """Streaming maintenance of the TF-IDF index: each micro-batch of
    documents tokenizes and folds its (doc, term, tf) partials into keyed
    parquet state with a SUM merge — documents are atomic rows, so term
    counts are additive and the maintained tf table is independent of
    batch bundling (and idempotent-safe under a re-delivered SPLIT of a
    doc's tokens, the at-least-once posture).  df and N_docs are DERIVED
    from the maintained table at serve time, never maintained separately
    — one source of truth, no drift between the counts.  Serve routes
    through the same `_tfidf_rank_from_tf` body as the batch query and
    shares its oracle constant: stream-maintained == single-pass ==
    DuckDB, hash-exact.

    100 TB shape: per trigger, tokenize + tf-agg of the BATCH only, then
    a keyed merge against term-table state; the serve-time ranking is the
    batch query's own cost.  The corpus text is never rescanned for
    indexing — the `stream_index_maintain` doctrine applied to the
    scoring tier."""
    import shutil
    import tempfile

    from ..streaming import read_documents_stream
    from . import finish_and_clean

    stream = read_documents_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_tfidf_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = (
            batch_df.select(
                "doc_id",
                F.explode(
                    F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
                ).alias("w"),
            )
            .filter(F.col("w") != "")
            .groupBy("doc_id", "w")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
        state = read_state_parquet(sp, state_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("doc_id", "w")
                .agg(F.sum("tf").alias("tf"))
            )
        else:  # first batch: the partial IS the state
            merged = part
        staging = root + "/staging"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(state_path)
        shutil.rmtree(staging, ignore_errors=True)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    tf = spark.read.parquet(state_path).select(
        "doc_id", "w", F.col("tf").cast("long").alias("tf")
    )
    return finish_and_clean(_tfidf_rank_from_tf(tf), root)


# --------------------------------------------------------------------------
# sample_negatives_hash — deterministic contrastive negative sampling
# --------------------------------------------------------------------------
@register(
    "sample_negatives_hash",
    oracle="""
    WITH n_docs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
    ),
    anchors AS (SELECT doc_id FROM documents),
    raw AS (
      SELECT a.doc_id AS anchor, k.k,
             ('0x' || substring(md5(CAST(a.doc_id AS VARCHAR) || '|'
                                    || CAST(k.k AS VARCHAR)), 1, 8))::BIGINT
               % nd.n AS pick,
             nd.n AS n
      FROM anchors a CROSS JOIN n_docs nd, generate_series(0, 3) k(k)
    )
    SELECT CAST(anchor AS BIGINT) AS anchor, CAST(k AS BIGINT) AS k,
           CAST(CASE WHEN pick = anchor THEN (pick + 1) % n
                     ELSE pick END AS BIGINT) AS neg_id
    FROM raw
    """,
)
def sample_negatives_hash_q(spark, sf_dir):
    """Deterministic contrastive negative sampling: each document draws
    K=4 pseudo-random negatives as md5(anchor|k) mod N over the DENSE
    doc_id space, with a +1 shift when the draw hits the anchor itself —
    the training-pair miner behind contrastive/embedding objectives,
    made a pure function of (anchor, k, N) so shards regenerate
    identically under retries and the pairing is exactly oracle-checkable
    (the `sample_split_hash` no-RNG doctrine applied to pair mining).

    Density contract: doc_id must be the dense [0, N) key (true of the
    synthetic corpus; production runs `zipWithIndex`-style dense ranking
    first or the modulus picks non-existent ids).

    100 TB shape: corpus-linear generate (a 4-way explode per anchor), no
    join at all — the negative is an ID, not a row lookup; downstream
    joins it against the (bucketed) corpus when materializing pair text.
    The count is ONE broadcast row."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    raw = (
        docs.crossJoin(F.broadcast(nd))
        .select(
            F.col("doc_id").alias("anchor"),
            "n",
            F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k"),
        )
        .select(
            "anchor",
            F.col("k").cast("long").alias("k"),
            "n",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("anchor"), F.col("k"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("pick"),
        )
    )
    return raw.select(
        "anchor",
        "k",
        F.when(F.col("pick") == F.col("anchor"), (F.col("pick") + 1) % F.col("n"))
        .otherwise(F.col("pick"))
        .cast("long")
        .alias("neg_id"),
    )


# --------------------------------------------------------------------------
# temporal_interarrival_profile — inter-event gap histogram, digit-bucketed
# --------------------------------------------------------------------------
@register(
    "temporal_interarrival_profile",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - lag(CAST(FLOOR(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(length(CAST(gap_s AS VARCHAR)) AS BIGINT) AS digits,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
           CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s
    FROM seq WHERE gap_s IS NOT NULL
    GROUP BY event_type, digits
    """,
)
def temporal_interarrival_profile_q(spark, sf_dir):
    """Inter-arrival-time histogram per event type, bucketed by DECIMAL
    DIGIT COUNT of the gap in seconds (1 = under 10 s, 2 = 10-99 s, ...)
    — the traffic-shape profile behind rate-limit tuning and bot screens
    (scripted clients pile into one narrow bucket; organic traffic
    spreads).  floor(log10(gap)) + 1 == string length of the integer in
    BOTH engines — the order-of-magnitude bucket without ever calling a
    float log (the Benford-constants trick turned structural).

    100 TB shape: ONE user-keyed exchange serves the lag window; the
    (type, digits) histogram collapses map-side to dozens of rows.  The
    gap is attributed to the ARRIVING event's type — stated so the
    definition is unambiguous at the oracle level."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts").cast("long")
    seq = _t(spark, sf_dir, "events").select(
        "event_type", (sec - F.lag(sec).over(w)).alias("gap_s")
    )
    return (
        seq.filter(F.col("gap_s").isNotNull())
        .groupBy(
            "event_type",
            F.length(F.col("gap_s").cast("string")).cast("long").alias("digits"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
            F.sum("gap_s").cast("long").alias("sum_gap_s"),
        )
    )


# --------------------------------------------------------------------------
# agg_rfm_scores — recency/frequency/monetary segmentation
# --------------------------------------------------------------------------
@register(
    "agg_rfm_scores",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(date_diff('day', MAX(o_orderdate),
                            (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT cust, recency_days, freq, monetary_cents,
        CAST(6 - ntile(5) OVER (ORDER BY recency_days ASC, cust ASC) AS BIGINT)
          AS r_score,
        CAST(ntile(5) OVER (ORDER BY freq ASC, cust ASC) AS BIGINT) AS f_score,
        CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, cust ASC) AS BIGINT)
          AS m_score
      FROM per_cust
    )
    SELECT CAST(cust AS BIGINT) AS cust, recency_days, freq, monetary_cents,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment
    FROM scored
    """,
)
def agg_rfm_scores_q(spark, sf_dir):
    """RFM customer segmentation — the classic warehouse scoring: per
    customer, days since last order (recency), order count (frequency),
    lifetime cent-quantized spend (monetary), each quintile-scored 1-5
    (5 = best: most recent / most frequent / highest spend) and composed
    into the 111-555 segment code.  ntile agrees across engines only
    under a total order — ties broken by customer key, the
    `agg_hist_equi_depth` doctrine — so the segment assignment itself
    hash-gates, not just the raw measures.

    Spark's datediff(end, start) is DuckDB's date_diff('day', start, end)
    — argument order REVERSED between engines; the oracle states it the
    DuckDB way so both compute max_date - cust_date.

    100 TB shape: one customer-keyed hash agg; the three quintile windows
    run on the customer-cardinality aggregate (dimension-table scale —
    the production build range-partitions the sort; local[] renders it
    single-partition); the corpus-wide max date is a 1-row broadcast."""
    orders = _t(spark, sf_dir, "orders")
    max_date = orders.agg(F.max("o_orderdate").alias("max_d"))
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(max_date))
        .select(
            "cust",
            F.datediff("max_d", "last_d").cast("long").alias("recency_days"),
            "freq",
            "monetary_cents",
        )
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("cust"))
    w_f = Window.orderBy(F.asc("freq"), F.asc("cust"))
    w_m = Window.orderBy(F.asc("monetary_cents"), F.asc("cust"))
    scored = per_cust.select(
        "cust",
        "recency_days",
        "freq",
        "monetary_cents",
        (F.lit(6) - F.ntile(5).over(w_r)).cast("long").alias("r_score"),
        F.ntile(5).over(w_f).cast("long").alias("f_score"),
        F.ntile(5).over(w_m).cast("long").alias("m_score"),
    )
    return scored.select(
        "*",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long")
        .alias("segment"),
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
# temporal_event_trigrams — behavioral motif mining over event sequences
# --------------------------------------------------------------------------
@register(
    "temporal_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t3,
             lag(event_type, 1) OVER w AS t2,
             lag(event_type, 2) OVER w AS t1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
      SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE t1 IS NOT NULL
      GROUP BY t1, t2, t3
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM tri)
    SELECT t1, t2, t3, n, n_total,
           CAST(1000000 * n // n_total AS BIGINT) AS share_ppm
    FROM tri, tot
    """,
)
def temporal_event_trigrams_q(spark, sf_dir):
    """Consecutive event-type trigram census per user sequence — the
    behavioral-motif miner one order up from `temporal_markov_transitions`
    (bigrams say WHAT follows what; trigrams expose scripted loops like
    view->click->view repeating verbatim).  Two stacked lag() calls over
    ONE window definition, so Catalyst evaluates both in a single Window
    operator on a single user-key exchange; motif shares are truncating
    ppm of the trigram total.

    100 TB shape: one exchange + a |types|^3-bounded hash agg (map-side
    collapsed); the total re-attaches as a 1-row broadcast.  Alphabet
    explosion is the consumer's modeling choice, not the operator's."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t3"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
    )
    tri = (
        seq.filter(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = tri.agg(F.sum("n").cast("long").alias("n_total"))
    return tri.crossJoin(F.broadcast(tot)).select(
        "t1",
        "t2",
        "t3",
        "n",
        "n_total",
        F.expr("CAST(1000000 * n DIV n_total AS BIGINT)").alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# agg_cohort_ltv — cumulative lifetime-value curve per signup cohort
# --------------------------------------------------------------------------
@register(
    "agg_cohort_ltv",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey AS cust,
             CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    spend AS (
      SELECT f.cohort,
             CAST(date_diff('month', f.cohort,
                            CAST(date_trunc('month', o.o_orderdate) AS DATE))
                  AS BIGINT) AS age_months,
             CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN first_order f ON f.cust = o.o_custkey
    ),
    monthly AS (
      SELECT cohort, age_months,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM spend GROUP BY cohort, age_months
    )
    SELECT strftime(cohort, '%Y-%m') AS cohort_month, age_months, n_orders,
           rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY age_months
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_rev_cents
    FROM monthly
    """,
)
def agg_cohort_ltv_q(spark, sf_dir):
    """Cumulative lifetime-value curve per signup cohort: customers
    cohorted by their FIRST order month, revenue rolled up by months-
    since-signup with a running cumulative — the money dimension
    `agg_retention_cohort` (who comes back) lacks: how much each cohort
    has earned by age k.  Month arithmetic via date_trunc + month-diff,
    identical in both engines; the cohort label is emitted as a formatted
    STRING (no raw date columns in gate outputs — the catalog dtype
    rule).

    100 TB shape: one customer-keyed MIN agg (the cohort map), one
    customer-keyed join to tag each order, a (cohort, age) hash agg, then
    the running sum windows over the cohort-cardinality rollup — the
    window input is months x cohorts, never order rows."""
    orders = _t(spark, sf_dir, "orders")
    first_order = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort")
    )
    spend = orders.join(
        first_order, orders.o_custkey == first_order.cust
    ).select(
        "cohort",
        (
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")).cast("date"),
                F.col("cohort"),
            )
        )
        .cast("long")
        .alias("age_months"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    monthly = spend.groupBy("cohort", "age_months").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("rev_cents"),
    )
    w = Window.partitionBy("cohort").orderBy("age_months").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.select(
        F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
        "age_months",
        "n_orders",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
    )


# --------------------------------------------------------------------------
# stream_interarrival_maintain — boundary-stitched gap histogram
# --------------------------------------------------------------------------
@register(
    "stream_interarrival_maintain",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - lag(CAST(FLOOR(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(length(CAST(gap_s AS VARCHAR)) AS BIGINT) AS digits,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
           CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s
    FROM seq WHERE gap_s IS NOT NULL
    GROUP BY event_type, digits
    """,
)
def stream_interarrival_maintain_q(spark, sf_dir):
    """Streaming maintenance of the inter-arrival histogram with the SAME
    boundary stitch as `stream_markov_maintain`: per-batch lag() misses
    the gap spanning each batch boundary, so each user's last timestamp
    rides in keyed state and the (stored-last -> first-of-batch) gap is
    stitched in; bucket counters (n / min / max / sum per (type, digits))
    then fold with their natural merges (SUM, MIN, MAX, SUM).  Shares
    `temporal_interarrival_profile`'s oracle constant: stream == batch
    lag == DuckDB, hash-exact — proving the stitch pattern generalizes
    from transition LABELS to transition MEASURES.

    Same ordered-ingestion contract as the Markov maintainer; state is
    user-cardinality (last event) + histogram-cardinality (buckets);
    O(batch) per trigger."""
    import shutil
    import tempfile

    from ..streaming import read_events_stream
    from . import finish_and_clean

    stream = read_events_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_gaps_")
    hist_path = root + "/hist"
    last_path = root + "/last"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        sec = F.unix_timestamp("ts").cast("long")
        b = batch_df.select("user_id", "ts", "event_id", "event_type", sec.alias("s"))
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = b.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "s",
            (F.col("s") - F.lag("s").over(w)).alias("gap_s"),
            F.row_number().over(w).alias("rn"),
        )
        gaps = seq.filter(F.col("gap_s").isNotNull()).select("event_type", "gap_s")
        firsts = seq.filter(F.col("rn") == 1).select(
            "user_id",
            F.col("event_type").alias("first_type"),
            F.col("s").alias("first_s"),
        )
        last = read_state_parquet(sp, last_path)
        if last is not None:
            boundary = last.join(firsts, "user_id").select(
                F.col("first_type").alias("event_type"),
                (F.col("first_s") - F.col("s")).alias("gap_s"),
            )
            gaps = gaps.unionByName(boundary)
            merged_last_src = last.unionByName(
                b.select("user_id", "ts", "event_id", "event_type", "s")
            )
        else:  # first batch: no stored last events yet
            merged_last_src = b.select("user_id", "ts", "event_id", "event_type", "s")
        part = gaps.groupBy(
            "event_type",
            F.length(F.col("gap_s").cast("string")).cast("long").alias("digits"),
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
            F.sum("gap_s").cast("long").alias("sum_gap_s"),
        )
        hist = read_state_parquet(sp, hist_path)
        if hist is not None:
            merged_hist = (
                hist.unionByName(part)
                .groupBy("event_type", "digits")
                .agg(
                    F.sum("n").alias("n"),
                    F.min("min_gap_s").alias("min_gap_s"),
                    F.max("max_gap_s").alias("max_gap_s"),
                    F.sum("sum_gap_s").alias("sum_gap_s"),
                )
            )
        else:  # first batch
            merged_hist = part
        w_last = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        merged_last = (
            merged_last_src.withColumn("rn", F.row_number().over(w_last))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        for frame, path in ((merged_hist, hist_path), (merged_last, last_path)):
            staging = path + "_staging"
            frame.write.mode("overwrite").parquet(staging)
            sp.read.parquet(staging).write.mode("overwrite").parquet(path)
            shutil.rmtree(staging, ignore_errors=True)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    out = spark.read.parquet(hist_path).select(
        "event_type",
        "digits",
        F.col("n").cast("long").alias("n"),
        F.col("min_gap_s").cast("long").alias("min_gap_s"),
        F.col("max_gap_s").cast("long").alias("max_gap_s"),
        F.col("sum_gap_s").cast("long").alias("sum_gap_s"),
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# temporal_interval_coalesce — merge overlapping spans (interval algebra)
# --------------------------------------------------------------------------
@register(
    "temporal_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + 60 + (event_id % 10) * 60 AS e,
             event_id
      FROM events WHERE user_id < 60
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (PARTITION BY user_id
                    ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS is_new
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM marked
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(island AS BIGINT) AS island,
           CAST(MIN(s) AS BIGINT) AS span_start_s,
           CAST(MAX(e) AS BIGINT) AS span_end_s,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, island
    """,
)
def temporal_interval_coalesce_q(spark, sf_dir):
    """Interval coalescing (union of overlapping spans) per user — the
    interval-ALGEBRA complement of `join_interval_overlap`'s pairing: each
    event carries a deterministic duration (60 + (event_id%10)*60 s) and
    overlapping/touching spans merge into maximal islands, the
    availability-window / on-call-coverage / contiguous-lease primitive.
    Island detection is the running-max trick: a span opens a NEW island
    iff its start exceeds the max end of ALL earlier spans (sorted by
    start) — one cumulative-max window + one cumulative-sum window, both
    on the same (user, start) order, no self-join; null-safe because the
    first row's empty preceding frame yields NULL max (CASE -> 0, island
    numbering starts at 0).

    100 TB shape: ONE user-key exchange serves both windows (same
    partitioning + order, Catalyst folds them into one Window operator);
    the final island rollup is a hash agg on the partitioning already in
    place.  The known alternative (self-join on overlap) is quadratic per
    user — never planned here."""
    sec = F.unix_timestamp("ts").cast("long")
    iv = _t(spark, sf_dir, "events").filter(F.col("user_id") < 60).select(
        "user_id",
        sec.alias("s"),
        (sec + 60 + (F.col("event_id") % 10) * 60).alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(w_prev), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.select(
        "user_id", "s", "e", F.sum("is_new").over(w_cum).alias("island")
    )
    return islands.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("island").cast("long").alias("island"),
    ).agg(
        F.min("s").alias("span_start_s"),
        F.max("e").alias("span_end_s"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# --------------------------------------------------------------------------
# dedup_phonetic_blocking — the third classic ER blocker
# --------------------------------------------------------------------------
# One phonetic-key rule chain rendered to both dialects (the stemmer's
# dual-dialect doctrine): NOT Oracle soundex — a documented simplified key
# (consonant classes, vowel/hw removal, repeat collapse, 3-digit pad) that
# both engines compute identically.
_PHONETIC_CLASSES = [
    ("[bfpv]", "1"),
    ("[cgjkqsxz]", "2"),
    ("[dt]", "3"),
    ("[l]", "4"),
    ("[mn]", "5"),
    ("[r]", "6"),
]


def _phonetic_sql_duck(expr: str) -> str:
    digits = expr
    for pat, rep in _PHONETIC_CLASSES:
        digits = f"regexp_replace({digits}, '{pat}', '{rep}', 'g')"
    digits = f"regexp_replace({digits}, '[aeiouyhw]', '', 'g')"
    # DuckDB's RE2 has NO pattern backreferences — '(.)\\1+' silently
    # matches nothing — so repeats collapse via six literal-digit rules
    # (the post-vowel-removal alphabet is exactly 1-6).
    for d in "123456":
        digits = f"regexp_replace({digits}, '{d}{d}+', '{d}', 'g')"
    return f"substr({expr}, 1, 1) || rpad(substr({digits}, 2, 3), 3, '0')"


@register(
    "dedup_phonetic_blocking",
    oracle="""
    WITH corpus AS ({corpus}),
    norm AS (
      SELECT doc_id, lower(trim(text)) AS t,
             regexp_extract(lower(text), '[a-z]+', 0) AS tok
      FROM corpus
    ),
    keyed AS (
      SELECT doc_id, t, {key} AS pkey FROM norm WHERE tok <> ''
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
           a.pkey,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM keyed a JOIN keyed b ON a.pkey = b.pkey AND a.doc_id < b.doc_id
    WHERE levenshtein(a.t, b.t) <= 4
    """.format(corpus=_SNM_CORPUS_SQL, key=_phonetic_sql_duck("tok")),
)
def dedup_phonetic_blocking_q(spark, sf_dir):
    """Phonetic-key ER blocking — the THIRD classic blocker beside the
    prefix bucket (`dedup_fuzzy_levenshtein`) and the sorted window
    (`dedup_sorted_neighborhood`): records block on a simplified phonetic
    key of their first token (consonant classes -> vowel/h/w removal ->
    repeat collapse -> first-letter + 3 digits), so spelling variants
    that CHANGE early characters but keep the sound ('smith'/'smyth')
    land in one block where both lexical blockers miss.  The key is one
    rule chain rendered to BOTH dialects (the `text_search_stemmed`
    dual-dialect doctrine) — deliberately a documented simplified key,
    not engine-native soundex (DuckDB has none, and Spark's soundex would
    be a one-engine black box the oracle could not replay).

    100 TB shape: key assignment is a pure codegen projection; the block
    join keys on the 4-char key (block sizes are the skew risk — the
    production run caps blocks like the LSH stop-template cap); exact
    levenshtein refine only within blocks."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    edited = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    corpus = base.unionByName(edited).select(
        "doc_id",
        F.lower(F.trim(F.col("text"))).alias("t"),
        F.regexp_extract(F.lower("text"), "[a-z]+", 0).alias("tok"),
    ).filter(F.col("tok") != "")
    digits = F.col("tok")
    for pat, rep in _PHONETIC_CLASSES:
        digits = F.regexp_replace(digits, pat, rep)
    digits = F.regexp_replace(digits, "[aeiouyhw]", "")
    # same six literal collapse rules as the oracle (RE2 backref limit)
    for d in "123456":
        digits = F.regexp_replace(digits, d + d + "+", d)
    keyed = corpus.select(
        "doc_id",
        "t",
        F.concat(
            F.substring("tok", 1, 1),
            F.rpad(F.substring(digits, 2, 3), 3, "0"),
        ).alias("pkey"),
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"), F.col("t").alias("ta"), "pkey"
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"), F.col("t").alias("tb"), "pkey"
    )
    return (
        a.join(b, "pkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.levenshtein("ta", "tb") <= 4)
        .select(
            "id_a",
            "id_b",
            "pkey",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
    )


# --------------------------------------------------------------------------
# agg_session_bounce — single-event-session (bounce) rate
# --------------------------------------------------------------------------
@register(
    "agg_session_bounce",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - lag(CAST(FLOOR(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM seq
    ),
    per_session AS (
      SELECT user_id, sid,
             MIN(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, sid
                                     ORDER BY ts, event_id) AS rn
        FROM sess
      ) GROUP BY user_id, sid
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce,
           CAST(1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS bounce_ppm
    FROM per_session GROUP BY entry_type
    """,
)
def agg_session_bounce_q(spark, sf_dir):
    """Bounce-rate analytics: sessionize per user with the standard
    30-minute inactivity gap, then the share of single-event sessions
    grouped by the session's ENTRY event type — the landing-page-quality
    metric, and the aggregate consumer of `window_sessionize`'s
    gaps-and-islands assignment (sessionization logic restated here so
    the oracle is self-contained).  Entry attribution via the
    deterministic (ts, event_id) first row.

    100 TB shape: one user-key exchange serves the gap-lag, the session
    cumsum, AND the intra-session row_number (same partitioning); the
    per-session rollup keys on (user, sid) — a subset of rows already
    co-located — and the final census is entry-type cardinality."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts").cast("long")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (sec - F.lag(sec).over(w) > 1800) | F.lag("ts").over(w).isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    sess = seq.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    w_in = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    per_session = (
        sess.withColumn("rn", F.row_number().over(w_in))
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("event_type"))).alias("entry_type"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    return per_session.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).cast("long").alias("n_bounce"),
        F.expr(
            "CAST(1000000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
            " DIV count(1) AS BIGINT)"
        ).alias("bounce_ppm"),
    )


# --------------------------------------------------------------------------
# agg_pivot_topk_other — dynamic pivot on the top-k categories + 'other'
# --------------------------------------------------------------------------
@register(
    "agg_pivot_topk_other",
    oracle="""
    WITH counts AS (
      SELECT o_orderpriority AS cat, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority
    ),
    topk AS (
      SELECT cat, row_number() OVER (ORDER BY n DESC, cat ASC) AS rnk
      FROM counts
    ),
    tagged AS (
      SELECT o.o_orderstatus AS status,
             CASE WHEN t.rnk <= 3 THEN o.o_orderpriority ELSE 'other' END
               AS bucket,
             CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN topk t ON t.cat = o.o_orderpriority
    )
    SELECT status, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM tagged GROUP BY status, bucket
    """,
)
def agg_pivot_topk_other_q(spark, sf_dir):
    """Dynamic top-k pivot: the category axis is not a fixed list but the
    TOP-3 categories by frequency, with everything else folded into
    'other' — the dashboard/reporting shape that keeps wide pivots bounded
    when the category domain is open-ended (the production answer to
    `agg_pivot_wide`'s explicit-list contract).  Emitted LONG (status,
    bucket) rather than wide columns so the schema is stable regardless
    of which categories win; the top-k choice is deterministic via
    (count DESC, category ASC).

    100 TB shape: phase 1 is a category-cardinality census (map-side
    collapsed) whose top-3 broadcasts back as the bucket map; phase 2 is
    one hash agg over (status, bucket) — the category join is
    broadcast-size by construction, and the open-ended domain can never
    widen the output schema (the failure mode of dynamic wide pivots)."""
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    topk = counts.select(
        "cat", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("cat"))).alias("rnk")
    )
    tagged = orders.join(
        F.broadcast(topk), orders.o_orderpriority == topk.cat
    ).select(
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("rnk") <= 3, F.col("o_orderpriority"))
        .otherwise(F.lit("other"))
        .alias("bucket"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return tagged.groupBy("status", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("rev_cents"),
    )


# --------------------------------------------------------------------------
# sample_bootstrap_poisson — deterministic Poisson bootstrap replicates
# --------------------------------------------------------------------------
# Poisson(1) CDF in ppm, hardcoded (the Benford-constants doctrine): a
# uniform md5 draw u maps to multiplicity m = #{c in CDF : u >= c}.
_POIS1_CDF_PPM = [367879, 735758, 919698, 981011, 996340, 999405]


@register(
    "sample_bootstrap_poisson",
    oracle="""
    WITH draws AS (
      SELECT r.rep, o.o_orderkey,
             CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents,
             ('0x' || substring(md5(CAST(o.o_orderkey AS VARCHAR) || '|'
                                    || CAST(r.rep AS VARCHAR)), 1, 8))::BIGINT
               % 1000000 AS u
      FROM orders o, generate_series(0, 7) r(rep)
    ),
    mult AS (
      SELECT rep, o_orderkey, cents,
             CAST({mult_expr} AS BIGINT) AS m
      FROM draws
    )
    SELECT CAST(rep AS BIGINT) AS rep,
           CAST(SUM(m) AS BIGINT) AS n_resampled,
           CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(m * cents) AS BIGINT) AS sum_cents
    FROM mult GROUP BY rep
    """.format(
        mult_expr=" + ".join(
            f"(CASE WHEN u >= {c} THEN 1 ELSE 0 END)" for c in _POIS1_CDF_PPM
        )
    ),
)
def sample_bootstrap_poisson_q(spark, sf_dir):
    """Deterministic Poisson bootstrap: 8 resample replicates of the
    orders table where each row's multiplicity in replicate r is
    Poisson(1)-distributed via a HASH draw — u = md5(key|rep) mod 1e6
    compared against the hardcoded Poisson(1) CDF ppm constants (the
    Benford-constants doctrine), m = number of CDF thresholds below u
    (truncated at 6, CDF 0.999405 — the tail the constants can't see).
    This is the bagging/CI machinery (bootstrap a statistic without
    shuffling or RNG state): a pure function of (key, rep), so replicas
    regenerate identically under retries and the whole resample is
    oracle-exact — `sample_split_hash`'s no-RNG doctrine extended from
    membership to MULTIPLICITY.

    100 TB shape: corpus-linear with an 8x replicate explode folded
    straight into a map-side-combinable per-rep aggregate — multiplicity
    WEIGHTS the aggregate (sum m*x) instead of materializing m copies,
    so the resample itself never exists as rows."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    draws = orders.select(
        "o_orderkey",
        "cents",
        F.explode(F.array(*[F.lit(r) for r in range(8)])).alias("rep"),
    ).select(
        "rep",
        "cents",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("o_orderkey"), F.col("rep"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        ).alias("u"),
    )
    m = sum(
        (F.col("u") >= F.lit(c)).cast("long") for c in _POIS1_CDF_PPM
    )
    mult = draws.select("rep", "cents", m.alias("m"))
    return mult.groupBy(F.col("rep").cast("long").alias("rep")).agg(
        F.sum("m").cast("long").alias("n_resampled"),
        F.sum((F.col("m") == 0).cast("long")).cast("long").alias("n_dropped"),
        F.sum(F.col("m") * F.col("cents")).cast("long").alias("sum_cents"),
    )


# --------------------------------------------------------------------------
# quality_ab_chi2_parts — deterministic A/B assignment with exact test parts
# --------------------------------------------------------------------------
@register(
    "quality_ab_chi2_parts",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)
                        || '|ab1'), 1, 8))::BIGINT % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN arm = 'A' AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a_conv,
             CAST(SUM(CASE WHEN arm = 'A' AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_no,
             CAST(SUM(CASE WHEN arm = 'B' AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_conv,
             CAST(SUM(CASE WHEN arm = 'B' AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_no
      FROM assigned
    )
    SELECT a_conv, a_no, b_conv, b_no,
           CAST(1000000 * a_conv // (a_conv + a_no) AS BIGINT) AS rate_a_ppm,
           CAST(1000000 * b_conv // (b_conv + b_no) AS BIGINT) AS rate_b_ppm,
           CAST((a_conv + a_no + b_conv + b_no)
                * (a_conv * b_no - a_no * b_conv)
                * (a_conv * b_no - a_no * b_conv) AS BIGINT) AS chi2_num,
           CAST((a_conv + a_no) * (b_conv + b_no)
                * (a_conv + b_conv) * (a_no + b_no) AS BIGINT) AS chi2_den
    FROM cells
    """,
)
def quality_ab_chi2_parts_q(spark, sf_dir):
    """Deterministic A/B experiment readout: users hash-assigned to arms
    (md5(user|salt) % 2 — the `sample_split_hash` assignment, so the same
    user lands in the same arm on every run and in every engine),
    converted = ever purchased, and the 2x2 chi-square statistic emitted
    as the EXACT integer pair chi2 = N*(ad-bc)^2 / (r1*r2*c1*c2) — the
    float-free experiment gate (compare chi2_num against 3.841*chi2_den
    for alpha=0.05, a consumer-side integer comparison).

    Overflow envelope: user counts at sf0.01 are ~2e3 per cell; num <=
    N*(ad)^2 ~ 4e3*(1e6)^2 = 4e15, den <= (2e3)^4/16 ~ 1e12 — both well
    inside int64; at larger N the parts downscale to per-mille counts
    before the product (documented, not silently truncated).

    100 TB shape: one user-keyed agg (assignment is a pure projection,
    conversion a MAX fold), then a single 4-counter global fold — the
    cheapest possible experiment pipeline, no join at all."""
    assigned = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("converted")
    ).select(
        F.when(
            F.conv(
                F.substring(F.md5(F.concat_ws("|", F.col("user_id"), F.lit("ab1"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        "converted",
    )
    cells = assigned.agg(
        F.sum(((F.col("arm") == "A") & (F.col("converted") == 1)).cast("long"))
        .cast("long")
        .alias("a_conv"),
        F.sum(((F.col("arm") == "A") & (F.col("converted") == 0)).cast("long"))
        .cast("long")
        .alias("a_no"),
        F.sum(((F.col("arm") == "B") & (F.col("converted") == 1)).cast("long"))
        .cast("long")
        .alias("b_conv"),
        F.sum(((F.col("arm") == "B") & (F.col("converted") == 0)).cast("long"))
        .cast("long")
        .alias("b_no"),
    )
    ad_bc = F.col("a_conv") * F.col("b_no") - F.col("a_no") * F.col("b_conv")
    n = F.col("a_conv") + F.col("a_no") + F.col("b_conv") + F.col("b_no")
    return cells.select(
        "a_conv",
        "a_no",
        "b_conv",
        "b_no",
        F.expr("CAST(1000000 * a_conv DIV (a_conv + a_no) AS BIGINT)").alias(
            "rate_a_ppm"
        ),
        F.expr("CAST(1000000 * b_conv DIV (b_conv + b_no) AS BIGINT)").alias(
            "rate_b_ppm"
        ),
        (n * ad_bc * ad_bc).cast("long").alias("chi2_num"),
        (
            (F.col("a_conv") + F.col("a_no"))
            * (F.col("b_conv") + F.col("b_no"))
            * (F.col("a_conv") + F.col("b_conv"))
            * (F.col("a_no") + F.col("b_no"))
        )
        .cast("long")
        .alias("chi2_den"),
    )


# --------------------------------------------------------------------------
# temporal_downsample_ltb — triangle-area time-series downsampling
# --------------------------------------------------------------------------
@register(
    "temporal_downsample_ltb",
    oracle="""
    WITH base AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS x,
             CAST(FLOOR(value * 1000) AS BIGINT) AS y,
             event_id,
             ntile(10) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS bucket
      FROM events WHERE user_id < 40
    ),
    bstats AS (
      SELECT user_id, bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM base GROUP BY user_id, bucket
    ),
    anchored AS (
      SELECT b.user_id, b.bucket, b.x, b.y, b.event_id,
             p.n AS pn, p.sx AS psx, p.sy AS psy,
             nx.n AS nn, nx.sx AS nsx, nx.sy AS nsy
      FROM base b
      JOIN bstats p  ON p.user_id = b.user_id AND p.bucket = b.bucket - 1
      JOIN bstats nx ON nx.user_id = b.user_id AND nx.bucket = b.bucket + 1
    ),
    tri AS (
      SELECT user_id, bucket, x, y, event_id,
             abs( (psx * nn - nsx * pn) * (pn * nn * y - psy * nn)
                - (pn * nn * x - psx * nn) * (psy * nn - nsy * pn) ) AS area2
      FROM anchored
    ),
    picked AS (
      SELECT user_id, bucket, x, y, event_id, area2,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY area2 DESC, event_id ASC) AS rnk
      FROM tri
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(area2 AS BIGINT) AS area2
    FROM picked WHERE rnk = 1
    """,
)
def temporal_downsample_ltb_q(spark, sf_dir):
    """Triangle-area time-series downsampling (the parallelizable
    bucket-mean variant of LTTB, Steinarsson 2013): each series splits
    into 10 equal-count buckets and each INTERIOR bucket keeps the point
    forming the largest triangle with its neighbor buckets' mean points —
    the visual-fidelity downsampler dashboards run before plotting 1e9
    points.  Classic LTTB anchors on the previously SELECTED point
    (sequential per series); anchoring on the previous bucket's MEAN
    removes that chain, making the whole operator window/join-expressible
    AND exactly oracle-checkable.  Mean points stay exact by clearing
    denominators: the triangle area with anchors (psx/pn, psy/pn) and
    (nsx/nn, nsy/nn) scales by pn*nn into the all-integer
    area2 = |(psx*nn - nsx*pn)*(pn*nn*y - psy*nn)
             - (pn*nn*x - psx*nn)*(psy*nn - nsy*pn)| — no division, no
    floats, deterministic argmax via (area2 DESC, event_id ASC).

    100 TB shape: ntile per series is the per-entity sort (user-keyed
    exchange); bucket stats are a tiny agg; the two anchor joins key on
    (user, bucket±1) — same partitioning; per-bucket argmax is one window
    on data already grouped.  Edge buckets (no neighbor) drop — the
    consumer pins series endpoints separately, stated contract."""
    base = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40).select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("x"),
        F.floor(F.col("value") * 1000).cast("long").alias("y"),
        "event_id",
        F.ntile(10)
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("bucket"),
    )
    bstats = base.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    p = bstats.select(
        "user_id",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("n").alias("pn"),
        F.col("sx").alias("psx"),
        F.col("sy").alias("psy"),
    )
    nx = bstats.select(
        "user_id",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("n").alias("nn"),
        F.col("sx").alias("nsx"),
        F.col("sy").alias("nsy"),
    )
    anchored = base.join(p, ["user_id", "bucket"]).join(nx, ["user_id", "bucket"])
    area2 = F.abs(
        (F.col("psx") * F.col("nn") - F.col("nsx") * F.col("pn"))
        * (F.col("pn") * F.col("nn") * F.col("y") - F.col("psy") * F.col("nn"))
        - (F.col("pn") * F.col("nn") * F.col("x") - F.col("psx") * F.col("nn"))
        * (F.col("psy") * F.col("nn") - F.col("nsy") * F.col("pn"))
    )
    tri = anchored.select(
        "user_id", "bucket", "x", "y", "event_id", area2.alias("area2")
    )
    w_pick = Window.partitionBy("user_id", "bucket").orderBy(
        F.desc("area2"), F.asc("event_id")
    )
    return (
        tri.withColumn("rnk", F.row_number().over(w_pick))
        .filter(F.col("rnk") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("bucket").cast("long").alias("bucket"),
            "x",
            "y",
            F.col("event_id").cast("long").alias("event_id"),
            F.col("area2").cast("long").alias("area2"),
        )
    )


# --------------------------------------------------------------------------
# quality_sequence_gaps — monotonic-id continuity audit
# --------------------------------------------------------------------------
@register(
    "quality_sequence_gaps",
    oracle="""
    WITH seq AS (
      SELECT event_id,
             lag(event_id) OVER (ORDER BY event_id) AS prev_id
      FROM (SELECT DISTINCT event_id FROM events WHERE event_id % 7 <> 3)
    )
    SELECT CAST(prev_id + 1 AS BIGINT) AS gap_start,
           CAST(event_id - 1 AS BIGINT) AS gap_end,
           CAST(event_id - prev_id - 1 AS BIGINT) AS n_missing
    FROM seq WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    """,
)
def quality_sequence_gaps_q(spark, sf_dir):
    """Monotonic-sequence continuity audit: given an id column that SHOULD
    be gapless (log offsets, CDC sequence numbers, auto-increments), emit
    every missing run as (gap_start, gap_end, n_missing) — the ingestion
    audit that catches dropped batches before they become silent data
    loss.  Planted holes (every id ≡ 3 mod 7 withheld) make the gate
    output non-trivial.  One lag over the distinct-id order: a gap exists
    iff consecutive retained ids differ by more than 1.

    100 TB shape: the distinct + global-order lag is a RangePartitioner
    sort over the ID COLUMN ONLY (the narrowest possible projection; the
    equi-depth doctrine on the single-partition local[] rendering);
    emitted rows are gap-cardinality — the audit's honest output."""
    ids = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 != 3)
        .select("event_id")
        .distinct()
    )
    w = Window.orderBy("event_id")
    seq = ids.select(
        "event_id", F.lag("event_id").over(w).alias("prev_id")
    )
    return seq.filter(
        F.col("prev_id").isNotNull() & (F.col("event_id") - F.col("prev_id") > 1)
    ).select(
        (F.col("prev_id") + 1).cast("long").alias("gap_start"),
        (F.col("event_id") - 1).cast("long").alias("gap_end"),
        (F.col("event_id") - F.col("prev_id") - 1).cast("long").alias("n_missing"),
    )


# --------------------------------------------------------------------------
# dedup_lsh_banding_audit — the S-curve, measured
# --------------------------------------------------------------------------
_LSH_AUDIT_CORPUS = """
    SELECT doc_id, text FROM documents WHERE doc_id < 70
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 10
"""

# (label, n_bands, rows_per_band) over the shared 6-hash signature
_LSH_CONFIGS = [("b1r6", 1, 6), ("b2r3", 2, 3), ("b3r2", 3, 2), ("b6r1", 6, 1)]


def _lsh_audit_oracle() -> str:
    head = """
    WITH corpus AS ({corpus}),
    sh AS (
      SELECT DISTINCT doc_id AS id, substring(substring(text, 1, 60), i, 5) AS shingle
      FROM corpus, generate_series(1, 56) t(i)
      WHERE i <= greatest(length(substring(text, 1, 60)) - 4, 0)
    ),
    hs AS (
      SELECT id,
             ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h1,
             ('0x' || substring(md5(shingle), 9, 8))::BIGINT AS h2
      FROM sh
    ),
    sigs AS (
      SELECT id,
        MIN(h1 + 0 * h2) AS sig_0, MIN(h1 + 1 * h2) AS sig_1,
        MIN(h1 + 2 * h2) AS sig_2, MIN(h1 + 3 * h2) AS sig_3,
        MIN(h1 + 4 * h2) AS sig_4, MIN(h1 + 5 * h2) AS sig_5
      FROM hs GROUP BY id
    ),
    sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT x.id AS a, y.id AS b, CAST(COUNT(*) AS BIGINT) AS ni
      FROM sh x JOIN sh y ON y.shingle = x.shingle AND x.id < y.id
      GROUP BY x.id, y.id
    ),
    truth AS (
      SELECT i.a, i.b FROM inter i
      JOIN sizes sa ON sa.id = i.a JOIN sizes sb ON sb.id = i.b
      WHERE 2 * i.ni >= sa.n + sb.n - i.ni
    ),
    n_truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM truth)""".format(
        corpus=_LSH_AUDIT_CORPUS
    )
    parts, selects = [head], []
    for label, b, r in _LSH_CONFIGS:
        band_rows = []
        for bi in range(b):
            members = " || '|' || ".join(
                f"CAST(sig_{bi * r + k} AS VARCHAR)" for k in range(r)
            )
            band_rows.append(
                f"SELECT id, md5('{bi}' || '|' || {members}) AS band_key FROM sigs"
            )
        parts.append(
            f""",
    bands_{label} AS ({' UNION ALL '.join(band_rows)}),
    cand_{label} AS (
      SELECT DISTINCT x.id AS a, y.id AS b
      FROM bands_{label} x JOIN bands_{label} y
        ON x.band_key = y.band_key AND x.id < y.id
    ),
    m_{label} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
             CAST(SUM(CASE WHEN t.a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
      FROM cand_{label} c
      LEFT JOIN truth t ON t.a = c.a AND t.b = c.b
    )"""
        )
        selects.append(
            f"""
    SELECT '{label}' AS config, n_cand, n_hits, nt AS n_truth,
           CAST(CASE WHEN n_cand > 0 THEN 1000000 * n_hits // n_cand
                     ELSE 0 END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN nt > 0 THEN 1000000 * n_hits // nt
                     ELSE 0 END AS BIGINT) AS recall_ppm
    FROM m_{label}, n_truth"""
        )
    return "".join(parts) + " UNION ALL ".join(selects)


@register("dedup_lsh_banding_audit", oracle=_lsh_audit_oracle())
def dedup_lsh_banding_audit_q(spark, sf_dir):
    """LSH banding-sensitivity audit: the SAME 6-hash MinHash signature
    sliced four ways — (1 band x 6 rows) ... (6 bands x 1 row) — with
    measured candidate count, precision, and recall against exact
    ground truth (shingle Jaccard >= 1/2, the 2*inter >= union integer
    test) on a bounded audit sample.  This is the S-curve as evidence:
    more bands / shorter bands -> recall rises, precision falls; the
    production (3x2) choice stops being folklore (the
    `dedup_minhash_estimate_audit` doctrine applied to the BANDING knob
    rather than the estimator).

    100 TB shape: the ground truth is all-pairs BY DESIGN, on an
    audit-tier sample (80 docs here; production audits a fixed-size
    hash-sampled subset) — candidates themselves always come from band
    joins; signatures are computed ONCE and every config re-slices the
    same 6 columns (zero extra digest work)."""
    from ..operators.dedup import minhash_band_keys, minhash_signatures, shingles

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 70).unionByName(
        docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    sh = shingles(corpus, "text", "doc_id", width=5, prefix_len=60, distinct=True)
    sh = sh.localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, n_hashes=6).localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        sh.select(F.col("id").alias("a"), "shingle")
        .join(sh.select(F.col("id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("ni"))
    )
    truth = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .filter(2 * F.col("ni") >= F.col("na") + F.col("nb") - F.col("ni"))
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    outs = []
    for label, b, r in _LSH_CONFIGS:
        bands = minhash_band_keys(sigs, n_hashes=b * r, n_bands=b)
        cand = (
            bands.alias("x")
            .join(bands.alias("y"), "band_key")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct()
        )
        m = cand.join(truth.withColumn("hit", F.lit(1)), ["a", "b"], "left").agg(
            F.count(F.lit(1)).cast("long").alias("n_cand"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        outs.append(
            m.crossJoin(F.broadcast(n_truth)).select(
                F.lit(label).alias("config"),
                "n_cand",
                "n_hits",
                F.col("nt").alias("n_truth"),
                F.expr(
                    "CAST(CASE WHEN n_cand > 0 THEN 1000000 * n_hits DIV n_cand"
                    " ELSE 0 END AS BIGINT)"
                ).alias("precision_ppm"),
                F.expr(
                    "CAST(CASE WHEN nt > 0 THEN 1000000 * n_hits DIV nt"
                    " ELSE 0 END AS BIGINT)"
                ).alias("recall_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --------------------------------------------------------------------------
# quality_langid_confusion — classifier-vs-truth confusion matrix
# --------------------------------------------------------------------------
from ._text_contracts import LANGID_PRED_SQL as _LANGID_PRED_SQL  # noqa: E402


@register(
    "quality_langid_confusion",
    oracle="""
    WITH pred AS (
      SELECT lang AS true_lang, {pred} AS predicted_lang
      FROM documents
    ),
    cells AS (
      SELECT true_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY true_lang, predicted_lang
    ),
    row_tot AS (
      SELECT true_lang, CAST(SUM(n) AS BIGINT) AS n_true
      FROM cells GROUP BY true_lang
    )
    SELECT c.true_lang, c.predicted_lang, c.n, r.n_true,
           CAST(1000000 * c.n // r.n_true AS BIGINT) AS row_ppm
    FROM cells c JOIN row_tot r USING (true_lang)
    """.format(pred=_LANGID_PRED_SQL),
)
def quality_langid_confusion_q(spark, sf_dir):
    """Confusion matrix of the stopword-ratio language detector
    (`text_lang_id`) against the corpus's ground-truth lang column — the
    model-evaluation primitive every heuristic filter in a training
    pipeline needs AS A QUERY: per (true, predicted) cell counts plus the
    row-normalized share (recall diagonal) in exact ppm.  Evaluating a
    classifier is itself a groupBy — keeping it in the engine means the
    eval re-runs free with every corpus version instead of living in a
    notebook.

    100 TB shape: the predictor is a pure codegen projection riding the
    corpus scan; the matrix is a |langs|x|preds| hash agg, map-side
    collapsed; row totals re-join as a broadcast."""
    from ..operators.text_analysis import lang_id

    pred = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("true_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )
    cells = pred.groupBy("true_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    row_tot = cells.groupBy("true_lang").agg(
        F.sum("n").cast("long").alias("n_true")
    )
    return cells.join(F.broadcast(row_tot), "true_lang").select(
        "true_lang",
        "predicted_lang",
        "n",
        "n_true",
        F.expr("CAST(1000000 * n DIV n_true AS BIGINT)").alias("row_ppm"),
    )


# --------------------------------------------------------------------------
# eval_binary_detector_metrics — tp/fp/fn/tn + exact ppm P/R/F1
# --------------------------------------------------------------------------
@register(
    "eval_binary_detector_metrics",
    oracle="""
    WITH pred AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
             CASE WHEN {pred} = 'en' THEN 1 ELSE 0 END AS said_en
      FROM documents
    ),
    cells AS (
      SELECT CAST(SUM(is_en * said_en) AS BIGINT) AS tp,
             CAST(SUM((1 - is_en) * said_en) AS BIGINT) AS fp,
             CAST(SUM(is_en * (1 - said_en)) AS BIGINT) AS fn,
             CAST(SUM((1 - is_en) * (1 - said_en)) AS BIGINT) AS tn
      FROM pred
    )
    SELECT tp, fp, fn, tn,
           CAST(1000000 * tp // (tp + fp) AS BIGINT) AS precision_ppm,
           CAST(1000000 * tp // (tp + fn) AS BIGINT) AS recall_ppm,
           CAST(2000000 * tp // (2 * tp + fp + fn) AS BIGINT) AS f1_ppm,
           CAST(1000000 * (tp + tn) // (tp + fp + fn + tn) AS BIGINT)
             AS accuracy_ppm
    FROM cells
    """.format(pred=_LANGID_PRED_SQL),
)
def eval_binary_detector_metrics_q(spark, sf_dir):
    """Binary-detector scorecard for the English detector: exact integer
    confusion counts and truncating-ppm precision / recall / F1 /
    accuracy — F1 via the division-free identity 2tp/(2tp+fp+fn), so
    every metric is one integer ratio, no float harmonic mean.  The
    companion of `quality_langid_confusion`'s full matrix: the matrix
    diagnoses WHICH languages leak, this one-row scorecard is the number
    a filter-threshold decision gates on (and the shape every other
    heuristic screen — pii, quality, repetition — evaluates with by
    swapping the predictor column).

    100 TB shape: a single global fold of four products of 0/1 columns —
    pure map-side, one 4-counter exchange, no join."""
    from ..operators.text_analysis import lang_id

    pred = _t(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").cast("long").alias("is_en"),
        (lang_id(F.col("text")) == "en").cast("long").alias("said_en"),
    )
    cells = pred.agg(
        F.sum(F.col("is_en") * F.col("said_en")).cast("long").alias("tp"),
        F.sum((1 - F.col("is_en")) * F.col("said_en")).cast("long").alias("fp"),
        F.sum(F.col("is_en") * (1 - F.col("said_en"))).cast("long").alias("fn"),
        F.sum((1 - F.col("is_en")) * (1 - F.col("said_en"))).cast("long").alias("tn"),
    )
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(1000000 * tp DIV (tp + fp) AS BIGINT)").alias("precision_ppm"),
        F.expr("CAST(1000000 * tp DIV (tp + fn) AS BIGINT)").alias("recall_ppm"),
        F.expr("CAST(2000000 * tp DIV (2 * tp + fp + fn) AS BIGINT)").alias("f1_ppm"),
        F.expr(
            "CAST(1000000 * (tp + tn) DIV (tp + fp + fn + tn) AS BIGINT)"
        ).alias("accuracy_ppm"),
    )


# --------------------------------------------------------------------------
# temporal_wow_growth — week-over-week growth on the weekly rollup
# --------------------------------------------------------------------------
@register(
    "temporal_wow_growth",
    oracle="""
    WITH weekly AS (
      SELECT CAST((CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 604800)
                  AS BIGINT) AS week,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY week
    )
    SELECT week, n_orders, rev_cents,
           CAST(lag(rev_cents) OVER (ORDER BY week) AS BIGINT) AS prev_cents,
           CAST(rev_cents - lag(rev_cents) OVER (ORDER BY week) AS BIGINT)
             AS delta_cents
    FROM weekly
    """,
)
def temporal_wow_growth_q(spark, sf_dir):
    """Week-over-week growth ledger: the weekly revenue rollup with each
    week's previous value and exact delta alongside — the BI staple whose
    growth RATE is the consumer's division (delta/prev as a plotted
    float), while the engine emits only the exact integer pair (the
    assortativity no-division doctrine: Spark DIV truncates toward zero,
    DuckDB // floors, and deltas go negative).  Epoch-week bucketing
    (epoch // 604800) rather than calendar weeks keeps the bucket
    function engine-identical (ISO week-of-year rules differ subtly).

    100 TB shape: one map-side-collapsed weekly agg; the lag window runs
    on the week-cardinality rollup — dozens of rows, single-partition
    correct."""
    weekly = _t(spark, sf_dir, "orders").groupBy(
        (F.unix_timestamp("o_orderdate").cast("long") / 604800)
        .cast("long")
        .alias("week")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
    )
    w = Window.orderBy("week")
    return weekly.select(
        "week",
        "n_orders",
        "rev_cents",
        F.lag("rev_cents").over(w).cast("long").alias("prev_cents"),
        (F.col("rev_cents") - F.lag("rev_cents").over(w))
        .cast("long")
        .alias("delta_cents"),
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
# quality_duplication_scorecard — corpus dup-rate summary
# --------------------------------------------------------------------------
@register(
    "quality_duplication_scorecard",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 40
    ),
    groups AS (
      SELECT sha256(text) AS h, CAST(COUNT(*) AS BIGINT) AS n
      FROM corpus GROUP BY sha256(text)
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(n - 1) AS BIGINT) AS n_redundant,
           CAST(MAX(n) AS BIGINT) AS max_copies,
           CAST(1000000 * SUM(n - 1) // SUM(n) AS BIGINT) AS redundant_ppm
    FROM groups
    """,
)
def quality_duplication_scorecard_q(spark, sf_dir):
    """One-row corpus duplication scorecard: total docs, distinct
    contents, redundant copies (rows an exact dedup would remove), the
    largest duplicate group, and the redundancy share in ppm — the
    before/after number every dedup run reports (planted copies of 40
    docs make the gate's expected redundancy exact).  This is the
    SUMMARY tier above `dedup_exact_hash`'s per-group detail — the
    scorecard a pipeline logs per corpus version.

    100 TB shape: one digest hash agg (the exchange carries 32-byte
    digests + counters), then a 5-counter global fold over the
    group-cardinality frame."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 40).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    groups = corpus.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return groups.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("n") - 1).cast("long").alias("n_redundant"),
        F.max("n").cast("long").alias("max_copies"),
        F.expr("CAST(1000000 * sum(n - 1) DIV sum(n) AS BIGINT)").alias(
            "redundant_ppm"
        ),
    )


# --------------------------------------------------------------------------
# agg_aging_buckets — receivables-style age bucketing
# --------------------------------------------------------------------------
@register(
    "agg_aging_buckets",
    oracle="""
    WITH aged AS (
      SELECT o_orderstatus AS status,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                  (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
                  AS BIGINT) AS age_days,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    bucketed AS (
      SELECT status,
             CASE WHEN age_days <= 30 THEN '0-30'
                  WHEN age_days <= 60 THEN '31-60'
                  WHEN age_days <= 90 THEN '61-90'
                  ELSE '90+' END AS age_bucket,
             cents
      FROM aged
    )
    SELECT status, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM bucketed GROUP BY status, age_bucket
    """,
)
def agg_aging_buckets_q(spark, sf_dir):
    """Aging report (the receivables/backlog staple): orders bucketed by
    days outstanding relative to the corpus max date (0-30/31-60/61-90/
    90+), value per (status, bucket) in exact cents.  Day arithmetic on
    DATE-truncated values so both engines count calendar days (datediff
    on raw timestamps would be engine-identical here but the DATE cast
    states the intent); the reference date is the corpus max — a pure
    function of the data, so the gate is reproducible (wall-clock 'now'
    never appears in a hash-gated query).

    100 TB shape: the max date is a 1-row broadcast; the bucket CASE is
    codegen; one (status, bucket)-keyed hash agg, 8 output rows."""
    orders = _t(spark, sf_dir, "orders")
    max_d = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("ref"))
    aged = orders.crossJoin(F.broadcast(max_d)).select(
        F.col("o_orderstatus").alias("status"),
        F.datediff("ref", F.col("o_orderdate").cast("date")).cast("long").alias(
            "age_days"
        ),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bucketed = aged.select(
        "status",
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 60, "31-60")
        .when(F.col("age_days") <= 90, "61-90")
        .otherwise("90+")
        .alias("age_bucket"),
        "cents",
    )
    return bucketed.groupBy("status", "age_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


# --------------------------------------------------------------------------
# join_asof_tolerance — as-of with a staleness bound
# --------------------------------------------------------------------------
@register(
    "join_asof_tolerance",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    m AS (
      SELECT e.event_id, e.ts, o.o_orderkey, o.o_orderdate
      FROM events e
      ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    )
    SELECT event_id,
           CAST(CASE WHEN o_orderdate IS NOT NULL
                      AND CAST(FLOOR(epoch(ts)) AS BIGINT)
                          - CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)
                          <= 604800
                     THEN o_orderkey END AS BIGINT) AS asof_orderkey,
           CAST(CASE WHEN o_orderdate IS NOT NULL
                      AND CAST(FLOOR(epoch(ts)) AS BIGINT)
                          - CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)
                          <= 604800
                     THEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                          - CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)
                END AS BIGINT) AS staleness_s
    FROM m
    """,
)
def join_asof_tolerance_q(spark, sf_dir):
    """As-of join with a STALENESS BOUND — the production knob the plain
    as-of lacks: a match older than the tolerance (7 days here) is as
    good as no match (sensor fusion, price snapshots, feature stores all
    reject stale carries), so it nulls out and the staleness itself is
    emitted for the freshness histogram.  Implemented by carrying a
    STRUCT(right_time, right_value) through the same union + windowed
    carry-forward as `join_asof_events` (one extra packed column, zero
    extra shuffles — vs the naive approach of a second as-of pass for
    the time), then applying the tolerance as a projection.

    100 TB shape: identical to the as-of family — one union + one
    (key, time)-ordered window, never a range cross product; the
    tolerance filter is free codegen on top."""
    from ..operators.asof import join_asof

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.struct(F.col("o_orderdate").alias("t"), F.col("o_orderkey").alias("v")).alias(
            "packed"
        ),
    )
    out = join_asof(
        ev,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_value="packed",
        out_col="m",
    )
    stale = F.unix_timestamp("ts").cast("long") - F.unix_timestamp(
        F.col("m.t")
    ).cast("long")
    ok = F.col("m").isNotNull() & (stale <= 604800)
    return out.select(
        "event_id",
        F.when(ok, F.col("m.v")).cast("long").alias("asof_orderkey"),
        F.when(ok, stale).cast("long").alias("staleness_s"),
    )


# --------------------------------------------------------------------------
# text_burstiness_profile — token dispersion (template detection)
# --------------------------------------------------------------------------
@register(
    "text_burstiness_profile",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY doc_id, w
    ),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
    stats AS (
      SELECT w,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS total_tf,
             CAST(SUM(c * c) AS BIGINT) AS sq_sum
      FROM tf GROUP BY w
    ),
    ranked AS (
      SELECT s.w, s.df, s.total_tf, s.sq_sum, nd.n,
             CAST(nd.n * s.sq_sum - s.total_tf * s.total_tf AS BIGINT)
               AS burst_num,
             row_number() OVER (ORDER BY s.df DESC, s.w ASC) AS rnk
      FROM stats s, nd
    )
    SELECT w, df, total_tf, sq_sum, n AS n_docs, burst_num,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 20
    """,
)
def text_burstiness_profile_q(spark, sf_dir):
    """Token burstiness (dispersion) profile for the 20 highest-df terms:
    burst_num = n·Σc² − (Σc)² over per-doc counts c (zero-filled docs
    included via the n· term) — the exact integer variance numerator, so
    positive-and-large means the token CLUMPS into few documents
    (boilerplate, templates, spam signatures) while near-Poisson terms
    spread evenly.  The corpus-quality signal Church & Gale's burstiness
    work made standard, emitted as exact moments (the consumer divides
    for the Fano factor; the DIV/floor trap avoided again).

    100 TB shape: the stats aggregate runs over the (doc, term) TF TABLE
    (the `text_tfidf_topk` never-reaggregate-the-token-stream rule); the
    top-20 cut is orderBy().limit() — TakeOrderedAndProject, no global
    sort; n_docs attaches as a 1-row broadcast."""
    tok = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tf = tf.localCheckpoint(eager=True)  # feeds nd and stats
    nd = tf.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    stats = tf.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("total_tf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq_sum"),
    )
    head = (
        stats.orderBy(F.desc("df"), F.asc("w"))
        .limit(20)
        .crossJoin(F.broadcast(nd))
    )
    w_rank = Window.orderBy(F.desc("df"), F.asc("w"))
    return head.select(
        "w",
        "df",
        "total_tf",
        "sq_sum",
        F.col("n").alias("n_docs"),
        (F.col("n") * F.col("sq_sum") - F.col("total_tf") * F.col("total_tf"))
        .cast("long")
        .alias("burst_num"),
        F.row_number().over(w_rank).cast("long").alias("rnk"),
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
# agg_association_rules — market-basket support / confidence / lift
# --------------------------------------------------------------------------
@register(
    "agg_association_rules",
    oracle="""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey % 200 AS item
      FROM lineitem WHERE l_orderkey % 2 = 0
    ),
    n_orders AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM basket),
    item_supp AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM basket GROUP BY item
    ),
    pair_supp AS (
      SELECT x.item AS a, y.item AS b, CAST(COUNT(*) AS BIGINT) AS sab
      FROM basket x JOIN basket y ON y.o = x.o AND x.item < y.item
      GROUP BY x.item, y.item
      HAVING COUNT(*) >= 5
    )
    SELECT p.a, p.b, p.sab, sa.s AS sa, sb.s AS sb, n.n AS n_orders,
           CAST(1000000 * p.sab // n.n AS BIGINT) AS support_ppm,
           CAST(1000000 * p.sab // sa.s AS BIGINT) AS conf_a_to_b_ppm,
           CAST(1000000 * p.sab // sb.s AS BIGINT) AS conf_b_to_a_ppm,
           CAST(p.sab * n.n AS BIGINT) AS lift_num,
           CAST(sa.s * sb.s AS BIGINT) AS lift_den
    FROM pair_supp p
    JOIN item_supp sa ON sa.item = p.a
    JOIN item_supp sb ON sb.item = p.b
    CROSS JOIN n_orders n
    """,
)
def agg_association_rules_q(spark, sf_dir):
    """Association rules over order baskets (Agrawal-Srikant apriori at
    the pair level): co-purchased item pairs with exact support,
    DIRECTED confidences, and lift as the integer pair
    (sab·N, sa·sb) — lift > 1 iff sab·N > sa·sb, a pure integer
    comparison (the no-division doctrine; lift is PMI's exponential
    sibling, `text_collocations_pmi` on the basket domain with the
    confidence column the text version has no analogue for).  min
    support 5 prunes the noise tail BEFORE the stats joins.

    100 TB shape: pair generation is the basket self-join keyed on order
    — fanout bounded by basket size squared (baskets are small by
    nature; a degenerate mega-basket is the hub-cap case); item supports
    join on the pair endpoints; N is a 1-row broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 2 == 0)
    basket = li.select(
        F.col("l_orderkey").alias("o"), (F.col("l_partkey") % 200).alias("item")
    ).distinct().localCheckpoint(eager=True)
    n_orders = basket.agg(F.countDistinct("o").cast("long").alias("n"))
    item_supp = basket.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("s"))
    x = basket.select("o", F.col("item").alias("a"))
    y = basket.select("o", F.col("item").alias("b"))
    pair_supp = (
        x.join(y, "o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("sab"))
        .filter(F.col("sab") >= 5)
    )
    return (
        pair_supp.join(item_supp.select(F.col("item").alias("a"), F.col("s").alias("sa")), "a")
        .join(item_supp.select(F.col("item").alias("b"), F.col("s").alias("sb")), "b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            "sab",
            "sa",
            "sb",
            F.col("n").alias("n_orders"),
            F.expr("CAST(1000000 * sab DIV n AS BIGINT)").alias("support_ppm"),
            F.expr("CAST(1000000 * sab DIV sa AS BIGINT)").alias("conf_a_to_b_ppm"),
            F.expr("CAST(1000000 * sab DIV sb AS BIGINT)").alias("conf_b_to_a_ppm"),
            (F.col("sab") * F.col("n")).cast("long").alias("lift_num"),
            (F.col("sa") * F.col("sb")).cast("long").alias("lift_den"),
        )
    )


# --------------------------------------------------------------------------
# dedup_exact_normalized — near-exact dedup after canonical text cleanup
# --------------------------------------------------------------------------
@register(
    "dedup_exact_normalized",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000, upper(text) FROM documents WHERE doc_id < 15
      UNION ALL
      SELECT doc_id + 20000, text || '   ' FROM documents WHERE doc_id < 15
    ),
    norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                    '[.,!?;:''"()]', '', 'g'), '\\s+', ' ', 'g')) AS t
      FROM corpus
    )
    SELECT sha256(t) AS norm_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM norm GROUP BY sha256(t)
    """,
)
def dedup_exact_normalized_q(spark, sf_dir):
    """Normalized-exact dedup — the tier between byte-exact
    (`dedup_exact_hash`) and fuzzy: lowercase, strip punctuation,
    collapse whitespace, THEN hash — catching the case/spacing/
    punctuation variants that dominate real crawl duplicates (the C4
    cleanup observation) at exact-dedup cost, no candidate generation at
    all.  Planted uppercase and trailing-whitespace copies make the gate
    count them as duplicates where the byte-exact tier would not.

    100 TB shape: the normalizer is a codegen regexp chain riding the
    scan; thereafter identical to exact dedup — ONE digest hash
    aggregate, uniform keys."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 10000).alias("doc_id"), F.upper("text").alias("text")
        )
    ).unionByName(
        docs.filter(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 20000).alias("doc_id"),
            F.concat(F.col("text"), F.lit("   ")).alias("text"),
        )
    )
    norm = corpus.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[.,!?;:'\"()]", ""), r"\s+", " "
            )
        ).alias("t"),
    )
    return norm.groupBy(F.sha2("t", 256).alias("norm_hash")).agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )


# --------------------------------------------------------------------------
# eval_calibration_bins — reliability diagram as a query
# --------------------------------------------------------------------------
@register(
    "eval_calibration_bins",
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
      SELECT score_ppm, y,
             ntile(10) OVER (ORDER BY score_ppm, doc_id) AS bin
      FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(score_ppm) AS BIGINT) AS score_lo,
           CAST(MAX(score_ppm) AS BIGINT) AS score_hi,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(1000000 * SUM(y) // COUNT(*) AS BIGINT) AS observed_ppm,
           CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS mean_score_ppm
    FROM binned GROUP BY bin
    """,
)
def eval_calibration_bins_q(spark, sf_dir):
    """Reliability diagram (calibration curve) as a query: the stopword
    ratio — quantized to exact ppm so the score itself is
    engine-identical — used as an English-ness score, decile-binned
    (ntile with the deterministic (score, id) total order), with each
    bin's observed positive rate beside its mean score.  A calibrated
    detector shows observed_ppm tracking mean_score_ppm; the gap per bin
    is the thresholding evidence `eval_binary_detector_metrics`' single
    cutoff can't show.  Completes the eval family: confusion matrix
    (which classes), scorecard (how good), calibration (where to cut).

    100 TB shape: score is codegen on the scan; the decile assignment is
    `ntile_exact`'s two-pass range-rank (repartitionByRange + per-range
    row_number + a |partitions|-row offset collect) — ntile semantics
    with no single-partition sort; per-bin stats collapse map-side."""
    scored = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CAST(1000000 * size(filter(split(text, '\\\\s+'),"
            " t -> t IN ('the','a','of','and','to','in','is')))"
            " DIV size(split(text, '\\\\s+')) AS BIGINT)"
        ).alias("score_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    from ..operators.windows import ntile_exact

    binned = ntile_exact(scored, 10, ["score_ppm", "doc_id"], "bin").select(
        "score_ppm", "y", "bin"
    )
    return binned.groupBy(F.col("bin").cast("long").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("score_ppm").alias("score_lo"),
        F.max("score_ppm").alias("score_hi"),
        F.sum("y").cast("long").alias("n_pos"),
        F.expr("CAST(1000000 * sum(y) DIV count(1) AS BIGINT)").alias("observed_ppm"),
        F.expr("CAST(sum(score_ppm) DIV count(1) AS BIGINT)").alias("mean_score_ppm"),
    )


# --------------------------------------------------------------------------
# text_code_detector — code-vs-prose screening signals
# --------------------------------------------------------------------------
@register(
    "text_code_detector",
    oracle="""
    SELECT doc_id,
      CAST(length(text) - length(regexp_replace(text, '[{{}}()\\[\\];=<>]', '', 'g'))
           AS BIGINT) AS n_symbols,
      CAST(1000000 * (length(text)
             - length(regexp_replace(text, '[{{}}()\\[\\];=<>]', '', 'g')))
           // greatest(length(text), 1) AS BIGINT) AS symbol_ppm,
      CAST(len(list_filter(string_split_regex(text, '\\s+'),
             t -> t IN ('def','return','import','var','function','class',
                        'const','if','else','for','while')))
           AS BIGINT) AS n_keywords,
      CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
             t -> t IN ('def','return','import','var','function','class',
                        'const','if','else','for','while')))
           // greatest(len(string_split_regex(text, '\\s+')), 1) AS BIGINT)
        AS keyword_ppm,
      1000000 * (length(text)
             - length(regexp_replace(text, '[{{}}()\\[\\];=<>]', '', 'g')))
           // greatest(length(text), 1) >= 30000
        OR 1000000 * len(list_filter(string_split_regex(text, '\\s+'),
             t -> t IN ('def','return','import','var','function','class',
                        'const','if','else','for','while')))
           // greatest(len(string_split_regex(text, '\\s+')), 1) >= 50000
        AS looks_like_code
    FROM documents
    """,
)
def text_code_detector_q(spark, sf_dir):
    """Code-vs-prose detector — the routing screen a pretraining pipeline
    runs to send code to the code pipeline and prose to the text one:
    structural-symbol density ({}()[];=<>) and programming-keyword share,
    both as exact ppm, OR-combined into the boolean verdict at documented
    thresholds (3% symbols or 5% keywords).  Signals stay alongside the
    verdict so threshold tuning is a projection, not a re-scan.

    100 TB shape: two codegen regexp/HOF expressions riding the corpus
    scan — zero shuffles, the cheapest possible router; at the corpus
    tier the verdict becomes the partition column of the routed write
    (the `stream_split_route` side-output doctrine)."""
    sym = F.length("text") - F.length(
        F.regexp_replace("text", r"[{}()\[\];=<>]", "")
    )
    kws = "('def','return','import','var','function','class','const','if','else','for','while')"
    n_kw = F.expr(
        f"size(filter(split(text, '\\\\s+'), t -> t IN {kws}))"
    )
    n_tok = F.expr("greatest(size(split(text, '\\\\s+')), 1)")
    sym_ppm = F.expr(
        "CAST(1000000 * (length(text)"
        " - length(regexp_replace(text, '[{}()\\\\[\\\\];=<>]', '')))"
        " DIV greatest(length(text), 1) AS BIGINT)"
    )
    kw_ppm = (F.lit(1000000) * n_kw.cast("long")).cast("long") / n_tok
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        sym.cast("long").alias("n_symbols"),
        sym_ppm.alias("symbol_ppm"),
        n_kw.cast("long").alias("n_keywords"),
        F.expr(
            f"CAST(1000000 * size(filter(split(text, '\\\\s+'), t -> t IN {kws}))"
            " DIV greatest(size(split(text, '\\\\s+')), 1) AS BIGINT)"
        ).alias("keyword_ppm"),
        (
            (sym_ppm >= 30000)
            | (
                F.expr(
                    f"1000000 * size(filter(split(text, '\\\\s+'), t -> t IN {kws}))"
                    " DIV greatest(size(split(text, '\\\\s+')), 1)"
                )
                >= 50000
            )
        ).alias("looks_like_code"),
    )


# --------------------------------------------------------------------------
# text_readability_stats — Flesch-Kincaid components, integer-exact
# --------------------------------------------------------------------------
@register(
    "text_readability_stats",
    oracle="""
    WITH base AS (
      SELECT doc_id,
        CAST(greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
               s -> trim(s) <> '')), 1) AS BIGINT) AS n_sents,
        CAST(greatest(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
               w -> w <> '')), 1) AS BIGINT) AS n_words,
        CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
             AS BIGINT) AS n_syll
      FROM documents
    )
    SELECT doc_id, n_sents, n_words, n_syll,
           CAST(1000 * n_words // n_sents AS BIGINT) AS words_per_sent_milli,
           CAST(1000 * n_syll // n_words AS BIGINT) AS syll_per_word_milli,
           CAST((390 * 1000 * n_words // n_sents
                 + 11800 * n_syll // n_words) - 15590 AS BIGINT)
             AS fk_grade_micro_ish
    FROM base
    """,
)
def text_readability_stats_q(spark, sf_dir):
    """Flesch-Kincaid readability components, integer-exact: sentence
    count (punctuation runs), word count, and the standard vowel-cluster
    syllable approximation — plus the FK grade assembled from truncating
    milli-ratios (0.39·w/s + 11.8·syll/w − 15.59, scaled x1000; named
    `_ish` because the truncation happens per-term, a documented
    quantization, not a float).  The grade-level prior is a standard
    pretraining quality facet (too-low = fragments/boilerplate, too-high
    = OCR garbage), here with every component exposed so alternative
    formulas (SMOG, Coleman-Liau) are projections over the same scan.

    100 TB shape: three regexp/HOF expressions riding the scan — zero
    shuffles, like every per-document text facet."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CAST(greatest(size(filter(split(text, '[.!?]+'),"
            " s -> trim(s) <> '')), 1) AS BIGINT)"
        ).alias("n_sents"),
        F.expr(
            "CAST(greatest(size(filter(split(lower(text), '[^a-z]+'),"
            " w -> w <> '')), 1) AS BIGINT)"
        ).alias("n_words"),
        F.expr(
            "CAST(greatest(size(regexp_extract_all(lower(text),"
            " '[aeiouy]+', 0)), 1) AS BIGINT)"
        ).alias("n_syll"),
    ).select(
        "doc_id",
        "n_sents",
        "n_words",
        "n_syll",
        F.expr("CAST(1000 * n_words DIV n_sents AS BIGINT)").alias(
            "words_per_sent_milli"
        ),
        F.expr("CAST(1000 * n_syll DIV n_words AS BIGINT)").alias(
            "syll_per_word_milli"
        ),
        F.expr(
            "CAST((390 * 1000 * n_words DIV n_sents"
            " + 11800 * n_syll DIV n_words) - 15590 AS BIGINT)"
        ).alias("fk_grade_micro_ish"),
    )


# --------------------------------------------------------------------------
# sample_recency_decay — exact halving recency weights
# --------------------------------------------------------------------------
@register(
    "sample_recency_decay",
    oracle="""
    WITH aged AS (
      SELECT o_orderkey,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                  (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
                  AS BIGINT) // 180 AS half_lives,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    weighted AS (
      SELECT half_lives,
             CASE WHEN half_lives >= 10 THEN 0
                  ELSE 1024 // CAST(2 ** half_lives AS BIGINT) END AS w_1024,
             cents
      FROM aged
    )
    SELECT CAST(half_lives AS BIGINT) AS half_lives,
           CAST(w_1024 AS BIGINT) AS w_1024,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(w_1024 * cents) AS BIGINT) AS weighted_cents
    FROM weighted GROUP BY half_lives, w_1024
    """,
)
def sample_recency_decay_q(spark, sf_dir):
    """Recency-decay sampling weights with EXACT halving: age bucketed
    into 180-day half-lives, weight = 1024 >> half_lives (integer
    power-of-two decay, zero after 10 half-lives) — the
    freshness-weighting every news/web mixture applies, made a pure
    integer function so weighted sums hash-gate (a float exp(-age/tau)
    weight could never cross engines bit-exactly; snapping tau to
    half-life buckets is the documented quantization).  Grouped output =
    the decay table + weighted revenue per bucket; the per-row weight
    join is implicit (weight is a function of the bucket).

    100 TB shape: age + weight are codegen (max date broadcast); one
    bucket-keyed hash agg, ~10 output rows."""
    orders = _t(spark, sf_dir, "orders")
    max_d = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("ref"))
    aged = orders.crossJoin(F.broadcast(max_d)).select(
        F.expr("CAST(datediff(ref, CAST(o_orderdate AS DATE)) AS BIGINT) DIV 180")
        .alias("half_lives"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    weighted = aged.select(
        "half_lives",
        F.when(F.col("half_lives") >= 10, F.lit(0))
        .otherwise(F.expr("1024 DIV CAST(pow(2, half_lives) AS BIGINT)"))
        .cast("long")
        .alias("w_1024"),
        "cents",
    )
    return weighted.groupBy("half_lives", "w_1024").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("w_1024") * F.col("cents")).cast("long").alias("weighted_cents"),
    )


# --------------------------------------------------------------------------
# quality_freshness_profile — per-partition staleness monitor
# --------------------------------------------------------------------------
@register(
    "quality_freshness_profile",
    oracle="""
    WITH ref AS (
      SELECT CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS ref_s FROM events
    ),
    per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS last_s,
             CAST(SUM(CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                        >= (SELECT ref_s FROM ref) - 604800
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_last_7d
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_events, n_last_7d,
           CAST(r.ref_s - p.last_s AS BIGINT) AS staleness_s,
           r.ref_s - p.last_s > 86400 AS stale_over_1d
    FROM per_type p, ref r
    """,
)
def quality_freshness_profile_q(spark, sf_dir):
    """Per-stream freshness monitor: for each event type, its last-seen
    timestamp's lag behind the corpus high-water mark, the trailing-7-day
    volume, and a 1-day staleness flag — the ingestion-health dashboard
    row that catches a silently-dead upstream (one event type stops
    flowing while the others mask the total).  The reference point is the
    corpus max (pure function of the data — the `agg_aging_buckets`
    no-wall-clock rule), so the gate hashes.

    100 TB shape: two map-side-combinable aggregates (global max, per-type
    stats — the 7-day predicate rides the scan against the broadcast
    ref); output is type-cardinality."""
    ev = _t(spark, sf_dir, "events")
    ref = ev.agg(F.unix_timestamp(F.max("ts")).cast("long").alias("ref_s"))
    per_type = (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.unix_timestamp(F.max("ts")).cast("long").alias("last_s"),
            F.sum(
                (
                    F.unix_timestamp("ts").cast("long")
                    >= F.col("ref_s") - 604800
                ).cast("long")
            )
            .cast("long")
            .alias("n_last_7d"),
            F.first("ref_s").alias("ref_s"),
        )
    )
    return per_type.select(
        "event_type",
        "n_events",
        "n_last_7d",
        (F.col("ref_s") - F.col("last_s")).cast("long").alias("staleness_s"),
        (F.col("ref_s") - F.col("last_s") > 86400).alias("stale_over_1d"),
    )


# --------------------------------------------------------------------------
# temporal_new_entity_curve — first-seen growth with cumulative total
# --------------------------------------------------------------------------
@register(
    "temporal_new_entity_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             CAST(MIN(CAST(FLOOR(epoch(ts)) AS BIGINT) // 21600) AS BIGINT)
               AS bucket6h
      FROM events GROUP BY user_id
    ),
    per_bucket AS (
      SELECT bucket6h, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY bucket6h
    )
    SELECT bucket6h, n_new,
           CAST(SUM(n_new) OVER (ORDER BY bucket6h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_entities
    FROM per_bucket
    """,
)
def temporal_new_entity_curve_q(spark, sf_dir):
    """New-entity growth curve: users bucketed by the 6-hour epoch
    bucket they were FIRST seen in (bucket width sized to the synthetic
    corpus's time span; a production run picks days/weeks), with the running cumulative — the acquisition curve
    (users, domains, devices: swap the key) that a plain weekly
    distinct-count can't give because it double-counts returners.  The
    cumulative at week w IS the exact distinct-to-date count, computed
    without any sliding distinct machinery: first-seen assignment makes
    each entity count exactly once (`agg_bitmap_sliding_distinct` solves
    the harder windowed variant; this is the monotone special case where
    a MIN + cumsum suffices).

    100 TB shape: one entity-keyed MIN agg, a bucket-cardinality rollup,
    and a cumsum window over dozens of rows."""
    first_seen = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        F.min(F.unix_timestamp("ts").cast("long") / 21600)
        .cast("long")
        .alias("bucket6h")
    )
    per_bucket = first_seen.groupBy("bucket6h").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = Window.orderBy("bucket6h").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket6h",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_entities"),
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
# agg_session_paths — common session entry paths
# --------------------------------------------------------------------------
@register(
    "agg_session_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - lag(CAST(FLOOR(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM seq
    ),
    heads AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn
      FROM sess
    ),
    paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY rn) AS path3
      FROM heads WHERE rn <= 3 GROUP BY user_id, sid
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions FROM paths)
    SELECT path3, CAST(COUNT(*) AS BIGINT) AS n, t.n_sessions,
           CAST(1000000 * COUNT(*) // t.n_sessions AS BIGINT) AS share_ppm
    FROM paths, tot t GROUP BY path3, t.n_sessions
    """,
)
def agg_session_paths_q(spark, sf_dir):
    """Common session entry paths: the first 3 event types of every
    30-minute-gap session concatenated into a path string and censused —
    the navigation-flow summary (the top rows ARE the Sankey diagram's
    left edge), one step up from `agg_session_bounce`'s single-event
    screen.  Path assembly must be ORDER-DEFINED in both engines:
    DuckDB's string_agg takes ORDER BY inside the aggregate; Spark builds
    the same via sort_array over (rn, type) structs then joins — both
    orderings pinned to the (ts, event_id) total order.

    100 TB shape: the same one-exchange sessionize chain as
    `agg_session_bounce`; path strings are <= 3 short tokens; the census
    collapses to path-cardinality map-side."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts").cast("long")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (sec - F.lag(sec).over(w) > 1800) | F.lag("ts").over(w).isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    sess = seq.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    w_in = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    heads = sess.withColumn("rn", F.row_number().over(w_in)).filter(
        F.col("rn") <= 3
    )
    paths = heads.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path3")
    )
    tot = paths.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    return (
        paths.groupBy("path3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "path3",
            "n",
            "n_sessions",
            F.expr("CAST(1000000 * n DIV n_sessions AS BIGINT)").alias("share_ppm"),
        )
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
# sample_class_weights — inverse-frequency weights for imbalanced labels
# --------------------------------------------------------------------------
@register(
    "sample_class_weights",
    oracle="""
    WITH counts AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_classes
      FROM counts
    )
    SELECT CAST(label AS BIGINT) AS label, n, t.total, t.n_classes,
           CAST(1000000 * t.total // (t.n_classes * n) AS BIGINT)
             AS weight_ppm
    FROM counts, tot t
    """,
)
def sample_class_weights_q(spark, sf_dir):
    """Inverse-frequency class weights (sklearn's 'balanced' heuristic):
    w_c = total / (n_classes * n_c) in exact ppm — the loss-reweighting
    table for imbalanced labels, emitted beside the raw counts so
    effective-number or capped variants are projections.  A balanced
    corpus yields 1e6 everywhere; a 10x-underrepresented class gets ~1e7.

    100 TB shape: one label-cardinality hash agg + a 1-row broadcast —
    the cheapest query in the catalog, and the one whose output feeds
    directly into every trainer config."""
    counts = _t(spark, sf_dir, "embeddings").groupBy(
        F.col("label").cast("long").alias("label")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = counts.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "label",
        "n",
        "total",
        "n_classes",
        F.expr("CAST(1000000 * total DIV (n_classes * n) AS BIGINT)").alias(
            "weight_ppm"
        ),
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
# temporal_autocorr_lag1 — exact lag-1 autocovariance moments
# --------------------------------------------------------------------------
@register(
    "temporal_autocorr_lag1",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(FLOOR(value * 1000) AS BIGINT) AS x,
             lag(CAST(FLOOR(value * 1000) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS px
      FROM events WHERE user_id < 60
    ),
    pairs AS (
      SELECT user_id, x, px FROM seq WHERE px IS NOT NULL
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(px) AS BIGINT) AS spx,
           CAST(SUM(x * px) AS BIGINT) AS sxpx,
           CAST(COUNT(*) * SUM(x * px) - SUM(x) * SUM(px) AS BIGINT)
             AS cov_num
    FROM pairs GROUP BY user_id
    """,
)
def temporal_autocorr_lag1_q(spark, sf_dir):
    """Lag-1 autocorrelation moments per entity: over consecutive value
    pairs (x_t, x_{t-1}), the exact covariance numerator
    n·Σ(x·px) − Σx·Σpx — positive means the series is persistent /
    trending, negative means mean-reverting / alternating, near zero
    means white noise (the pre-test before fitting any AR model or
    trusting `temporal_ema_smooth`'s smoothing).  Emitted as exact int64
    moments — the correlation COEFFICIENT needs the two variance terms
    and a sqrt, which the consumer computes; the sign and the scale-free
    comparisons live entirely in cov_num (the assortativity doctrine on
    the time axis).

    100 TB shape: one user-key exchange for the lag window, one hash agg
    on the same partitioning — the CUSUM plan shape with a product
    accumulator."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.floor(F.col("value") * 1000).cast("long")
    seq = _t(spark, sf_dir, "events").filter(F.col("user_id") < 60).select(
        "user_id", x.alias("x"), F.lag(x).over(w).alias("px")
    )
    pairs = seq.filter(F.col("px").isNotNull())
    n, sx, spx = F.count(F.lit(1)), F.sum("x"), F.sum("px")
    sxpx = F.sum(F.col("x") * F.col("px"))
    return pairs.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        n.cast("long").alias("n"),
        sx.cast("long").alias("sx"),
        spx.cast("long").alias("spx"),
        sxpx.cast("long").alias("sxpx"),
        (n * sxpx - sx * spx).cast("long").alias("cov_num"),
    )


# --------------------------------------------------------------------------
# agg_attribution_models — first/last/linear credit side by side
# --------------------------------------------------------------------------
@register(
    "agg_attribution_models",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_event, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_event, user_id, ts AS touch_ts, event_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    attr AS (
      SELECT c.conv_event, t.event_type,
             row_number() OVER (PARTITION BY c.conv_event
                                ORDER BY t.touch_ts, t.touch_event) AS pos,
             COUNT(*) OVER (PARTITION BY c.conv_event) AS n_touch
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.touch_ts < c.conv_ts
       AND t.touch_ts >= c.conv_ts - INTERVAL 2 HOUR
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch_convs,
           CAST(SUM(CASE WHEN pos = n_touch THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_convs,
           CAST(SUM(1000000 // n_touch) AS BIGINT) AS linear_credit_micro,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM attr GROUP BY event_type
    """,
)
def agg_attribution_models_q(spark, sf_dir):
    """Attribution-model comparison on the `agg_attribution_linear`
    assignment: per touch TYPE, conversions credited under first-touch
    (pos = 1), last-touch (pos = n), and linear (Σ 1e6//n per touch —
    truncating micro-credits, the DOCUMENTED quantization: a conversion
    with 3 touches distributes 999,999 not 1,000,000, bias < 1 ppm per
    conversion and identical in both engines).  The three columns side
    by side are the model-sensitivity readout a marketing-mix decision
    actually looks at: when they disagree wildly, the channel mix is
    position-dependent and a single-model report is lying.

    100 TB shape: the same bucketed interval join as the base operator,
    then a types-cardinality rollup — the windows reuse the conversion
    partitioning."""
    ev = _t(spark, sf_dir, "events")
    lookback = 7200
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_event"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_event"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("touch_ts"),
        "event_type",
        F.floor(F.unix_timestamp("ts") / lookback).cast("long").alias("bucket"),
    )
    conv_fan = conv.select(
        "conv_event",
        "user_id",
        "conv_ts",
        F.explode(
            F.array(
                (F.floor(F.unix_timestamp("conv_ts") / lookback) - 1).cast("long"),
                F.floor(F.unix_timestamp("conv_ts") / lookback).cast("long"),
            )
        ).alias("bucket"),
    )
    joined = conv_fan.join(touch, ["user_id", "bucket"]).filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 2 HOURS"))
    )
    w_pos = Window.partitionBy("conv_event").orderBy("touch_ts", "touch_event")
    w_cnt = Window.partitionBy("conv_event")
    attr = joined.select(
        "event_type",
        F.row_number().over(w_pos).alias("pos"),
        F.count(F.lit(1)).over(w_cnt).alias("n_touch"),
    )
    return attr.groupBy("event_type").agg(
        F.sum((F.col("pos") == 1).cast("long")).cast("long").alias(
            "first_touch_convs"
        ),
        F.sum((F.col("pos") == F.col("n_touch")).cast("long"))
        .cast("long")
        .alias("last_touch_convs"),
        F.sum(F.expr("1000000 DIV n_touch")).cast("long").alias(
            "linear_credit_micro"
        ),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    )


# --------------------------------------------------------------------------
# temporal_activity_heatmap — (day-of-week x hour) activity matrix
# --------------------------------------------------------------------------
@register(
    "temporal_activity_heatmap",
    oracle="""
    WITH base AS (
      SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
             CAST(FLOOR(value * 1000) AS BIGINT) AS mv
      FROM events
    ),
    cells AS (
      SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mv) AS BIGINT) AS sum_mv
      FROM base GROUP BY dow, hod
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM cells)
    SELECT dow, hod, n, sum_mv,
           CAST(1000000 * n // t.n_total AS BIGINT) AS share_ppm
    FROM cells, tot t
    """,
)
def temporal_activity_heatmap_q(spark, sf_dir):
    """The (day-of-week x hour-of-day) activity heatmap — the 168-cell
    traffic matrix every ops dashboard opens with, here with exact cell
    shares so anomalous cells (a 3 AM Sunday spike = batch job or attack)
    are comparable across corpus versions.  Completes the seasonality
    pair: `temporal_seasonal_profile` gives per-dow deviations with exact
    significance numerators; this gives the full 2-D shape.  The hour is
    session-timezone-dependent BY DESIGN — the catalog pins sessions to
    UTC and the TZ sweep verifies NTZ math, so hour(ts) on NTZ values is
    engine-identical.

    100 TB shape: pure map-side collapse to <= 168 cells, one exchange,
    1-row broadcast total."""
    base = _t(spark, sf_dir, "events").select(
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
        F.floor(F.col("value") * 1000).cast("long").alias("mv"),
    )
    cells = base.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mv").cast("long").alias("sum_mv"),
    )
    tot = cells.agg(F.sum("n").cast("long").alias("n_total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n",
        "sum_mv",
        F.expr("CAST(1000000 * n DIV n_total AS BIGINT)").alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# sample_split_chronological — leakage-free time-ordered train/test split
# --------------------------------------------------------------------------
@register(
    "sample_split_chronological",
    oracle="""
    WITH ranked AS (
      SELECT event_id, ts,
             row_number() OVER (ORDER BY ts, event_id) AS rnk,
             COUNT(*) OVER () AS n
      FROM events
    ),
    tagged AS (
      SELECT event_id, ts,
             CASE WHEN rnk <= 8 * n // 10 THEN 'train' ELSE 'test' END
               AS split
      FROM ranked
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS BIGINT) AS min_ts_s,
           CAST(MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS BIGINT) AS max_ts_s
    FROM tagged GROUP BY split
    """,
)
def sample_split_chronological_q(spark, sf_dir):
    """Chronological 80/20 train/test split — the ONLY valid split for
    forecasting/sequence models, where `sample_split_hash`'s uniform
    assignment would leak the future into training: rows ranked by
    (ts, event_id) and the first 80% (exact integer cutoff 8n//10) become
    train.  The gate emits per-split row counts and the time BOUNDARIES —
    max(train) <= min(test) is the no-leakage invariant made visible (and
    pinned by test).

    100 TB shape: the global time rank is one RangePartitioner sort (the
    equi-depth doctrine); production replaces the exact rank with a
    timestamp cut at the approx 80% quantile and keeps this exact path
    for the audit tier — stated so the sort is a choice, not an
    accident."""
    w = Window.orderBy("ts", "event_id")
    ranked = _t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    tagged = ranked.select(
        "event_id",
        "ts",
        F.when(F.col("rnk") <= F.expr("8 * n DIV 10"), "train")
        .otherwise("test")
        .alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(F.unix_timestamp("ts").cast("long")).alias("min_ts_s"),
        F.max(F.unix_timestamp("ts").cast("long")).alias("max_ts_s"),
    )


# --------------------------------------------------------------------------
# quality_split_balance — distribution shift between chronological splits
# --------------------------------------------------------------------------
@register(
    "quality_split_balance",
    oracle="""
    WITH ranked AS (
      SELECT event_type, ts, event_id,
             row_number() OVER (ORDER BY ts, event_id) AS rnk,
             COUNT(*) OVER () AS n
      FROM events
    ),
    tagged AS (
      SELECT event_type,
             CASE WHEN rnk <= 8 * n // 10 THEN 'train' ELSE 'test' END
               AS split
      FROM ranked
    ),
    cells AS (
      SELECT split, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM tagged GROUP BY split, event_type
    ),
    split_tot AS (
      SELECT split, CAST(SUM(n) AS BIGINT) AS n_split
      FROM cells GROUP BY split
    )
    SELECT c.split, c.event_type, c.n, s.n_split,
           CAST(1000000 * c.n // s.n_split AS BIGINT) AS share_ppm
    FROM cells c JOIN split_tot s USING (split)
    """,
)
def quality_split_balance_q(spark, sf_dir):
    """Distribution balance across the chronological split: each event
    type's share WITHIN train and WITHIN test — the covariate-shift check
    run immediately after `sample_split_chronological` (a type whose
    share moves sharply between splits means the task distribution
    drifted over time and test metrics will surprise; the
    `agg_drift_tvd` comparison applied to the split axis instead of the
    time-pivot axis).  Shares are truncating ppm of the split total.

    100 TB shape: the split tag reuses the one time-rank sort; the census
    is a (split, type) map-side collapse with split totals re-joined as
    a 2-row broadcast."""
    w = Window.orderBy("ts", "event_id")
    ranked = _t(spark, sf_dir, "events").select(
        "event_type",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    tagged = ranked.select(
        "event_type",
        F.when(F.col("rnk") <= F.expr("8 * n DIV 10"), "train")
        .otherwise("test")
        .alias("split"),
    )
    cells = tagged.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    split_tot = cells.groupBy("split").agg(F.sum("n").cast("long").alias("n_split"))
    return cells.join(F.broadcast(split_tot), "split").select(
        "split",
        "event_type",
        "n",
        "n_split",
        F.expr("CAST(1000000 * n DIV n_split AS BIGINT)").alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# agg_lorenz_curve — decile cumulative-share points (the Gini picture)
# --------------------------------------------------------------------------
@register(
    "agg_lorenz_curve",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS cust,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT cents, ntile(10) OVER (ORDER BY cents, cust) AS decile
      FROM spend
    ),
    per_decile AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM tiled GROUP BY decile
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per_decile)
    SELECT decile, n_cust, cents,
           CAST(SUM(cents) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cents,
           CAST(1000000 * SUM(cents) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                // t.total AS BIGINT) AS cum_share_ppm
    FROM per_decile, tot t
    """,
)
def agg_lorenz_curve_q(spark, sf_dir):
    """Lorenz curve points: customers decile-tiled by ascending spend
    (deterministic (cents, cust) total order — the equi-depth doctrine),
    each decile's cumulative share of total spend in exact ppm — the
    PICTURE whose area-gap `agg_gini_concentration` reduces to a scalar
    (cum_share_ppm at decile d vs the d*100000 diagonal IS the local
    inequality).  Bottom-decile share near 0 with top-decile jump to 1e6
    = a heavy-tail corpus; the plot-ready companion of the Gini audit.

    100 TB shape: customer-keyed agg, a dimension-scale ntile sort, and
    the cumsum over exactly 10 rows; total broadcasts."""
    spend = _t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("cust")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    from ..operators.windows import ntile_exact

    tiled = ntile_exact(spend, 10, ["cents", "cust"], "decile").select(
        "cents", "decile"
    )
    per_decile = tiled.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = per_decile.agg(F.sum("cents").cast("long").alias("total"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per_decile.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_cust",
        "cents",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
        F.expr(
            "CAST(1000000 * sum(cents) OVER (ORDER BY decile"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " DIV total AS BIGINT)"
        ).alias("cum_share_ppm"),
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
# temporal_local_peaks — prominence-filtered local maxima
# --------------------------------------------------------------------------
@register(
    "temporal_local_peaks",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 1000) AS BIGINT) AS x,
             lag(CAST(FLOOR(value * 1000) AS BIGINT))
               OVER w AS px,
             lead(CAST(FLOOR(value * 1000) AS BIGINT))
               OVER w AS nx
      FROM events WHERE user_id < 60
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           x, px, nx,
           CAST(x - greatest(px, nx) AS BIGINT) AS prominence
    FROM seq
    WHERE px IS NOT NULL AND nx IS NOT NULL
      AND x > px AND x > nx AND x - greatest(px, nx) >= 100
    """,
)
def temporal_local_peaks_q(spark, sf_dir):
    """Local-peak detection with a prominence floor: interior points
    strictly above BOTH neighbors by at least 0.1 (100 milli-units) —
    the spike extractor behind alert-on-peak telemetry and the
    discrete counterpart of `temporal_rolling_anomaly`'s windowed z-test
    (that flags statistical outliers; this finds geometric peaks, and a
    point can be either without being the other).  Strict inequality +
    the integer prominence threshold make the peak set reproducible on
    plateaus (a flat-top plateau has NO strict peak — documented
    semantics, not an accident).

    100 TB shape: one lag + one lead over the SAME user-key window
    (single Window operator, one exchange); the filter is codegen."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.floor(F.col("value") * 1000).cast("long")
    seq = _t(spark, sf_dir, "events").filter(F.col("user_id") < 60).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        x.alias("x"),
        F.lag(x).over(w).alias("px"),
        F.lead(x).over(w).alias("nx"),
    )
    return seq.filter(
        F.col("px").isNotNull()
        & F.col("nx").isNotNull()
        & (F.col("x") > F.col("px"))
        & (F.col("x") > F.col("nx"))
        & (F.col("x") - F.greatest("px", "nx") >= 100)
    ).select(
        "user_id",
        "event_id",
        "x",
        "px",
        "nx",
        (F.col("x") - F.greatest("px", "nx")).cast("long").alias("prominence"),
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
# agg_attribution_lookback_sweep — the lookback knob, measured
# --------------------------------------------------------------------------
def _lookback_oracle() -> str:
    selects = []
    for h in (1, 2, 4):
        selects.append(
            f"""
    SELECT {h} AS lookback_h,
           CAST(COUNT(DISTINCT c.conv_event) AS BIGINT) AS n_attributed,
           CAST(COUNT(*) AS BIGINT) AS n_touch_pairs
    FROM conv c JOIN touch t
      ON t.user_id = c.user_id
     AND t.touch_ts < c.conv_ts
     AND t.touch_ts >= c.conv_ts - INTERVAL {h} HOUR"""
        )
    return (
        """
    WITH conv AS (
      SELECT event_id AS conv_event, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_event, user_id, ts AS touch_ts
      FROM events WHERE event_type IN ('click', 'view')
    )"""
        + " UNION ALL ".join(selects)
    )


@register("agg_attribution_lookback_sweep", oracle=_lookback_oracle())
def agg_attribution_lookback_sweep_q(spark, sf_dir):
    """Attribution-lookback sensitivity sweep: attributed conversions and
    touch pairs at 1 h / 2 h / 4 h windows — the knob-tuning evidence for
    `agg_attribution_linear`'s lookback parameter, read together with
    `agg_funnel_time_to_convert`'s latency distribution (the sweep shows
    what each window CAPTURES; the distribution shows what it SHOULD).
    The marginal rows between consecutive windows are the conversions a
    tighter budget would orphan.

    100 TB shape: ONE bucketed interval join at the WIDEST window (4 h
    buckets, {b-1, b} fanout), then each narrower window is a FILTER over
    the same joined rows — three sweep points for one join's cost, never
    three joins."""
    ev = _t(spark, sf_dir, "events")
    widest = 14400
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_event"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.floor(F.unix_timestamp("ts") / widest).cast("long").alias("bucket"),
    )
    conv_fan = conv.select(
        "conv_event",
        "user_id",
        "conv_ts",
        F.explode(
            F.array(
                (F.floor(F.unix_timestamp("conv_ts") / widest) - 1).cast("long"),
                F.floor(F.unix_timestamp("conv_ts") / widest).cast("long"),
            )
        ).alias("bucket"),
    )
    joined = (
        conv_fan.join(touch, ["user_id", "bucket"])
        .filter(
            (F.col("touch_ts") < F.col("conv_ts"))
            & (
                F.col("touch_ts")
                >= F.col("conv_ts") - F.expr("INTERVAL 4 HOURS")
            )
        )
        .select(
            "conv_event",
            (
                F.unix_timestamp("conv_ts").cast("long")
                - F.unix_timestamp("touch_ts").cast("long")
            ).alias("gap_s"),
        )
        .localCheckpoint(eager=True)
    )
    outs = []
    for h in (1, 2, 4):
        outs.append(
            joined.filter(F.col("gap_s") <= h * 3600).agg(
                F.lit(h).cast("int").alias("lookback_h"),
                F.countDistinct("conv_event").cast("long").alias("n_attributed"),
                F.count(F.lit(1)).cast("long").alias("n_touch_pairs"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


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
# join_point_in_time_features — leakage-free feature-store join
# --------------------------------------------------------------------------
@register(
    "join_point_in_time_features",
    oracle="""
    WITH feats AS (
      SELECT o_custkey AS user_id, o_orderdate AS ft,
             row_number() OVER w AS n_orders,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER w
               AS spend_cents,
             row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                ORDER BY o_orderkey DESC) AS rn_at_ts
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    snap AS (
      SELECT user_id, ft, MAX(n_orders) AS n_orders,
             MAX(spend_cents) AS spend_cents
      FROM feats GROUP BY user_id, ft
    ),
    labels AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id,
           CAST(COALESCE(s.n_orders, 0) AS BIGINT) AS n_orders_asof,
           CAST(COALESCE(s.spend_cents, 0) AS BIGINT) AS spend_cents_asof
    FROM labels l
    ASOF LEFT JOIN snap s ON l.user_id = s.user_id AND l.ts >= s.ft
    """,
)
def join_point_in_time_features_q(spark, sf_dir):
    """Point-in-time-correct feature join — the feature-store core: each
    label event (purchase) is enriched with the user's order count and
    cumulative spend AS OF the label timestamp, never after it (training
    on post-label state is the leakage that makes offline metrics lie).
    Features are running aggregates snapshotted at each order time (one
    cumulative window, deduped to the last value per (user, ts)); the
    enrichment is the as-of carry-forward — composing the repo's two
    primitives into the pattern every training-example assembler runs.
    Absent history = COALESCE 0, the documented cold-start encoding.

    100 TB shape: the feature timeline is one user-keyed window; the PIT
    join is the as-of union + carry-forward (never a range cross
    product); multi-feature-table assembly repeats the same shape per
    table on the shared user partitioning."""
    from ..operators.asof import join_asof

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    feats = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ft"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).over(w).alias(
            "spend_cents"
        ),
    )
    snap = feats.groupBy("user_id", "ft").agg(
        F.max("n_orders").alias("n_orders"),
        F.max("spend_cents").alias("spend_cents"),
    ).select(
        "user_id",
        "ft",
        F.struct(F.col("n_orders").alias("n"), F.col("spend_cents").alias("s")).alias(
            "packed"
        ),
    )
    labels = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "ts")
    out = join_asof(
        labels,
        snap,
        on="user_id",
        left_time="ts",
        right_time="ft",
        right_value="packed",
        out_col="m",
    )
    return out.select(
        "event_id",
        F.coalesce(F.col("m.n"), F.lit(0)).cast("long").alias("n_orders_asof"),
        F.coalesce(F.col("m.s"), F.lit(0)).cast("long").alias("spend_cents_asof"),
    )


# --------------------------------------------------------------------------
# quality_split_leakage — duplicated content across train/test
# --------------------------------------------------------------------------
@register(
    "quality_split_leakage",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 30
    ),
    tagged AS (
      SELECT doc_id, sha256(text) AS h,
             CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                        || '|splitv1'), 1, 8))::BIGINT % 10 < 8
                  THEN 'train' ELSE 'test' END AS split
      FROM corpus
    ),
    sides AS (
      SELECT h,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_train,
             CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_test
      FROM tagged GROUP BY h
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_contents,
           CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked_contents,
           CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN n_test
                    ELSE 0 END) AS BIGINT) AS n_test_rows_leaked
    FROM sides
    """,
)
def quality_split_leakage_q(spark, sf_dir):
    """Split-leakage audit: content hashes appearing in BOTH the train
    and test sides of the md5 split — the self-contamination check
    (`contamination_ngram` guards against external benchmarks; this
    guards against your own duplicates crossing the split, the failure
    that inflates every offline metric).  Planted duplicate texts under
    DIFFERENT doc_ids land on different split sides with probability
    2·0.8·0.2, so the gate output is non-trivially positive.  The fix is
    upstream dedup-then-split — this audit is the regression test that
    the fix stays in place.

    100 TB shape: the split tag is a pure md5 projection; ONE digest
    aggregate carries both side counters (the exchange is digests +
    counters); the verdict is a 3-counter fold."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    tagged = corpus.select(
        F.sha2("text", 256).alias("h"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("doc_id"), F.lit("splitv1"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 10
            < 8,
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    sides = tagged.groupBy("h").agg(
        F.sum((F.col("split") == "train").cast("long")).cast("long").alias("n_train"),
        F.sum((F.col("split") == "test").cast("long")).cast("long").alias("n_test"),
    )
    leaked = (F.col("n_train") > 0) & (F.col("n_test") > 0)
    return sides.agg(
        F.count(F.lit(1)).cast("long").alias("n_contents"),
        F.sum(leaked.cast("long")).cast("long").alias("n_leaked_contents"),
        F.sum(F.when(leaked, F.col("n_test")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_test_rows_leaked"),
    )


# --------------------------------------------------------------------------
# fn_target_encode_oof — leakage-free out-of-fold target encoding
# --------------------------------------------------------------------------
@register(
    "fn_target_encode_oof",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS cat,
             ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)
                      || '|tefold'), 1, 8))::BIGINT % 5 AS fold,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    per_fold AS (
      SELECT cat, CAST(fold AS BIGINT) AS fold,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM base GROUP BY cat, fold
    ),
    cat_tot AS (
      SELECT cat, CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(pos) AS BIGINT) AS pos_all
      FROM per_fold GROUP BY cat
    )
    SELECT p.cat, p.fold,
           CAST(t.n_all - p.n AS BIGINT) AS n_oof,
           CAST(t.pos_all - p.pos AS BIGINT) AS pos_oof,
           CAST(1000000 * (t.pos_all - p.pos) // (t.n_all - p.n) AS BIGINT)
             AS te_ppm
    FROM per_fold p JOIN cat_tot t USING (cat)
    """,
)
def fn_target_encode_oof_q(spark, sf_dir):
    """Out-of-fold target encoding — the leakage-free version of the
    classic leaky feature: each (category, fold) cell's encoding is the
    target rate computed from all OTHER folds (totals minus own fold —
    the complement trick, no per-fold rescan), with deterministic md5
    fold assignment so every engine and every retry produces the same
    folds.  A row's feature value is then a lookup on (its category, its
    fold) — train-time and serve-time agree by construction.  Rates in
    truncating ppm on exact counts.

    100 TB shape: one (cat, fold) hash agg (map-side collapsed to
    |cats|x5), the category totals re-join as a broadcast, and the
    complement arithmetic is codegen — the full encoder costs one
    aggregate regardless of fold count."""
    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("o_orderkey"), F.lit("tefold"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("fold"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    per_fold = base.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    cat_tot = per_fold.groupBy("cat").agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("pos").cast("long").alias("pos_all"),
    )
    return per_fold.join(F.broadcast(cat_tot), "cat").select(
        "cat",
        "fold",
        (F.col("n_all") - F.col("n")).cast("long").alias("n_oof"),
        (F.col("pos_all") - F.col("pos")).cast("long").alias("pos_oof"),
        F.expr(
            "CAST(1000000 * (pos_all - pos) DIV (n_all - n) AS BIGINT)"
        ).alias("te_ppm"),
    )


# --------------------------------------------------------------------------
# temporal_growth_accounting — new / retained / resurrected per period
# --------------------------------------------------------------------------
@register(
    "temporal_growth_accounting",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(CAST(FLOOR(epoch(ts)) AS BIGINT) // 21600 AS BIGINT)
               AS period
      FROM events
    ),
    tagged AS (
      SELECT user_id, period,
             lag(period) OVER (PARTITION BY user_id ORDER BY period)
               AS prev_period
      FROM active
    )
    SELECT period,
           CAST(SUM(CASE WHEN prev_period IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN prev_period = period - 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN prev_period IS NOT NULL
                          AND prev_period < period - 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM tagged GROUP BY period
    """,
)
def temporal_growth_accounting_q(spark, sf_dir):
    """Growth accounting (the new/retained/resurrected decomposition every
    growth team runs): each (user, period) activity row is classified by
    the user's PREVIOUS active period — first ever = new, consecutive =
    retained, gap = resurrected; churn is the complement (prev period's
    actives minus this period's retained, a consumer-side subtraction on
    this table).  Period = 6-hour epoch bucket sized to the synthetic
    span (production uses weeks).  `agg_retention_cohort` slices the
    same behavior by signup cohort; this slices it by calendar period —
    the two standard views of one retention truth.

    100 TB shape: one distinct on (user, period), one user-keyed lag
    window, one period-cardinality census — all on a single user-key
    exchange after the distinct."""
    active = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_timestamp("ts").cast("long") / 21600).cast("long").alias("period"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("period")
    tagged = active.select(
        "period", F.lag("period").over(w).alias("prev_period")
    )
    # flags via when/otherwise(0), NOT boolean casts: (NULL == x) is NULL,
    # and a period whose rows are ALL first-ever would sum to NULL where
    # the oracle's CASE..ELSE 0 gives 0 (found differentially)
    retained = F.when(F.col("prev_period") == F.col("period") - 1, 1).otherwise(0)
    resurrected = F.when(
        F.col("prev_period").isNotNull()
        & (F.col("prev_period") < F.col("period") - 1),
        1,
    ).otherwise(0)
    return tagged.groupBy("period").agg(
        F.sum(F.col("prev_period").isNull().cast("long")).cast("long").alias("n_new"),
        F.sum(retained).cast("long").alias("n_retained"),
        F.sum(resurrected).cast("long").alias("n_resurrected"),
        F.count(F.lit(1)).cast("long").alias("n_active"),
    )


# --------------------------------------------------------------------------
# eval_feature_chi2_cells — per-cell chi-square parts for feature screening
# --------------------------------------------------------------------------
@register(
    "eval_feature_chi2_cells",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    cells AS (
      SELECT cat, y, CAST(COUNT(*) AS BIGINT) AS obs
      FROM base GROUP BY cat, y
    ),
    row_tot AS (SELECT cat, CAST(SUM(obs) AS BIGINT) AS r FROM cells GROUP BY cat),
    col_tot AS (SELECT y, CAST(SUM(obs) AS BIGINT) AS c FROM cells GROUP BY y),
    n_tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
    SELECT cells.cat, CAST(cells.y AS BIGINT) AS y, cells.obs, rt.r, ct.c, nt.n,
           CAST((nt.n * cells.obs - rt.r * ct.c)
                * (nt.n * cells.obs - rt.r * ct.c) AS BIGINT) AS dev_sq_num,
           CAST(nt.n * rt.r * ct.c AS BIGINT) AS dev_sq_den
    FROM cells
    JOIN row_tot rt USING (cat) JOIN col_tot ct USING (y) CROSS JOIN n_tot nt
    """,
)
def eval_feature_chi2_cells_q(spark, sf_dir):
    """Per-cell chi-square contributions for categorical-feature screening
    — the multi-category generalization of `quality_ab_chi2_parts`'s 2x2:
    each (category, label) cell's deviation from independence as the
    exact pair (N·obs − r·c)² / (N·r·c) (the cell's chi2 contribution is
    num/(den·N) — summing the rationals is the consumer's job, and each
    CELL's num/den already ranks which category-label combinations carry
    the signal, which is what feature screening reads).  Bigger than
    int64?  No: obs ≤ N ~1.5e4 at sf0.01, num ≤ (N·obs)² ~ 5e16; at
    larger N the counts downscale to per-mille first (the chi2-parts
    doctrine).

    100 TB shape: one (cat, label) hash agg; row/col totals re-join as
    broadcasts; all arithmetic codegen."""
    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    cells = base.groupBy("cat", "y").agg(F.count(F.lit(1)).cast("long").alias("obs"))
    row_tot = cells.groupBy("cat").agg(F.sum("obs").cast("long").alias("r"))
    col_tot = cells.groupBy("y").agg(F.sum("obs").cast("long").alias("c"))
    n_tot = cells.agg(F.sum("obs").cast("long").alias("n"))
    dev = F.col("n") * F.col("obs") - F.col("r") * F.col("c")
    return (
        cells.join(F.broadcast(row_tot), "cat")
        .join(F.broadcast(col_tot), "y")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "cat",
            F.col("y").cast("long").alias("y"),
            "obs",
            "r",
            "c",
            "n",
            (dev * dev).cast("long").alias("dev_sq_num"),
            (F.col("n") * F.col("r") * F.col("c")).cast("long").alias("dev_sq_den"),
        )
    )


# --------------------------------------------------------------------------
# text_char_diversity — character-level entropy proxy without a log
# --------------------------------------------------------------------------
@register(
    "text_char_diversity",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
      FROM documents
    ),
    freq AS (
      SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS n
      FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           CAST(MAX(n) AS BIGINT) AS top_char_n,
           CAST(1000000 * MAX(n) // SUM(n) AS BIGINT) AS top_share_ppm,
           CAST(1000000 * COUNT(*) // SUM(n) AS BIGINT) AS diversity_ppm
    FROM freq GROUP BY doc_id
    """,
)
def text_char_diversity_q(spark, sf_dir):
    """Character-diversity profile — the log-free entropy proxy: distinct
    character count, the top character's share, and distinct-per-char
    ppm.  A doc whose top_share_ppm nears 1e6 is a run of one character
    (padding, corrupted decode); near-uniform bytes (encrypted/compressed
    blobs pasted as text) show maximal diversity with length — the
    cheap first-pass garbage screens that `text_quality_score`'s
    word-level features miss because they presume words exist.  Both
    engines split on the empty pattern identically (verified: same char
    arrays, same counts).

    100 TB shape: char explode is corpus-linear with tiny rows; the
    per-doc census collapses on (doc, char) map-side; at the corpus tier
    the explode swaps for an in-row aggregate over split(text, '') —
    same contract, zero shuffle."""
    chars = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    freq = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return freq.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.max("n").cast("long").alias("top_char_n"),
        F.expr("CAST(1000000 * max(n) DIV sum(n) AS BIGINT)").alias("top_share_ppm"),
        F.expr("CAST(1000000 * count(1) DIV sum(n) AS BIGINT)").alias(
            "diversity_ppm"
        ),
    )


# --------------------------------------------------------------------------
# pairs_contrastive_dataset — assembled positive/negative training pairs
# --------------------------------------------------------------------------
@register(
    "pairs_contrastive_dataset",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 30
    ),
    hashed AS (SELECT doc_id, sha256(text) AS h FROM corpus),
    groups AS (
      SELECT h, MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS sz
      FROM hashed GROUP BY h
    ),
    positives AS (
      SELECT g.rep AS anchor, x.doc_id AS partner, 1 AS label
      FROM groups g JOIN hashed x ON x.h = g.h AND x.doc_id <> g.rep
    ),
    n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM corpus),
    anchors AS (SELECT DISTINCT anchor FROM positives),
    ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS pos
      FROM corpus
    ),
    neg_draws AS (
      SELECT a.anchor, k.k,
             ('0x' || substring(md5(CAST(a.anchor AS VARCHAR) || '|'
                                    || CAST(k.k AS VARCHAR) || '|cp'), 1, 8))::BIGINT
               % nd.n AS pick
      FROM anchors a CROSS JOIN n_docs nd, generate_series(0, 1) k(k)
    ),
    negatives AS (
      SELECT d.anchor, r.doc_id AS partner, 0 AS label
      FROM neg_draws d
      JOIN ranked r ON r.pos = d.pick
      JOIN hashed ha ON ha.doc_id = d.anchor
      JOIN hashed hp ON hp.doc_id = r.doc_id
      WHERE ha.h <> hp.h
    )
    SELECT CAST(anchor AS BIGINT) AS anchor, CAST(partner AS BIGINT) AS partner,
           CAST(label AS BIGINT) AS label
    FROM positives
    UNION ALL
    SELECT CAST(anchor AS BIGINT), CAST(partner AS BIGINT), CAST(label AS BIGINT)
    FROM negatives
    """,
)
def pairs_contrastive_dataset_q(spark, sf_dir):
    """Contrastive training-pair assembly — the dataset constructor that
    composes the repo's primitives into (anchor, partner, label) rows:
    POSITIVES are within-duplicate-group pairs (each content group's
    min-id representative paired with its copies — the `dedup_exact_hash`
    groups turned into supervision), NEGATIVES are md5-ring draws per
    anchor (the `sample_negatives_hash` machinery, here over a dense
    RANK of the corpus rather than raw ids) with same-content draws
    rejected — a negative that is secretly a positive is the classic
    label-noise bug, filtered by hash equality, not id equality.

    100 TB shape: positives ride the dedup digest aggregate; negative
    draws are corpus-linear; the rank table is one sort; every join is
    keyed.  Hard-negative upgrades (draw from the anchor's LSH bucket
    instead of the whole ring) compose on the same skeleton."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 200).unionByName(
        docs.filter(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    ).localCheckpoint(eager=True)
    hashed = corpus.select("doc_id", F.sha2("text", 256).alias("h")).localCheckpoint(
        eager=True
    )
    groups = hashed.groupBy("h").agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).cast("long").alias("sz")
    )
    positives = (
        groups.join(hashed, "h")
        .filter(F.col("doc_id") != F.col("rep"))
        .select(
            F.col("rep").alias("anchor"),
            F.col("doc_id").alias("partner"),
            F.lit(1).cast("long").alias("label"),
        )
    )
    nd = corpus.agg(F.count(F.lit(1)).cast("long").alias("n"))
    anchors = positives.select("anchor").distinct()
    ranked = corpus.select(
        "doc_id", (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("pos")
    )
    neg_draws = (
        anchors.crossJoin(F.broadcast(nd))
        .select(
            "anchor",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
            "n",
        )
        .select(
            "anchor",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.col("anchor"), F.col("k"), F.lit("cp"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            ).alias("pick"),
        )
    )
    negatives = (
        neg_draws.join(ranked, neg_draws.pick == ranked.pos)
        .select("anchor", F.col("doc_id").alias("partner"))
        .join(hashed.select(F.col("doc_id").alias("anchor"), F.col("h").alias("ha")), "anchor")
        .join(hashed.select(F.col("doc_id").alias("partner"), F.col("h").alias("hp")), "partner")
        .filter(F.col("ha") != F.col("hp"))
        .select("anchor", "partner", F.lit(0).cast("long").alias("label"))
    )
    return positives.unionByName(negatives)


# --------------------------------------------------------------------------
# dedup_cluster_size_profile — the post-clustering sanity histogram
# --------------------------------------------------------------------------
@register(
    "dedup_cluster_size_profile",
    oracle="""
    WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
    pairs AS (
      SELECT doc_id AS a, doc_id + 10000 AS b FROM ids WHERE doc_id < 30
      UNION ALL
      SELECT doc_id + 10000, doc_id + 20000 FROM ids WHERE doc_id < 15
      UNION ALL
      SELECT doc_id + 20000, doc_id + 30000 FROM ids WHERE doc_id < 5
    ),
    sym AS (
      SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
    ),
    reach AS (
      SELECT x AS node, x AS r FROM sym
      UNION
      SELECT s.x, reach.r FROM sym s JOIN reach ON reach.node = s.y
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
      FROM comp GROUP BY component
    )
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_members
    FROM sizes GROUP BY sz
    """,
)
def dedup_cluster_size_profile_q(spark, sf_dir):
    """Duplicate-cluster size histogram — the sanity check every
    clustering dedup run reads FIRST: a healthy near-dup graph yields
    many small clusters; one giant component means the candidate
    generator (LSH bands too aggressive, shingle width too small)
    glued the corpus together and keep-one-per-group is about to delete
    it.  Runs the same min-label closure as `dedup_connected_components`
    over the planted chain graph (sizes 2, 3, and 4 by construction) and
    histograms the component sizes.

    100 TB shape: closure cost is the components operator's (documented
    there); the histogram is two tiny hash aggs on top — the profile is
    effectively free relative to the closure it audits."""
    from ..plans.graph_query import connected_components

    ids = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))
    link = lambda n, off_a, off_b: ids.filter(F.col("doc_id") < n).select(  # noqa: E731
        (F.col("doc_id") + off_a).alias("a"), (F.col("doc_id") + off_b).alias("b")
    )
    pairs = link(30, 0, 10000).unionByName(link(15, 10000, 20000)).unionByName(
        link(5, 20000, 30000)
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_members"),
    )


# --------------------------------------------------------------------------
# text_mojibake_detector — encoding-corruption screen
# --------------------------------------------------------------------------
@register(
    "text_mojibake_detector",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000,
             replace(replace(text, 'a', 'Ã¡'), 'e', 'â€™')
      FROM documents WHERE doc_id < 12
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(text,
             '(Ã.|â€.|Â.|ï¿½)')) AS BIGINT) AS n_mojibake,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(1000000 * len(regexp_extract_all(text, '(Ã.|â€.|Â.|ï¿½)'))
           // greatest(length(text), 1) AS BIGINT) AS mojibake_ppm,
      1000000 * len(regexp_extract_all(text, '(Ã.|â€.|Â.|ï¿½)'))
           // greatest(length(text), 1) >= 10000 AS looks_corrupted
    FROM corpus
    """,
)
def text_mojibake_detector_q(spark, sf_dir):
    """Mojibake (encoding-corruption) screen: counts the classic
    double-encoded UTF-8 signatures — 'Ã'+continuation, 'â€'+punct,
    'Â'+char, and the replacement char — that appear when a crawl
    pipeline decodes UTF-8 bytes as Latin-1 and re-encodes; flagged at
    1% density.  Planted corrupted twins (the replace() chain simulates
    the double-encode on real docs) make the gate's positive class
    non-trivial.  This is the encoding facet of the quality family:
    `text_char_diversity` catches statistical garbage, this catches the
    specific, extremely common crawl pathology by its fingerprint.

    100 TB shape: one regexp_extract_all riding the scan — zero
    shuffles; at corpus tier the flag becomes a routed-write partition
    column like every boolean screen."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 12).select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.regexp_replace(
                F.regexp_replace("text", "a", "Ã¡"), "e", "â€™"
            ).alias("text"),
        )
    )
    pat = "(Ã.|â€.|Â.|ï¿½)"
    n_moj = F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)"))
    ppm = F.expr(
        f"1000000 * size(regexp_extract_all(text, '{pat}', 0))"
        " DIV greatest(length(text), 1)"
    )
    return corpus.select(
        "doc_id",
        n_moj.cast("long").alias("n_mojibake"),
        F.length("text").cast("long").alias("n_chars"),
        ppm.cast("long").alias("mojibake_ppm"),
        (ppm >= 10000).alias("looks_corrupted"),
    )


# --------------------------------------------------------------------------
# dedup_blocker_union_audit — the three ER blockers, unioned with provenance
# --------------------------------------------------------------------------
@register(
    "dedup_blocker_union_audit",
    oracle="""
    WITH corpus AS ({corpus}),
    norm AS (
      SELECT doc_id, lower(trim(text)) AS t,
             substr(lower(trim(text)), 1, 12) AS pfx,
             regexp_extract(lower(text), '[a-z]+', 0) AS tok
      FROM corpus
    ),
    prefix_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM norm a JOIN norm b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
      WHERE levenshtein(a.t, b.t) <= 4
    ),
    ranked AS (
      SELECT doc_id, t, row_number() OVER (ORDER BY t, doc_id) AS rnk
      FROM norm
    ),
    window_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ranked a JOIN ranked b
        ON b.rnk > a.rnk AND b.rnk <= a.rnk + 10
      WHERE levenshtein(a.t, b.t) <= 4
    ),
    keyed AS (
      SELECT doc_id, t, {pkey} AS pkey FROM norm WHERE tok <> ''
    ),
    phonetic_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM keyed a JOIN keyed b ON a.pkey = b.pkey AND a.doc_id < b.doc_id
      WHERE levenshtein(a.t, b.t) <= 4
    ),
    unioned AS (
      SELECT id_a, id_b, 1 AS by_prefix, 0 AS by_window, 0 AS by_phonetic
      FROM prefix_pairs
      UNION ALL
      SELECT id_a, id_b, 0, 1, 0 FROM window_pairs
      UNION ALL
      SELECT id_a, id_b, 0, 0, 1 FROM phonetic_pairs
    ),
    merged AS (
      SELECT id_a, id_b,
             CAST(MAX(by_prefix) AS BIGINT) AS by_prefix,
             CAST(MAX(by_window) AS BIGINT) AS by_window,
             CAST(MAX(by_phonetic) AS BIGINT) AS by_phonetic
      FROM unioned GROUP BY id_a, id_b
    )
    SELECT CAST(by_prefix AS BIGINT) AS by_prefix,
           CAST(by_window AS BIGINT) AS by_window,
           CAST(by_phonetic AS BIGINT) AS by_phonetic,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM merged GROUP BY by_prefix, by_window, by_phonetic
    """.format(corpus=_SNM_CORPUS_SQL, pkey=_phonetic_sql_duck("tok")),
)
def dedup_blocker_union_audit_q(spark, sf_dir):
    """The three-blocker union, audited: every near-dup pair (levenshtein
    <= 4 on the shared planted-edit corpus) found by the prefix bucket,
    the sorted window, or the phonetic key, rolled up by PROVENANCE
    PATTERN — the 7-cell census that turns 'production ER runs several
    blockers and unions' from folklore into a measured coverage claim
    (cells with exactly one flag set are pairs the other two blockers
    MISS; an empty single-blocker cell would mean that blocker is
    redundant on this corpus).  The `dedup_lsh_banding_audit` doctrine
    applied across blocker FAMILIES instead of within one family's knob.

    100 TB shape: each blocker keeps its own documented candidate
    economics; the union is a (pair)-keyed MAX-merge of flag rows —
    candidates only, never all-pairs; the census is an 8-cell map-side
    fold."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 300)
    edited = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    norm = base.unionByName(edited).select(
        "doc_id",
        F.lower(F.trim(F.col("text"))).alias("t"),
        F.substring(F.lower(F.trim(F.col("text"))), 1, 12).alias("pfx"),
        F.regexp_extract(F.lower("text"), "[a-z]+", 0).alias("tok"),
    ).localCheckpoint(eager=True)

    a_cols = lambda df, extra: df.select(  # noqa: E731
        F.col("doc_id").alias("id_a"), F.col("t").alias("ta"), *extra
    )
    b_cols = lambda df, extra: df.select(  # noqa: E731
        F.col("doc_id").alias("id_b"), F.col("t").alias("tb"), *extra
    )
    lev_ok = F.levenshtein("ta", "tb") <= 4

    prefix_pairs = (
        a_cols(norm, [F.col("pfx")])
        .join(b_cols(norm, [F.col("pfx")]), "pfx")
        .filter((F.col("id_a") < F.col("id_b")) & lev_ok)
        .select("id_a", "id_b")
    )
    ranked = norm.select(
        "doc_id", "t", F.row_number().over(Window.orderBy("t", "doc_id")).alias("rnk")
    )
    w = 10
    left = ranked.select(
        F.col("doc_id").alias("id_a"),
        F.col("t").alias("ta"),
        F.col("rnk").alias("ra"),
        F.explode(
            F.array((F.col("rnk") / w).cast("long"), (F.col("rnk") / w + 1).cast("long"))
        ).alias("bucket"),
    )
    right = ranked.select(
        F.col("doc_id").alias("id_b"),
        F.col("t").alias("tb"),
        F.col("rnk").alias("rb"),
        (F.col("rnk") / w).cast("long").alias("bucket"),
    )
    window_pairs = (
        left.join(right, "bucket")
        .filter((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + w) & lev_ok)
        .select("id_a", "id_b")
    )
    digits = F.col("tok")
    for pat, rep in _PHONETIC_CLASSES:
        digits = F.regexp_replace(digits, pat, rep)
    digits = F.regexp_replace(digits, "[aeiouyhw]", "")
    for d in "123456":
        digits = F.regexp_replace(digits, d + d + "+", d)
    keyed = norm.filter(F.col("tok") != "").select(
        "doc_id",
        "t",
        F.concat(
            F.substring("tok", 1, 1), F.rpad(F.substring(digits, 2, 3), 3, "0")
        ).alias("pkey"),
    )
    phonetic_pairs = (
        a_cols(keyed, [F.col("pkey")])
        .join(b_cols(keyed, [F.col("pkey")]), "pkey")
        .filter((F.col("id_a") < F.col("id_b")) & lev_ok)
        .select("id_a", "id_b")
    )

    def tag(df, p, wdw, ph):
        return df.select(
            "id_a",
            "id_b",
            F.lit(p).cast("long").alias("by_prefix"),
            F.lit(wdw).cast("long").alias("by_window"),
            F.lit(ph).cast("long").alias("by_phonetic"),
        )

    unioned = (
        tag(prefix_pairs, 1, 0, 0)
        .unionByName(tag(window_pairs, 0, 1, 0))
        .unionByName(tag(phonetic_pairs, 0, 0, 1))
    )
    merged = unioned.groupBy("id_a", "id_b").agg(
        F.max("by_prefix").cast("long").alias("by_prefix"),
        F.max("by_window").cast("long").alias("by_window"),
        F.max("by_phonetic").cast("long").alias("by_phonetic"),
    )
    return merged.groupBy("by_prefix", "by_window", "by_phonetic").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
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
# temporal_dwell_time — forward-gap dwell attributed to the current state
# --------------------------------------------------------------------------
@register(
    "temporal_dwell_time",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(CAST(FLOOR(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - CAST(FLOOR(epoch(ts)) AS BIGINT) AS dwell_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(dwell_s) AS BIGINT) AS sum_dwell_s,
           CAST(MIN(dwell_s) AS BIGINT) AS min_dwell_s,
           CAST(MAX(dwell_s) AS BIGINT) AS max_dwell_s
    FROM seq WHERE dwell_s IS NOT NULL
    GROUP BY event_type
    """,
)
def temporal_dwell_time_q(spark, sf_dir):
    """Dwell-time profile: the forward gap (time until the user's NEXT
    event) attributed to the CURRENT event's type — 'how long do users
    stay on X' — the mirror of `temporal_interarrival_profile`, which
    attributes the same gap backward to the ARRIVING event; the two
    directions answer different product questions from the same window
    pass and the attribution direction is stated, not implicit.  Last
    events have no forward gap and drop (open sessions are unmeasurable
    dwell — documented, not zero-filled).

    100 TB shape: one lead() on the user-key exchange; type-cardinality
    rollup map-side."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts").cast("long")
    seq = _t(spark, sf_dir, "events").select(
        "event_type", (F.lead(sec).over(w) - sec).alias("dwell_s")
    )
    return seq.filter(F.col("dwell_s").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dwell_s").cast("long").alias("sum_dwell_s"),
        F.min("dwell_s").alias("min_dwell_s"),
        F.max("dwell_s").alias("max_dwell_s"),
    )


# --------------------------------------------------------------------------
# join_interval_overlap_duration — duration-weighted co-occurrence
# --------------------------------------------------------------------------
@register(
    "join_interval_overlap_duration",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT) + 60 + (event_id % 10) * 60 AS e
      FROM events WHERE user_id < 12
    )
    SELECT CAST(a.user_id AS BIGINT) AS user_a,
           CAST(b.user_id AS BIGINT) AS user_b,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
             AS overlap_s
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id
     AND a.s < b.e AND b.s < a.e
    GROUP BY a.user_id, b.user_id
    """,
)
def join_interval_overlap_duration_q(spark, sf_dir):
    """Duration-weighted co-occurrence: for every cross-user pair of
    overlapping activity intervals, the exact overlap SECONDS
    (min(end) − max(start)) summed per user pair — co-viewing /
    co-presence time, the measure `join_interval_overlap`'s boolean
    pairing can't express (two users overlapping 100 times for 1 s are
    not the pair overlapping once for an hour).  The ORACLE states the
    theta-join; the ENGINE buckets time at the max interval span and
    fans BOTH intervals over their covered
    buckets; every overlapping pair meets in the bucket owning max(start)
    — a bucket both fans contain, since max(start) lies inside both
    intervals — so each pair counts exactly once (the owner-bucket rule on
    the TIME axis; a single-bucket side would miss pairs whose later start
    falls past that bucket — found differentially).

    100 TB shape: keyed equi-join on time buckets with span/bucket-width
    fanout, never the quadratic interval cross product; per-bucket skew
    = concurrent-interval density, the operator's honest hot spot."""
    sec = F.unix_timestamp("ts").cast("long")
    iv = _t(spark, sf_dir, "events").filter(F.col("user_id") < 12).select(
        "user_id",
        "event_id",
        sec.alias("s"),
        (sec + 60 + (F.col("event_id") % 10) * 60).alias("e"),
    )
    width = 660  # max interval length: 60 + 9*60
    # BOTH sides fan over their covered buckets; the pair is counted only
    # in the bucket owning max(start) — which both fans contain (max(start)
    # lies inside both intervals), so each pair meets exactly once.  A
    # single-bucket right side MISSES pairs whose later start falls in a
    # later bucket than the right's own start (found differentially).
    def fan(df, who):
        return df.select(
            F.col("user_id").alias(f"user_{who}"),
            F.col("s").alias(f"s{who}"),
            F.col("e").alias(f"e{who}"),
            F.explode(
                F.sequence(
                    (F.col("s") / width).cast("long"),
                    (F.col("e") / width).cast("long"),
                )
            ).alias("bucket"),
        )

    pairs = (
        fan(iv, "a").join(fan(iv, "b"), "bucket")
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("sa") < F.col("eb"))
            & (F.col("sb") < F.col("ea"))
            & ((F.greatest("sa", "sb") / width).cast("long") == F.col("bucket"))
        )
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlaps"),
        F.sum(F.least("ea", "eb") - F.greatest("sa", "sb"))
        .cast("long")
        .alias("overlap_s"),
    )


# --------------------------------------------------------------------------
# sample_rolling_origin_folds — time-series cross-validation folds
# --------------------------------------------------------------------------
@register(
    "sample_rolling_origin_folds",
    oracle="""
    WITH ranked AS (
      SELECT event_id, ts,
             row_number() OVER (ORDER BY ts, event_id) AS rnk,
             COUNT(*) OVER () AS n
      FROM events
    ),
    folds AS (
      SELECT f.fold, r.event_id, r.ts, r.rnk, r.n,
             CASE WHEN r.rnk <= (2 + f.fold) * r.n // 5 THEN 'train'
                  WHEN r.rnk <= (3 + f.fold) * r.n // 5 THEN 'test'
                  ELSE NULL END AS role
      FROM ranked r, generate_series(0, 2) f(fold)
    )
    SELECT CAST(fold AS BIGINT) AS fold, role,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS BIGINT) AS min_ts_s,
           CAST(MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS BIGINT) AS max_ts_s
    FROM folds WHERE role IS NOT NULL
    GROUP BY fold, role
    """,
)
def sample_rolling_origin_folds_q(spark, sf_dir):
    """Rolling-origin (expanding-window) cross-validation folds — the
    time-series CV methodology: fold f trains on the first (2+f)/5 of
    the timeline and tests on the next fifth, so every fold's test
    period follows its training period (k-fold's random assignment is
    exactly the leakage `sample_split_chronological` forbids; this is
    its k-fold generalization).  Integer rank cutoffs ((2+f)·n//5) make
    fold boundaries exact; per-(fold, role) time bounds expose the
    max(train) <= min(test) invariant for EVERY fold.

    100 TB shape: ONE time-rank sort shared by all folds (the fold fan
    is a 3-way explode over the ranked rows, each fold a CASE over the
    same rank); production swaps the exact rank for approx time-quantile
    cuts and keeps this path as the audit tier."""
    w = Window.orderBy("ts", "event_id")
    ranked = _t(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    folds = ranked.select(
        "event_id",
        "ts",
        "rnk",
        "n",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("fold"),
    ).select(
        F.col("fold").cast("long").alias("fold"),
        "ts",
        F.when(
            F.col("rnk") <= F.expr("(2 + fold) * n DIV 5"), F.lit("train")
        )
        .when(F.col("rnk") <= F.expr("(3 + fold) * n DIV 5"), F.lit("test"))
        .otherwise(F.lit(None))
        .alias("role"),
    )
    return folds.filter(F.col("role").isNotNull()).groupBy("fold", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(F.unix_timestamp("ts").cast("long")).alias("min_ts_s"),
        F.max(F.unix_timestamp("ts").cast("long")).alias("max_ts_s"),
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
# text_sentence_repetition — intra-document repeated-sentence screen
# --------------------------------------------------------------------------
@register(
    "text_sentence_repetition",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000,
             text || '. ' || text || '. ' || text
      FROM documents WHERE doc_id < 8
    ),
    sents AS (
      SELECT doc_id, trim(s) AS sent
      FROM corpus, unnest(string_split_regex(text, '[.!?]+')) t(s)
      WHERE trim(s) <> ''
    ),
    freq AS (
      SELECT doc_id, sent, CAST(COUNT(*) AS BIGINT) AS n
      FROM sents GROUP BY doc_id, sent
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_sents,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_sents,
           CAST(MAX(n) AS BIGINT) AS max_repeat,
           CAST(1000000 * (SUM(n) - COUNT(*)) // SUM(n) AS BIGINT)
             AS repeated_ppm
    FROM freq GROUP BY doc_id
    """,
)
def text_sentence_repetition_q(spark, sf_dir):
    """Intra-document sentence-repetition screen: sentences (punctuation
    splits) censused per doc — max repeat count and the share of
    sentences that are re-occurrences — catching copy-paste loops and
    template stuffing at SENTENCE granularity, between
    `text_repetition_filter`'s n-gram window and
    `dedup_remove_segments`' cross-document spans (the three
    granularities catch different generators).  Planted triple-repeat
    twins make the positive class exact: a doc repeated 3x shows
    repeated_ppm ≈ 2/3e6.

    100 TB shape: sentence explode is corpus-linear; the per-(doc, sent)
    census collapses map-side (sentence strings are short and
    doc-scoped); the rollup is per-doc."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 8).select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat_ws(". ", "text", "text", "text").alias("text"),
        )
    )
    sents = corpus.select(
        "doc_id",
        F.explode(F.split("text", "[.!?]+")).alias("s"),
    ).select("doc_id", F.trim("s").alias("sent")).filter(F.col("sent") != "")
    freq = sents.groupBy("doc_id", "sent").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return freq.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_sents"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_sents"),
        F.max("n").cast("long").alias("max_repeat"),
        F.expr(
            "CAST(1000000 * (sum(n) - count(1)) DIV sum(n) AS BIGINT)"
        ).alias("repeated_ppm"),
    )


# --------------------------------------------------------------------------
# quality_event_order_audit — ingestion-order vs event-time inversions
# --------------------------------------------------------------------------
@register(
    "quality_event_order_audit",
    oracle="""
    WITH corrupted AS (
      -- planted disorder: every 97th ingestion id arrives with its clock
      -- 1 h behind (the replay/skew signature the audit exists to catch)
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - CASE WHEN event_id % 97 = 0 THEN 3600 ELSE 0 END AS t
      FROM events
    ),
    seq AS (
      SELECT user_id, t,
             lag(t) OVER (PARTITION BY user_id ORDER BY event_id) AS pt
      FROM corrupted
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_steps,
           CAST(SUM(CASE WHEN t < pt THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inversions,
           CAST(MAX(CASE WHEN t < pt THEN pt - t ELSE 0 END) AS BIGINT)
             AS max_backstep_s
    FROM seq WHERE pt IS NOT NULL
    GROUP BY user_id
    HAVING SUM(CASE WHEN t < pt THEN 1 ELSE 0 END) > 0
    """,
)
def quality_event_order_audit_q(spark, sf_dir):
    """Ingestion-order audit: per user, adjacent INVERSIONS between the
    assigned event_id order (ingestion sequence) and event time — a
    producer whose ids advance while timestamps go backward is a clock
    skew / buffering / replay bug, and it silently breaks every operator
    whose contract is time-ordered ingestion (the boundary-stitched
    streaming maintainers state exactly that contract; THIS is the audit
    that checks the data honors it).  Only offending users are emitted,
    with the worst backstep magnitude.  The synthetic corpus is perfectly
    ordered, so the gate PLANTS the pathology (every 97th ingestion id
    shifted 1 h back) — a 0-row audit gate would verify nothing.

    100 TB shape: one lag over the user-key exchange, flags fold
    map-side, output is offender-cardinality."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    sec = F.unix_timestamp("ts").cast("long") - F.when(
        F.col("event_id") % 97 == 0, F.lit(3600)
    ).otherwise(F.lit(0))
    seq = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        sec.alias("t"),
        F.lag(sec).over(w).alias("pt"),
    ).filter(F.col("pt").isNotNull())
    inv = F.when(F.col("t") < F.col("pt"), 1).otherwise(0)
    back = F.when(F.col("t") < F.col("pt"), F.col("pt") - F.col("t")).otherwise(0)
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_steps"),
            F.sum(inv).cast("long").alias("n_inversions"),
            F.max(back).cast("long").alias("max_backstep_s"),
        )
        .filter(F.col("n_inversions") > 0)
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
