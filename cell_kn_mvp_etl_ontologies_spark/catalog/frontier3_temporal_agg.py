"""Round-7 extension surface, part 4 of 4 (split from frontier3.py per
VERDICT r12 #7 — zero behavior change, sections moved verbatim): the
TEMPORAL / WAREHOUSE-AGG / JOIN families — concentration (Gini, HHI,
Lorenz, Pareto), star rollup (+ maintainer), Markov transitions and
trigrams (+ boundary-stitched maintainers), seasonal/inter-arrival/
dwell/heatmap/autocorrelation/WoW/local-peaks/LTTB profiles, interval
coalesce + overlap-duration, RFM, cohort LTV, aging buckets, session
bounce/paths, top-k pivot, association rules, attribution (+ lookback
sweep), growth accounting, as-of tolerance join, point-in-time features,
OOF target encoding, new-entity curve.  Shared doctrines in
frontier3.py's hub docstring."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import commit_state_parquet, load_table, read_state_parquet
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
        commit_state_parquet(merged, state_path)

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
            commit_state_parquet(frame, path)

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
            commit_state_parquet(frame, path)

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


