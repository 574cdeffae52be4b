"""Round-7 continuation batch 2: Pareto skyline, prefix-filtered set
similarity join, and further analytics-frontier operators — each with an
exactly-equivalent DuckDB oracle (integer quantization keeps every score
bit-exact across engines; see catalog/__init__ cross-engine rules).

These extend the SURVEY §2.12/§2.13 training-data / analytics surface
beyond the reference's own operator set (the brief's "operations a
large-scale training-data pipeline would need"):

- skyline_pareto is the multi-objective dominance filter (Börzsönyi et
  al., ICDE 2001) every data-curation tradeoff screen needs (quality vs
  length, cost vs coverage).  The engine-side plan is the O(n log n)
  sort-sweep expressed as two window passes — NOT the quadratic
  NOT-EXISTS the oracle uses, so the gate proves the sweep equals the
  definition.
- join_set_similarity_prefix is the AllPairs/PPJoin prefix filter
  (Bayardo et al., WWW 2007): candidate pairs are generated ONLY from the
  rare-token prefixes of each document's shingle set, never from the full
  inverted index, and verification is an exact integer Jaccard test.  The
  oracle computes the FULL shared-shingle join, so the gate proves the
  prefix filter is lossless at threshold t.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import commit_state_parquet, load_table, read_state_parquet
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# skyline_pareto — multi-objective dominance frontier via window sort-sweep
# --------------------------------------------------------------------------
# Shared by the batch sweep and the streaming maintainer
# (`stream_skyline_maintain`): one oracle constant pins the window sweep
# and the skyline-of-skylines merge chain mutually equal.
_SKYLINE_ORACLE = """
    WITH base AS (
      SELECT p_brand AS brand, CAST(p_partkey AS BIGINT) AS p_partkey,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT brand, p_partkey, price_c, size
    FROM base a
    WHERE NOT EXISTS (
      SELECT 1 FROM base b
      WHERE b.brand = a.brand
        AND b.price_c <= a.price_c AND b.size <= a.size
        AND (b.price_c < a.price_c OR b.size < a.size)
    )
    """


def _pareto_sweep(base):
    """O(n log n) two-window dominance sweep over (brand, p_partkey,
    price_c, size): a row survives iff no strictly-cheaper same-brand row
    has size <= its size and no same-price row has strictly smaller size."""
    w_cheaper = (
        Window.partitionBy("brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_price = Window.partitionBy("brand", "price_c")
    flagged = base.select(
        "brand",
        "p_partkey",
        "price_c",
        "size",
        F.min("size").over(w_cheaper).alias("min_size_cheaper"),
        F.min("size").over(w_same_price).alias("min_size_same"),
    )
    return flagged.filter(
        (F.col("min_size_cheaper").isNull() | (F.col("min_size_cheaper") > F.col("size")))
        & (F.col("min_size_same") >= F.col("size"))
    ).select("brand", "p_partkey", "price_c", "size")


@register("skyline_pareto", oracle=_SKYLINE_ORACLE)
def skyline_pareto_q(spark, sf_dir):
    """Per-brand Pareto skyline of parts minimizing (price, size) — the
    multi-objective screen a curation pipeline runs to shortlist
    non-dominated tradeoffs (no other same-brand part is <= on both
    objectives and < on one).  The ORACLE states the quadratic dominance
    definition (NOT EXISTS over all pairs); the ENGINE runs the
    O(n log n) sort-sweep instead: after ordering by price, a part is
    dominated iff some strictly-cheaper part has size <= its size
    (running-min window with RANGE ... 1 PRECEDING) or some same-price
    part has strictly smaller size (per-(brand,price) min) — so the gate
    proves the sweep implements the definition.  Exactly-equal duplicate
    points dominate nothing and survive together, matching NOT EXISTS.

    100 TB shape: one exchange on the skyline group key, two window
    passes over each group's sort — never the pairwise self-join.  For
    ungrouped skylines the classic distributed recipe (partition-local
    sweep, then a sweep over the survivor union — dominance is
    transitive so local losers can't be global winners) drops in via the
    same operator applied twice.
    """
    base = _t(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    return _pareto_sweep(base)


# --------------------------------------------------------------------------
# join_set_similarity_prefix — AllPairs/PPJoin prefix-filtered Jaccard join
# --------------------------------------------------------------------------
_SSJ_T_NUM, _SSJ_T_DEN = 7, 10  # Jaccard threshold t = 0.7 as an exact rational


@register(
    "join_set_similarity_prefix",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tl
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id,
             tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] || ' ' || tl[i+3] AS shingle
      FROM toks, generate_series(1, 4000) t(i)
      WHERE i + 3 <= len(tl)
    ),
    sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY id),
    common AS (
      SELECT x.id AS a, y.id AS b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
      GROUP BY x.id, y.id
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           n_inter, sa.n AS n_a, sb.n AS n_b
    FROM common
    JOIN sizes sa ON sa.id = a
    JOIN sizes sb ON sb.id = b
    WHERE 10 * n_inter >= 7 * (sa.n + sb.n - n_inter)
    """,
)
def join_set_similarity_prefix_q(spark, sf_dir):
    """Set-similarity self-join (word-4-shingle Jaccard >= 0.7) with
    AllPairs prefix filtering (Bayardo et al., WWW 2007): order every
    document's shingle set by GLOBAL rarity (freq asc, shingle asc), keep
    only the first |d| - ceil(t*|d|) + 1 shingles as the "prefix", and
    generate candidate pairs ONLY from prefix-shingle collisions — any
    pair with Jaccard >= t must collide there, so the filter is lossless.
    Candidates then pass a length filter (t*max <= min, exact integers)
    and exact verification (10*inter >= 7*union — rational threshold, no
    floats anywhere).  The ORACLE joins the FULL shingle index (every
    shared shingle), so a hash-match proves losslessness, not just
    plausibility.

    100 TB shape: the full-index join's fanout is sum over shingles of
    df(s)^2 — quadratic in the document frequency of COMMON shingles; the
    prefix join touches only each doc's rarest (1-t)|d|+1 shingles, where
    df is by construction small, which is THE published scale fix for
    similarity self-joins.  The rarity ranking is a dimension build
    (shingle -> rank) joined back shuffle-wise; its global row_number
    sort is over the distinct-shingle dim, not the corpus.
    """
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("id"),
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
        ).alias("tl"),
    )
    sh = (
        docs.filter(F.size("tl") >= 4)
        .select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tl) - 3),"
                    " i -> concat_ws(' ', tl[i-1], tl[i], tl[i+1], tl[i+2]))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    # Global rarity order over the distinct-shingle dimension (not the corpus).
    rank = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "shingle",
            F.row_number().over(Window.orderBy("df", "shingle")).alias("rnk"),
        )
    )
    ranked = sh.join(rank, "shingle").select("id", "rnk")
    # Per-doc sorted rank-set; n derived here (no second join against a
    # sizes aggregate — one exchange instead of two).  Verification later
    # intersects these arrays codegen-side instead of re-exploding the
    # inverted index into a per-pair shuffle.
    # Persisted: consumed three times (prefix explode + both verify sides);
    # without the barrier each consumer re-derives the index build.  At
    # 100 TB this is the StorageLevel.DISK_ONLY materialization of the
    # sorted-set dim every published AllPairs implementation keeps.
    docs_sorted = ranked.groupBy("id").agg(
        F.sort_array(F.collect_list("rnk")).alias("rnks"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).persist()
    # prefix length = n - ceil(t*n) + 1, ceil as exact integer arithmetic
    pre = docs_sorted.select(
        "id",
        "n",
        F.explode(
            F.slice(
                "rnks",
                F.lit(1),
                (
                    F.col("n")
                    - F.floor((_SSJ_T_NUM * F.col("n") + _SSJ_T_DEN - 1) / _SSJ_T_DEN)
                    + 1
                ).cast("int"),
            )
        ).alias("rnk"),
    )
    pa = pre.select(F.col("id").alias("a"), F.col("n").alias("n_a"), "rnk")
    pb = pre.select(F.col("id").alias("b"), F.col("n").alias("n_b"), "rnk")
    cand = (
        pa.join(pb, "rnk")
        .filter(
            (F.col("a") < F.col("b"))
            & (
                _SSJ_T_DEN * F.least("n_a", "n_b")
                >= _SSJ_T_NUM * F.greatest("n_a", "n_b")
            )
        )
        .select("a", "b", "n_a", "n_b")
        .distinct()
    )
    ra = docs_sorted.select(F.col("id").alias("a"), F.col("rnks").alias("rnks_a"))
    rb = docs_sorted.select(F.col("id").alias("b"), F.col("rnks").alias("rnks_b"))
    inter = (
        cand.join(ra, "a")
        .join(rb, "b")
        .select(
            "a",
            "b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("rnks_a", "rnks_b")).cast("long").alias("n_inter"),
        )
    )
    return inter.filter(
        _SSJ_T_DEN * F.col("n_inter")
        >= _SSJ_T_NUM * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    ).select("a", "b", "n_inter", "n_a", "n_b")


# --------------------------------------------------------------------------
# graph_hits — integer-scaled HITS hubs/authorities (L1-normalized)
# --------------------------------------------------------------------------
_HITS_SCALE = 1_000_000  # micro-units; bounds every product under int64


def _hits_norm_sql(raw, out):
    return (
        f"{out} AS (SELECT node, raw * {_HITS_SCALE} // "
        f"(SELECT SUM(raw) FROM {raw}) AS units FROM {raw})"
    )


@register(
    "graph_hits",
    oracle="""
    WITH e AS (
      SELECT DISTINCT CAST(l_orderkey % 1000 AS BIGINT) AS src,
                      CAST(100000 + l_partkey % 1000 AS BIGINT) AS dst
      FROM lineitem WHERE l_orderkey % 7 = 0
    ),
    h0 AS (SELECT src AS node, CAST({S} AS BIGINT) AS units
           FROM (SELECT DISTINCT src FROM e)),
    ra1 AS (SELECT dst AS node, SUM(h0.units) AS raw
            FROM e JOIN h0 ON h0.node = e.src GROUP BY dst),
    {A1},
    rh1 AS (SELECT src AS node, SUM(a1.units) AS raw
            FROM e JOIN a1 ON a1.node = e.dst GROUP BY src),
    {H1},
    ra2 AS (SELECT dst AS node, SUM(h1.units) AS raw
            FROM e JOIN h1 ON h1.node = e.src GROUP BY dst),
    {A2}
    SELECT node, 'hub' AS kind, CAST(units AS BIGINT) AS units FROM h1
    UNION ALL
    SELECT node, 'auth' AS kind, CAST(units AS BIGINT) AS units FROM a2
    """.format(
        S=_HITS_SCALE,
        A1=_hits_norm_sql("ra1", "a1"),
        H1=_hits_norm_sql("rh1", "h1"),
        A2=_hits_norm_sql("ra2", "a2"),
    ),
)
def graph_hits_q(spark, sf_dir):
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) on the order->part
    bipartite graph, the eigenvector companion of `graph_pagerank`:
    authority := in-sum of hub scores, hub := out-sum of authority scores,
    alternating.  The float algorithm L2-normalizes (a sqrt — not
    hash-gateable); this implementation uses the L1-normalized variant
    with the pagerank_integer doctrine: scores are BIGINT micro-units,
    each normalization is units = raw * SCALE // sum(raw) (truncating
    div), so every update is reduction-order-free and the oracle can
    unroll the identical three half-steps (a1, h1, a2) as CTEs.

    100 TB shape: per iteration two keyed equi-join + aggregate shuffles
    (edge list never materialized per-pair beyond its own size) and ONE
    scalar broadcast (the L1 norm) attached via 1-row crossJoin — the
    text_bm25_topk corpus-stats pattern.  Iteration count is a bounded
    hyperparameter, the bounded-driver-loop doctrine.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    e = li.select(
        (F.col("l_orderkey") % 1000).cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1000).cast("long").alias("dst"),
    ).distinct().localCheckpoint(eager=True)
    h = e.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(_HITS_SCALE).cast("long").alias("units")
    )

    def _half_step(scores, edge_key, group_key):
        # localCheckpoint truncates the per-iteration lineage (the
        # pagerank_integer / dedup_connected_components doctrine) — without
        # it each half-step re-derives every predecessor and the plan's
        # exchange count grows with the iteration count.
        raw = (
            e.join(scores, e[edge_key] == scores["node"])
            .groupBy(F.col(group_key).alias("node"))
            .agg(F.sum("units").alias("raw"))
        )
        total = raw.agg(F.sum("raw").alias("total"))
        return (
            raw.crossJoin(F.broadcast(total))
            .select(
                "node",
                F.expr(f"raw * {_HITS_SCALE} DIV total").cast("long").alias("units"),
            )
            .localCheckpoint(eager=True)
        )

    a1 = _half_step(h, "src", "dst")
    h1 = _half_step(a1, "dst", "src")
    a2 = _half_step(h1, "src", "dst")
    return h1.select("node", F.lit("hub").alias("kind"), "units").unionByName(
        a2.select("node", F.lit("auth").alias("kind"), "units")
    )


# --------------------------------------------------------------------------
# agg_drift_tvd — exact-rational distribution drift between two snapshots
# --------------------------------------------------------------------------
# Shared by the batch audit and the streaming maintainer
# (`stream_drift_monitor`): one oracle constant pins batch two-aggregate
# formulation and the additively-maintained histogram mutually equal.
_DRIFT_ORACLE = """
    WITH a AS (
      SELECT o_orderpriority || '/' || o_orderstatus AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1
    ),
    b AS (
      SELECT o_orderpriority || '/' || o_orderstatus AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1
    ),
    tot AS (SELECT (SELECT SUM(c) FROM a) AS n1, (SELECT SUM(c) FROM b) AS n2)
    SELECT COALESCE(a.bucket, b.bucket) AS bucket,
           CAST(COALESCE(a.c, 0) AS BIGINT) AS c1,
           CAST(COALESCE(b.c, 0) AS BIGINT) AS c2,
           CAST(abs(COALESCE(a.c, 0) * tot.n2 - COALESCE(b.c, 0) * tot.n1) AS BIGINT)
             AS d_num,
           CAST(tot.n1 AS BIGINT) AS n1, CAST(tot.n2 AS BIGINT) AS n2
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket CROSS JOIN tot
    """


@register("agg_drift_tvd", oracle=_DRIFT_ORACLE)
def agg_drift_tvd_q(spark, sf_dir):
    """Distribution-drift audit between two snapshot populations (orders
    before/after a pivot date) over the priority x status histogram — the
    monitoring primitive a training-data pipeline runs between corpus
    versions.  The usual drift stats (PSI, KL) need logarithms and can't
    hash-match across engines; total-variation distance is RATIONAL:
    TVD = sum(d_num) / (2*n1*n2) with d_num = |c1*n2 - c2*n1| kept as an
    exact BIGINT numerator per bucket — the consumer divides, the gate
    hashes integers.  Buckets present in only one snapshot surface with
    an explicit zero (full outer join), which is exactly the
    new-category-appeared signal drift monitoring exists to catch.

    100 TB shape: two hash aggregates over disjoint partition-pruned date
    ranges, a bucket-keyed full outer join at histogram (not corpus)
    scale, and the two totals as a 1-row broadcast.
    """
    orders = _t(spark, sf_dir, "orders")
    pivot = F.lit("1998-01-01").cast("timestamp")
    bucket = F.concat_ws("/", "o_orderpriority", "o_orderstatus").alias("bucket")

    def hist(side_filter):
        return (
            orders.filter(side_filter)
            .groupBy(bucket)
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    a = hist(F.col("o_orderdate") < pivot).withColumnRenamed("c", "c1")
    b = hist(F.col("o_orderdate") >= pivot).withColumnRenamed("c", "c2")
    joined = (
        a.join(b, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("c1", F.lit(0)).cast("long").alias("c1"),
            F.coalesce("c2", F.lit(0)).cast("long").alias("c2"),
        )
    )
    return _drift_finalize(joined)


def _drift_finalize(joined):
    """(bucket, c1, c2) histogram -> the drift audit frame: attach the two
    snapshot totals as a 1-row broadcast and the exact TVD numerator."""
    tot = joined.agg(
        F.sum("c1").cast("long").alias("n1"), F.sum("c2").cast("long").alias("n2")
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "c1",
        "c2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
        .cast("long")
        .alias("d_num"),
        "n1",
        "n2",
    )


# --------------------------------------------------------------------------
# window_rolling_median — exact trailing-window discrete median per entity
# --------------------------------------------------------------------------
@register(
    "window_rolling_median",
    oracle="""
    WITH base AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value * 1000) AS BIGINT) AS v
      FROM events WHERE user_id < 40
    ),
    w AS (
      SELECT user_id, event_id, v,
             list_sort(list(v) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
      FROM base
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id, v,
           CAST(len(win) AS BIGINT) AS win_n,
           CAST(win[(len(win) + 1) // 2] AS BIGINT) AS med_lo
    FROM w
    """,
)
def window_rolling_median_q(spark, sf_dir):
    """Trailing-window exact discrete median per entity (lower median of
    the last 7 events) — the robust-baseline primitive behind telemetry
    smoothing and the median-of-medians quality screens; the holistic
    cousin of `temporal_rolling_anomaly`'s algebraic z-test (a median
    cannot be maintained from sum/sum-of-squares partials).  Rolling
    holistic aggregates are exactly where engines diverge (interpolating
    vs discrete, tie order): this pins the DISCRETE lower median on
    milli-quantized integers with a total (ts, event_id) row order, so
    both engines sort identical windows and pick the identical element.

    100 TB shape: ONE exchange on the entity key, one ordered window
    pass; the collected frame is the 7-row ring buffer itself (bounded by
    the window width, not the data) — the right plan for small fixed
    windows, vs the two-heap applyInPandasWithState shape once widths
    grow user-defined.
    """
    base = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40).select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    win = F.sort_array(F.collect_list("v").over(w))
    return base.select(
        "user_id",
        "event_id",
        "v",
        F.size(win).cast("long").alias("win_n"),
        F.element_at(win, ((F.size(win) + 1) / 2).cast("int")).alias("med_lo"),
    )


# --------------------------------------------------------------------------
# stream_drift_monitor — streaming maintenance of the drift histogram
# --------------------------------------------------------------------------
@register("stream_drift_monitor", oracle=_DRIFT_ORACLE)
def stream_drift_monitor_q(spark, sf_dir):
    """Streaming distribution-drift monitoring: each micro-batch of orders
    contributes per-bucket conditional counts (c1 = before-pivot rows,
    c2 = after-pivot rows) and foreachBatch folds them into keyed parquet
    state with a SUM merge — counts are additive, so the maintained
    histogram is independent of how the file source bundles rows into
    micro-batches.  The returned audit is `_drift_finalize` over the final
    state, and the gate proves bundling-independence: this query shares
    `agg_drift_tvd`'s oracle constant, so stream-maintained == batch
    two-aggregate == DuckDB, hash-exact.  O(batch + touched buckets) per
    trigger; at 100 TB the state is histogram-sized (bucket cardinality),
    the cheapest possible continuous monitor."""
    import shutil
    import tempfile

    from ..streaming import read_orders_stream
    from . import finish_and_clean

    stream = read_orders_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_drift_")
    state_path = root + "/state"
    pivot = F.lit("1998-01-01").cast("timestamp")

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.groupBy(
            F.concat_ws("/", "o_orderpriority", "o_orderstatus").alias("bucket")
        ).agg(
            F.sum((F.col("o_orderdate") < pivot).cast("long")).alias("c1"),
            F.sum((F.col("o_orderdate") >= pivot).cast("long")).alias("c2"),
        )
        state = read_state_parquet(sp, state_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("bucket")
                .agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
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
        "bucket", F.col("c1").cast("long").alias("c1"), F.col("c2").cast("long").alias("c2")
    )
    return finish_and_clean(_drift_finalize(state), root)


# --------------------------------------------------------------------------
# agg_hist_equi_depth — equi-depth (quantile-bucket) histogram profile
# --------------------------------------------------------------------------
@register(
    "agg_hist_equi_depth",
    oracle="""
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    tiled AS (
      SELECT v, ntile(10) OVER (ORDER BY v, k) AS tile FROM base
    )
    SELECT CAST(tile AS BIGINT) AS tile, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi
    FROM tiled GROUP BY tile
    """,
)
def agg_hist_equi_depth_q(spark, sf_dir):
    """Equi-depth histogram of order totals: 10 buckets of (near-)equal row
    count with observed [lo, hi] bounds — the optimizer-statistics /
    skew-detection profile (`profile_numeric` gives moments, this gives
    the shape).  ntile semantics agree across engines ONLY under a total
    order: ties on the cent-quantized value are broken by key, so bucket
    boundaries are deterministic and the gate can hash them.  The
    rank-tolerance cousin `agg_approx_quantiles` estimates the same
    boundaries sketch-wise; this is the exact-twin doctrine applied to
    histogram construction.

    100 TB shape: the build IS the distributed form — `ntile_exact`'s
    two-pass range-rank (repartitionByRange + per-range row_number +
    a |partitions|-row offset collect), no single-partition window
    anywhere.  The production profile samples or reuses the
    approx-quantile sketch for boundaries and keeps this exact path for
    the audit tier."""
    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    from ..operators.windows import ntile_exact

    tiled = ntile_exact(base, 10, ["v", "k"], "tile").select("v", "tile")
    return tiled.groupBy(F.col("tile").cast("long").alias("tile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


# --------------------------------------------------------------------------
# text_keyword_rake — RAKE keyword extraction with integer-scaled scores
# --------------------------------------------------------------------------
_RAKE_STOPWORDS = "join|hash|row|batch|scan"  # top-5 corpus words = stop list


@register(
    "text_keyword_rake",
    oracle="""
    WITH marked AS (
      SELECT doc_id,
        regexp_replace(
          ' ' || replace(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                         ' ', '  ') || ' ',
          ' ({stops}) ', ' | ', 'g') AS s
      FROM documents
    ),
    phrases AS (
      SELECT doc_id,
             trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
      FROM marked, unnest(string_split(s, '|')) t(p)
      WHERE trim(p) <> ''
    ),
    occ_words AS (
      SELECT phrase, unnest(string_split(phrase, ' ')) AS w,
             len(string_split(phrase, ' ')) AS plen
      FROM phrases
    ),
    word_stats AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM occ_words GROUP BY w
    ),
    word_score AS (SELECT w, deg * 1000 // freq AS score FROM word_stats),
    phrase_words AS (
      SELECT phrase, unnest(string_split(phrase, ' ')) AS w
      FROM (SELECT DISTINCT phrase FROM phrases)
    ),
    phrase_score AS (
      SELECT pw.phrase, CAST(SUM(ws.score) AS BIGINT) AS score_scaled
      FROM phrase_words pw JOIN word_score ws ON ws.w = pw.w
      GROUP BY pw.phrase
    )
    SELECT p.phrase, CAST(COUNT(*) AS BIGINT) AS n_occ, ps.score_scaled
    FROM phrases p JOIN phrase_score ps ON ps.phrase = p.phrase
    GROUP BY p.phrase, ps.score_scaled
    HAVING COUNT(*) >= 3
    """.format(stops=_RAKE_STOPWORDS),
)
def text_keyword_rake_q(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; word score = deg(w)/freq(w) where
    freq counts phrase-occurrences of w and deg adds the length of each
    containing phrase (co-occurrence degree); phrase score = sum of member
    word scores.  Scores are kept as integer milli-units via truncating
    division (deg*1000 // freq), the BM25 integer-scaling doctrine, so
    ranking is bit-exact across engines.  Phrase extraction is pure string
    algebra both sides: space-doubling makes consecutive stopwords
    non-overlapping for the marker regex — the identical transform chain
    in Spark SQL and DuckDB.

    100 TB shape: phrase explode is a codegen map; word stats are one hash
    aggregate over phrase-occurrence words; the phrase score join is keyed
    on the word dim then re-aggregated — no UDFs, no driver loops, and the
    HAVING floor keeps the emitted keyword table vocabulary-scale."""
    marked = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(
            F.concat(
                F.lit(" "),
                F.regexp_replace(
                    F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")),
                    " ",
                    "  ",
                ),
                F.lit(" "),
            ),
            f" ({_RAKE_STOPWORDS}) ",
            " | ",
        ).alias("s"),
    )
    phrases = (
        marked.select(
            "doc_id", F.explode(F.split("s", "\\|")).alias("p")
        )
        .filter(F.trim("p") != "")
        .select(
            "doc_id",
            F.trim(F.regexp_replace("p", " +", " ")).alias("phrase"),
        )
    )
    # Round 14 (guide §3.3, the BM25/tfidf entry-H pattern): phrases feeds
    # three plan branches (occ_words → word_score, the distinct phrase_words
    # leg, and the n_occ aggregate) whose pruned subtrees never unify under
    # ReuseExchange — without a materialization the corpus scan + 3-regex
    # chain + phrase explode replay per branch.  One eager checkpoint per
    # invocation computes the phrase pass once.
    return _rake_rank_from_phrases(phrases.localCheckpoint(eager=True))


def _rake_rank_from_phrases(phrases):
    occ_words = phrases.select(
        "phrase",
        F.explode(F.split("phrase", " ")).alias("w"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    word_score = occ_words.groupBy("w").agg(
        F.expr("sum(plen) * 1000 DIV count(*)").cast("long").alias("score")
    )
    phrase_words = (
        phrases.select("phrase").distinct().select(
            "phrase", F.explode(F.split("phrase", " ")).alias("w")
        )
    )
    phrase_score = (
        phrase_words.join(word_score, "w")
        .groupBy("phrase")
        .agg(F.sum("score").cast("long").alias("score_scaled"))
    )
    return (
        phrases.groupBy("phrase")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .filter(F.col("n_occ") >= 3)
        .join(phrase_score, "phrase")
        .select("phrase", "n_occ", "score_scaled")
    )


# --------------------------------------------------------------------------
# stream_skyline_maintain — streaming Pareto-frontier maintenance
# --------------------------------------------------------------------------
@register("stream_skyline_maintain", oracle=_SKYLINE_ORACLE)
def stream_skyline_maintain_q(spark, sf_dir):
    """Streaming skyline maintenance: dominance is transitive, so
    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — each micro-batch's
    local sweep merges into keyed state by sweeping the union, and a point
    dominated once can never re-enter.  The maintained frontier is
    therefore independent of how the file source bundles rows into
    micro-batches, and the gate proves it: this query shares
    `skyline_pareto`'s oracle constant (stream-maintained == batch sweep
    == the quadratic NOT-EXISTS definition, hash-exact).  O(batch +
    |frontier|) per trigger — the state is the frontier itself, which for
    anti-correlated worst cases is the known skyline lower bound, not an
    implementation artifact."""
    import shutil
    import tempfile

    from ..streaming import read_part_stream
    from . import finish_and_clean

    stream = read_part_stream(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="stream_skyline_")
    state_path = root + "/state"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        base = batch_df.select(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
            F.col("p_size").cast("long").alias("size"),
        )
        part_sky = _pareto_sweep(base)
        state = read_state_parquet(sp, state_path)
        if state is not None:
            merged = _pareto_sweep(state.unionByName(part_sky))
        else:  # first batch: the local sweep IS the state
            merged = part_sky
        commit_state_parquet(merged, state_path)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()
    return finish_and_clean(spark.read.parquet(state_path), root)


# --------------------------------------------------------------------------
# join_band_bucketed — bucketed band self-join (|va - vb| <= w)
# --------------------------------------------------------------------------
_BAND_W = 50  # band half-width in value milli-units


@register(
    "join_band_bucketed",
    oracle="""
    WITH e AS (
      SELECT CAST(event_id AS BIGINT) AS id, event_type AS typ,
             CAST(FLOOR(value * 1000) AS BIGINT) AS v
      FROM events WHERE user_id < 30
    )
    SELECT a.typ, a.id AS id_a, b.id AS id_b, a.v AS v_a, b.v AS v_b
    FROM e a JOIN e b
      ON a.typ = b.typ AND a.id < b.id AND abs(a.v - b.v) <= 50
    """,
)
def join_band_bucketed_q(spark, sf_dir):
    """Band self-join — pairs of same-type events whose values lie within
    +-w of each other (sensor cross-validation, near-identical price
    detection; the value-space sibling of `join_interval_overlap`'s
    time-space predicate).  The ORACLE states the theta-join definition
    (abs(va - vb) <= w over all pairs); the ENGINE never evaluates it
    pairwise: values bucket to floor(v/w), the LEFT side fans out to its
    three candidate buckets {b-1, b, b+1} (any in-band partner must sit
    there), and the equi-join on (type, bucket) + exact band filter +
    id_a < id_b finds every qualifying pair EXACTLY once (each right row
    owns one bucket, so no dedup pass is needed — asymmetric fanout, the
    id inequality kills the mirrored match).

    100 TB shape: 3x fanout on one side of a keyed equi-join vs the
    quadratic nested-loop a theta join degenerates to; per-bucket pair
    work is bounded by band density, the operator's honest output size.
    """
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .select(
            F.col("event_id").cast("long").alias("id"),
            F.col("event_type").alias("typ"),
            F.floor(F.col("value") * 1000).cast("long").alias("v"),
        )
    )
    w = _BAND_W
    left = e.select(
        F.col("typ"),
        F.col("id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.explode(
            F.array(
                (F.floor(F.col("v") / w) - 1).cast("long"),
                F.floor(F.col("v") / w).cast("long"),
                (F.floor(F.col("v") / w) + 1).cast("long"),
            )
        ).alias("bucket"),
    )
    right = e.select(
        F.col("typ"),
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.floor(F.col("v") / w).cast("long").alias("bucket"),
    )
    return (
        left.join(right, ["typ", "bucket"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("v_a") - F.col("v_b")) <= w)
        )
        .select("typ", "id_a", "id_b", "v_a", "v_b")
    )


# --------------------------------------------------------------------------
# window_streak_islands — gaps-and-islands consecutive-run analytics
# --------------------------------------------------------------------------
@register(
    "window_streak_islands",
    oracle="""
    WITH base AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn_all,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_typ
      FROM events WHERE user_id < 60
    ),
    islands AS (
      SELECT user_id, event_type,
             CAST(COUNT(*) AS BIGINT) AS len,
             CAST(MIN(event_id) AS BIGINT) AS first_event
      FROM base GROUP BY user_id, event_type, rn_all - rn_typ
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS max_len,
           CAST(MIN(first_event) AS BIGINT) AS first_streak_event
    FROM islands GROUP BY user_id, event_type
    """,
)
def window_streak_islands_q(spark, sf_dir):
    """Gaps-and-islands streak analytics: maximal runs of consecutive
    same-type events per user (login streaks, repeated-failure bursts,
    session monotony screens).  The island identity is the classic
    two-row_number difference — rn_all - rn_per_type is CONSTANT exactly
    within a consecutive same-type run — which turns run detection into
    two window passes plus a hash aggregate, no self-join, no iteration.
    Determinism: the (ts, event_id) total order makes both row_numbers
    and hence every island boundary reproducible across engines.

    100 TB shape: ONE exchange on the entity key serves both window
    passes (same partitioning), then aggregation at island granularity;
    this is the plan a sessionize-by-predicate always lowers to."""
    base = _t(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    marked = base.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("island"),
    )
    islands = marked.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("event_id").alias("first_event"),
    )
    return islands.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").alias("max_len"),
        F.min("first_event").alias("first_streak_event"),
    )


# --------------------------------------------------------------------------
# temporal_cusum_changepoint — integer CUSUM change-point detection
# --------------------------------------------------------------------------
@register(
    "temporal_cusum_changepoint",
    oracle="""
    WITH base AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value * 1000) AS BIGINT) AS v
      FROM events WHERE user_id < 80
    ),
    tot AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS t
      FROM base GROUP BY user_id
    ),
    cum AS (
      SELECT b.user_id, b.event_id, tot.n, tot.t,
             row_number() OVER (PARTITION BY b.user_id ORDER BY b.ts, b.event_id)
               AS k,
             SUM(b.v) OVER (PARTITION BY b.user_id ORDER BY b.ts, b.event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cs
      FROM base b JOIN tot ON tot.user_id = b.user_id
    ),
    scored AS (
      SELECT user_id, event_id, n, k,
             abs(n * cs - k * t) AS abs_s,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY abs(n * cs - k * t) DESC, k ASC) AS rnk
      FROM cum
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS cp_pos, CAST(event_id AS BIGINT) AS cp_event,
           CAST(abs_s AS BIGINT) AS s_max_abs
    FROM scored WHERE rnk = 1
    """,
)
def temporal_cusum_changepoint_q(spark, sf_dir):
    """Offline CUSUM change-point detection per entity: the split point k
    maximizing |S_k| where S_k = sum_{i<=k}(v_i - mean) — the first pass
    of binary-segmentation mean-shift detection.  Floats would make both
    the mean and the cumsum engine-divergent; multiplying through by n
    gives the integer identity n*S_k = n*cumsum_k - k*total, exact in
    int64, so argmax and the score itself hash-gate.  Ties (same |S|)
    break to the earliest position via the (abs DESC, k ASC) row_number
    — the deterministic-argmax doctrine.

    100 TB shape: one hash aggregate for (n, total), one ordered window
    pass for the cumsum, one for the argmax — all on the SAME entity-key
    partitioning, so Catalyst plans a single exchange; no self-join, no
    per-candidate rescan of the series."""
    base = _t(spark, sf_dir, "events").filter(F.col("user_id") < 80).select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
    )
    tot = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("t"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = base.join(tot, "user_id").select(
        "user_id",
        "event_id",
        "n",
        F.row_number().over(w_ord).alias("k"),
        F.sum("v").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("cs"),
        "t",
    )
    scored = cum.select(
        "user_id",
        "event_id",
        "n",
        "k",
        F.abs(F.col("n") * F.col("cs") - F.col("k") * F.col("t")).alias("abs_s"),
    )
    w_rank = Window.partitionBy("user_id").orderBy(F.desc("abs_s"), F.asc("k"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") == 1)
        .select(
            "user_id",
            "n",
            F.col("k").cast("long").alias("cp_pos"),
            F.col("event_id").alias("cp_event"),
            F.col("abs_s").cast("long").alias("s_max_abs"),
        )
    )


# --------------------------------------------------------------------------
# agg_attribution_linear — time-bucketed multi-touch attribution
# --------------------------------------------------------------------------
@register(
    "agg_attribution_linear",
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
      SELECT c.conv_event, c.user_id, t.touch_event, t.event_type,
             row_number() OVER (PARTITION BY c.conv_event
                                ORDER BY t.touch_ts, t.touch_event) AS pos,
             COUNT(*) OVER (PARTITION BY c.conv_event) AS n_touch
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.touch_ts < c.conv_ts
       AND t.touch_ts >= c.conv_ts - INTERVAL 2 HOUR
    )
    SELECT CAST(conv_event AS BIGINT) AS conv_event,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(touch_event AS BIGINT) AS touch_event, event_type,
           CAST(pos AS BIGINT) AS pos, CAST(n_touch AS BIGINT) AS credit_den
    FROM attr
    """,
)
def agg_attribution_linear_q(spark, sf_dir):
    """Linear multi-touch attribution: every click/view of the same user
    in the 2 h before a purchase shares the conversion credit equally —
    emitted as the exact rational (1 / credit_den) with a deterministic
    position index (first-touch = pos 1, last-touch = pos credit_den), so
    first/last/position-decay models are a projection away and nothing is
    floating point.  The ORACLE states the interval theta-join; the
    ENGINE buckets time to the lookback width and fans conversions to
    {b-1, b} (a touch within 2 h must sit in the same or previous
    bucket) — the join_band_bucketed technique on the time axis, each
    qualifying (conversion, touch) found exactly once since a touch owns
    one bucket.

    100 TB shape: keyed equi-join on (user, bucket) with 2x fanout vs
    an unbounded per-user cross join; window credit assignment partitions
    by conversion — conversion fanout is bounded by the lookback's touch
    density, the operator's honest output size."""
    ev = _t(spark, sf_dir, "events")
    lookback = 7200
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("long").alias("conv_event"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").cast("long").alias("touch_event"),
        F.col("user_id").cast("long").alias("user_id"),
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
    return joined.select(
        "conv_event",
        "user_id",
        "touch_event",
        "event_type",
        F.row_number().over(w_pos).cast("long").alias("pos"),
        F.count(F.lit(1)).over(w_cnt).cast("long").alias("credit_den"),
    )


# --------------------------------------------------------------------------
# graph_resource_allocation — degree-weighted link prediction
# --------------------------------------------------------------------------
@register(
    "graph_resource_allocation",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT l_suppkey AS a, 100000 + l_partkey % 1500 AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (SELECT a AS src, b AS dst FROM raw UNION SELECT b, a FROM raw),
    adj0 AS (SELECT src AS anchor, dst AS v FROM und),
    da AS (SELECT anchor, CAST(COUNT(*) AS BIGINT) AS d FROM adj0 GROUP BY anchor),
    adj AS (
      SELECT adj0.anchor, adj0.v, da.d FROM adj0 JOIN da USING (anchor)
      WHERE da.d <= 40
    )
    SELECT a1.v AS a, a2.v AS b, CAST(COUNT(*) AS BIGINT) AS common,
           CAST(SUM(1000000 // a1.d) AS BIGINT) AS ra_score
    FROM adj a1 JOIN adj a2 USING (anchor)
    WHERE a1.v < a2.v
    GROUP BY a1.v, a2.v
    HAVING COUNT(*) >= 35
    """,
)
def graph_resource_allocation_q(spark, sf_dir):
    """Resource-allocation link prediction (Zhou, Lü & Zhang 2009) on the
    same supplier–part co-purchase graph as `graph_common_neighbors`:
    score(a,b) = sum over shared anchors z of 1/deg(z) — rare shared
    neighbors count for more, the degree-weighted refinement that beats
    raw common-neighbor counting (and the log-free cousin of Adamic-Adar,
    which can't hash-gate).  Weights are integer micro-units via
    truncating division (1000000 // deg), so the pair scores are exact.
    The same hub-anchor cap (deg <= 40) bounds wedge enumeration BEFORE
    pairing in both engines — the stop-word doctrine; the weight uses the
    pre-cap anchor degree so capping changes candidate generation, not
    the semantics of surviving anchors.

    100 TB shape: identical to the common-neighbor plan — anchor-keyed
    self-join bounded by cap^2 per anchor, one pair aggregation; the
    weight rides the adjacency rows, costing nothing extra."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).distinct()
    adj0 = und.select(F.col("src").alias("anchor"), F.col("dst").alias("v"))
    da = adj0.groupBy("anchor").agg(F.count(F.lit(1)).cast("long").alias("d"))
    # Materialized once: the capped adjacency feeds BOTH sides of the
    # anchor self-join; without the barrier each side re-derives the
    # distinct/union/degree chain (the _pareto/HITS lineage doctrine).
    adj = adj0.join(da, "anchor").filter(F.col("d") <= 40).localCheckpoint(eager=True)
    a1 = adj.select("anchor", F.col("v").alias("a"), "d")
    a2 = adj.select("anchor", F.col("v").alias("b"))
    return (
        a1.join(a2, "anchor")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum(F.expr("1000000 DIV d")).cast("long").alias("ra_score"),
        )
        .filter(F.col("common") >= 35)
    )
