"""Round-7 extension surface, part 3 of 4 (split from frontier3.py per
VERDICT r12 #7 — zero behavior change, sections moved verbatim): the
TEXT-ANALYSIS / DATA-QUALITY / EVALUATION / SAMPLING families — TF-IDF
(+ streaming maintainer), Zipf head, Heaps vocabulary growth,
burstiness, code/readability/mojibake/char-diversity/sentence-repetition
screens; Benford (+ maintainer), completeness, A/B chi-square, sequence
gaps, lang-id confusion, freshness, split balance/leakage, event-order
audit; detector metrics, calibration bins, feature chi-square; recency/
class-weight/chronological/bootstrap/rolling-origin sampling.  Shared
doctrines in frontier3.py's hub docstring."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import commit_state_parquet, load_table, read_state_parquet
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


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
    # Round 14 (guide §3.3, the BM25 entry-H pattern): tf feeds three plan
    # branches (df, nd, and the scored join) whose pruned exchanges never
    # unify under ReuseExchange — without a materialization the tokenize
    # explode + first aggregation replay per branch.  One eager checkpoint
    # per invocation computes the corpus pass once; the streaming twin's
    # serve step folds from parquet state instead and stays lazy.
    return _tfidf_rank_from_tf(tf.localCheckpoint(eager=True))


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
        commit_state_parquet(merged, state_path)

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
        commit_state_parquet(merged, state_path)

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


