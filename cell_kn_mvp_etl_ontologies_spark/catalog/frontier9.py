"""Round-12 extension batch.

The two VERDICT r11 prescriptions first — the df-capped weighted-Jaccard
twin (the repo's one measured-quadratic join gets its gated cap, VERDICT
r11 #2) and the routed radius-search rung (the ANN ladder's radius face
gets the routed-identity treatment every other rung already has, VERDICT
r11 #3) — followed by the round-12 operator additions.

- `dedup_minhash_weighted_capped` — `dedup_minhash_weighted` with the
  document-frequency cap on the shingle census BEFORE the sh-join
  (df ≤ 16), plus a corpus-level audit row counting the dropped hot
  shingles; the oracle replays the same cap.
- `similarity_range_search_routed` — radius search served through IVF
  cells (md5-seeded, exact integer assignment); at nprobe = n_cells the
  candidate set is all pairs and the output is bit-identical to the brute
  gate tier, so the SAME oracle constant gates both.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import commit_state_parquet, load_table
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# dedup_minhash_weighted_capped — weighted Jaccard behind the df-capped census
# --------------------------------------------------------------------------
_WEIGHTED_DF_CAP = 16

from .frontier8 import _WEIGHTED_CORPUS_SQL  # noqa: E402


@register(
    "dedup_minhash_weighted_capped",
    oracle=f"""
    WITH corpus AS ({_WEIGHTED_CORPUS_SQL}),
    tf AS (
      SELECT doc_id AS id, substring(text, i, 5) AS sh,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM corpus, generate_series(1, 56) t(i)
      WHERE i <= greatest(length(text) - 4, 0)
      GROUP BY doc_id, substring(text, i, 5)
    ),
    dfc AS (SELECT sh, COUNT(*) AS df FROM tf GROUP BY sh),
    kept AS (
      SELECT tf.* FROM tf JOIN dfc ON dfc.sh = tf.sh
      WHERE dfc.df <= {_WEIGHTED_DF_CAP}
    ),
    tot AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS t FROM kept GROUP BY id),
    shared AS (
      SELECT x.id AS a, y.id AS b,
             CAST(SUM(least(x.tf, y.tf)) AS BIGINT) AS min_sum
      FROM kept x JOIN kept y ON y.sh = x.sh AND y.id > x.id
      GROUP BY x.id, y.id
    ),
    pairs AS (
      SELECT s.a, s.b, s.min_sum,
             CAST(1000000 * s.min_sum // (ta.t + tb.t - s.min_sum) AS BIGINT)
               AS jw_ppm
      FROM shared s JOIN tot ta ON ta.id = s.a JOIN tot tb ON tb.id = s.b
      WHERE 1000000 * s.min_sum // (ta.t + tb.t - s.min_sum) >= 300000
    ),
    audit AS (
      SELECT CAST(-1 AS BIGINT) AS a, CAST(-1 AS BIGINT) AS b,
             CAST(SUM(CASE WHEN df > {_WEIGHTED_DF_CAP} THEN 1 ELSE 0 END)
                  AS BIGINT) AS min_sum,
             CAST(1000000 * SUM(CASE WHEN df > {_WEIGHTED_DF_CAP} THEN 1
                                     ELSE 0 END) // COUNT(*) AS BIGINT)
               AS jw_ppm
      FROM dfc
    )
    SELECT * FROM pairs UNION ALL SELECT * FROM audit
    """,
)
def dedup_minhash_weighted_capped_q(spark, sf_dir):
    """`dedup_minhash_weighted` behind the DOCUMENT-FREQUENCY cap the
    uncapped row's own 10× probe demanded (SCALE.md §frontier8-at-10x:
    the shared-shingle equi-join measured QUADRATIC — 1,200 docs →
    699,378 of 719k possible pairs, because common English 5-grams are
    shared by most documents; a df-16 cap on the census cuts candidates
    16× to 42,781 while planted full-prefix duplicates keep every
    DISTINCTIVE shingle shared).  The cap is applied to the tf census
    BEFORE the sh-join — the `cdc_chunks_capped` /
    `dedup_minhash_lsh_capped` stop-template doctrine: shingles carried
    by more than 16 documents are boilerplate mass and leave BOTH pair
    generation AND the per-doc totals, so J_w stays internally
    consistent over the capped shingle universe (this is why the capped
    twin is its own contract, not a shared-oracle facet: min_sum and
    jw_ppm legitimately differ from the uncapped row's).

    The output carries one corpus-level AUDIT row at (a, b) = (−1, −1):
    min_sum = the number of distinct hot shingles the cap dropped,
    jw_ppm = that count as ppm of all distinct shingles (the boilerplate
    mass fraction) — so a silently-degenerate cap (dropping everything,
    or nothing) is visible in the gated result itself.  At gate scale
    the cap is observable: 61 of 1,118 distinct shingles are hot (max
    df 34), candidates drop 2,327 → 1,168, and all 10 planted duplicate
    pairs survive at jw = 1e6.

    100 TB shape: one shingle pass → (id, sh, tf) census → one (sh)-grain
    df agg joined back as the filter → hash equi-join on sh with per-key
    fanout ≤ 16 (bounded work per shingle, the quadratic is dead) → one
    (a,b)-keyed agg.  Candidate volume is linear in kept census size."""
    from .frontier8 import weighted_corpus

    corpus = weighted_corpus(spark, sf_dir)
    shingles = corpus.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 4, 0)),"
                " i -> substring(text, i, 5))"
            )
        ).alias("sh"),
    )
    tf = shingles.groupBy("id", "sh").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    # df via a count window over the sh partitioning — one exchange on sh
    # and NO join back (the (id, sh) census is unique, so the partition
    # row count IS the document frequency); the subsequent sh-equi-join
    # inherits the same partitioning
    tfd = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("sh")))
    kept = tfd.filter(F.col("df") <= _WEIGHTED_DF_CAP).select("id", "sh", "tf")
    tot = kept.groupBy("id").agg(F.sum("tf").cast("long").alias("t"))
    x = kept.select(F.col("id").alias("a"), "sh", F.col("tf").alias("tfa"))
    y = kept.select(F.col("id").alias("b"), "sh", F.col("tf").alias("tfb"))
    shared = (
        x.join(y, on="sh")
        .filter(F.col("b") > F.col("a"))
        .groupBy("a", "b")
        .agg(F.sum(F.least("tfa", "tfb")).cast("long").alias("min_sum"))
    )
    pairs = (
        shared.join(tot.select(F.col("id").alias("a"), F.col("t").alias("ta")), on="a")
        .join(tot.select(F.col("id").alias("b"), F.col("t").alias("tb")), on="b")
        .select(
            "a",
            "b",
            "min_sum",
            F.expr(
                "CAST(1000000 * min_sum DIV (ta + tb - min_sum) AS BIGINT)"
            ).alias("jw_ppm"),
        )
        .filter(F.col("jw_ppm") >= 300000)
    )
    audit = tfd.agg(
        F.lit(-1).cast("long").alias("a"),
        F.lit(-1).cast("long").alias("b"),
        F.countDistinct(F.when(F.col("df") > _WEIGHTED_DF_CAP, F.col("sh")))
        .cast("long")
        .alias("min_sum"),
        F.expr(
            f"CAST(1000000 * COUNT(DISTINCT CASE WHEN df > {_WEIGHTED_DF_CAP}"
            " THEN sh END) DIV COUNT(DISTINCT sh) AS BIGINT)"
        ).alias("jw_ppm"),
    )
    return pairs.unionByName(audit)


# --------------------------------------------------------------------------
# similarity_range_search_routed — the radius face of the routed-identity rung
# --------------------------------------------------------------------------
from .frontier8 import _RANGE_SEARCH_ORACLE  # noqa: E402


@register("similarity_range_search_routed", oracle=_RANGE_SEARCH_ORACLE)
def similarity_range_search_routed_q(spark, sf_dir):
    """Cell-routed RADIUS search at nprobe = n_cells — the routed-identity
    treatment (`similarity_maxsim_routed` doctrine) applied to the ANN
    ladder's radius face, which until this round existed only as
    docstring prose on the brute gate tier (VERDICT r11 #3): corpus
    vectors assign to their nearest of 4 md5-seeded cells by exact int64
    squared L2 (the `ivf_assign`/`maxsim_route_cells` measure; ADVICE
    r12 — cosine is only the REFINE predicate, never the routing one),
    queries keep their nprobe nearest cells by the
    same measure, candidates come from the (cell) equi-join, and the
    exact integer refine (dot ≥ 0 ∧ 16·dot² ≥ |q|²·|t|², DECIMAL(38,0))
    runs per candidate.  With every cell probed the candidate set is all
    pairs and the output is bit-identical to `similarity_range_search`,
    so the SAME oracle constant gates both — cells as a partitioning
    device, pruning off, identity proven rather than claimed.

    Cell selection is rank-based (top-nprobe by smallest exact squared
    L2 to the centroid, ties to the smaller cell) rather than the
    slack-adjusted τ bound: a coverage-
    guaranteed ball bound needs the triangle-inequality term
    √((1−cos²(q,c))(1−cos²(t,c))), which is float sqrt — not cross-engine
    exact — while rank probing keeps the whole path in the audited
    integer contract and is the repo's established routing primitive
    (`ivf_assign`).  At nprobe < n_cells the recall floor is structural:
    an exact duplicate quantizes identically, so it assigns to exactly
    its source's cell and is recovered at nprobe = 1 (pinned by test,
    with the probe-tool candidate-reduction A/B in SCALE.md §range-routed).

    100 TB shape: centroids broadcast (n_cells rows), corpus assignment
    is a narrow map, candidates shuffle once on cell with per-cell work
    |Q_cell|·|cell| instead of |Q|·|corpus| — the brute scan's data-
    dependent ball output served behind the same trained-cell index the
    top-k rungs use."""
    from ..operators.similarity import range_search_routed
    from .frontier8 import range_search_em

    em = range_search_em(spark, sf_dir)
    q = em.filter(F.col("vec_id") < 8)
    return range_search_routed(em, q, n_cells=4, nprobe=4)


# --------------------------------------------------------------------------
# temporal_max_drawdown — peak-to-trough loss over the per-entity equity curve
# --------------------------------------------------------------------------
_DRAWDOWN_ORACLE = """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v_c
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    curve AS (
      SELECT user_id, day, v_c,
             SUM(v_c) OVER (PARTITION BY user_id ORDER BY day) AS equity
      FROM daily
    ),
    peaks AS (
      SELECT user_id, day, equity,
             MAX(equity) OVER (PARTITION BY user_id ORDER BY day) AS peak
      FROM curve
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(peak) AS BIGINT) AS peak_c,
           CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_c
    FROM peaks GROUP BY user_id
    """


@register("temporal_max_drawdown", oracle=_DRAWDOWN_ORACLE)
def temporal_max_drawdown_q(spark, sf_dir):
    """Maximum drawdown per entity — the largest peak-to-trough fall of the
    cumulative daily-value curve (the risk statistic every
    billing/portfolio/quota pipeline wants next to the plain running sum):
    equity_t = Σ_{s≤t} v_s, peak_t = max_{s≤t} equity_s, max drawdown =
    max_t (peak_t − equity_t).  Pure integer in CENTS at DAY grain
    (`floor(value*100)` — the `temporal_twap` quantization), so both
    engines agree bit-exactly; the day grain is what makes the curve a
    CENSUS (per-entity per-day sums fold by SUM), which is exactly what
    the IVM twin `stream_drawdown_maintain` maintains — the read-time
    face (two cumulative windows + one agg) is shared.

    100 TB shape: one (user, day) hash agg collapses the event stream to
    calendar grain; both windows run per-entity over ≤ days rows; one
    final entity-grain agg.  No joins, no corpus-grain window."""
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("v_c")
    )
    w_cum = Window.partitionBy("user_id").orderBy("day")
    curve = daily.select(
        "user_id",
        "day",
        F.sum("v_c").over(w_cum).alias("equity"),
    )
    peaks = curve.select(
        "user_id",
        "equity",
        F.max("equity").over(w_cum.rowsBetween(Window.unboundedPreceding, 0)).alias("peak"),
    )
    return peaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("peak").cast("long").alias("peak_c"),
        F.max(F.col("peak") - F.col("equity")).cast("long").alias("max_drawdown_c"),
    )


# --------------------------------------------------------------------------
# temporal_changepoint_pettitt — rank-based nonparametric changepoint
# --------------------------------------------------------------------------
@register(
    "temporal_changepoint_pettitt",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    pairs AS (
      SELECT a.day AS d1, b.day AS d2,
             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS s
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    a_t AS (SELECT d1 AS day, SUM(s) AS a FROM pairs GROUP BY d1),
    b_t AS (SELECT d2 AS day, SUM(s) AS b FROM pairs GROUP BY d2),
    u AS (
      SELECT d.day,
             SUM(COALESCE(a.a, 0) - COALESCE(b.b, 0))
               OVER (ORDER BY d.day) AS u_t
      FROM daily d
      LEFT JOIN a_t a ON a.day = d.day
      LEFT JOIN b_t b ON b.day = d.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(u_t AS BIGINT) AS u_t,
           abs(u_t) = MAX(abs(u_t)) OVER () AS is_peak
    FROM u
    """,
)
def temporal_changepoint_pettitt_q(spark, sf_dir):
    """Pettitt changepoint test over the daily event series — the
    nonparametric (rank/sign) complement of the mean-shift CUSUM
    (`temporal_cusum_changepoint`): U_t = Σ_{i≤t} Σ_{j>t} sgn(y_j − y_i),
    the split point maximizing |U_t| is the most probable changepoint,
    robust to outliers because only SIGNS enter.  Exact integer identity
    used: U_t − U_{t−1} = A_t − B_t with A_t = Σ_{j>t} sgn(y_j − y_t) and
    B_t = Σ_{i<t} sgn(y_t − y_i) — BOTH read off ONE ordered-pair frame
    (group by the earlier day for A, the later day for B), so the all-
    pairs Σ is one |days|² self-join (bounded by the CALENDAR, not the
    corpus) plus one cumulative window.  The full U series is the gated
    output (richer than the argmax alone); `is_peak` marks the
    changepoint(s).

    100 TB shape: the event stream collapses to day grain in one hash agg
    (the `temporal_median_decompose` doctrine); the |days|² pair frame is
    ~133k rows for a year — driver-trivial forever."""
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    a_side = daily.select(F.col("day").alias("d1"), F.col("y").alias("y1"))
    b_side = daily.select(F.col("day").alias("d2"), F.col("y").alias("y2"))
    pairs = a_side.join(b_side, F.col("d2") > F.col("d1")).select(
        "d1",
        "d2",
        F.when(F.col("y2") > F.col("y1"), 1)
        .when(F.col("y2") < F.col("y1"), -1)
        .otherwise(0)
        .alias("s"),
    )
    a_t = pairs.groupBy(F.col("d1").alias("day")).agg(F.sum("s").alias("a"))
    b_t = pairs.groupBy(F.col("d2").alias("day")).agg(F.sum("s").alias("b"))
    u = (
        daily.join(a_t, on="day", how="left")
        .join(b_t, on="day", how="left")
        .select(
            "day",
            F.sum(F.coalesce(F.col("a"), F.lit(0)) - F.coalesce(F.col("b"), F.lit(0)))
            .over(Window.orderBy("day"))
            .alias("u_t"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return u.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("u_t").cast("long").alias("u_t"),
        (F.abs("u_t") == F.max(F.abs("u_t")).over(w_all)).alias("is_peak"),
    )


# --------------------------------------------------------------------------
# eval_bleu_ngram_precision — corpus-level clipped n-gram precision
# --------------------------------------------------------------------------
@register(
    "eval_bleu_ngram_precision",
    oracle="""
    WITH pairs AS (
      SELECT doc_id,
             lower(substring(text, 1, 200)) AS cand,
             lower(substring(text, 11, 200)) AS ref
      FROM documents WHERE doc_id < 100
    ),
    ctoks AS (
      SELECT doc_id, t.tok, t.i
      FROM pairs, LATERAL (
        SELECT UNNEST(string_split_regex(cand, '\\s+')) AS tok,
               UNNEST(generate_series(1, len(string_split_regex(cand, '\\s+')))) AS i
      ) t WHERE t.tok <> ''
    ),
    rtoks AS (
      SELECT doc_id, t.tok, t.i
      FROM pairs, LATERAL (
        SELECT UNNEST(string_split_regex(ref, '\\s+')) AS tok,
               UNNEST(generate_series(1, len(string_split_regex(ref, '\\s+')))) AS i
      ) t WHERE t.tok <> ''
    ),
    cgrams AS (
      SELECT n, doc_id, g, COUNT(*) AS c FROM (
        SELECT 1 AS n, doc_id, tok AS g FROM ctoks
        UNION ALL
        SELECT 2, c1.doc_id, c1.tok || ' ' || c2.tok
        FROM ctoks c1 JOIN ctoks c2 ON c2.doc_id = c1.doc_id AND c2.i = c1.i + 1
      ) GROUP BY n, doc_id, g
    ),
    rgrams AS (
      SELECT n, doc_id, g, COUNT(*) AS c FROM (
        SELECT 1 AS n, doc_id, tok AS g FROM rtoks
        UNION ALL
        SELECT 2, r1.doc_id, r1.tok || ' ' || r2.tok
        FROM rtoks r1 JOIN rtoks r2 ON r2.doc_id = r1.doc_id AND r2.i = r1.i + 1
      ) GROUP BY n, doc_id, g
    ),
    clipped AS (
      SELECT c.n,
             SUM(least(c.c, COALESCE(r.c, 0))) AS matches,
             SUM(c.c) AS total
      FROM cgrams c
      LEFT JOIN rgrams r ON r.n = c.n AND r.doc_id = c.doc_id AND r.g = c.g
      GROUP BY c.n
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(matches AS BIGINT) AS clipped_matches,
           CAST(total AS BIGINT) AS total_ngrams,
           CAST(1000000 * matches // total AS BIGINT) AS precision_ppm
    FROM clipped
    """,
)
def eval_bleu_ngram_precision_q(spark, sf_dir):
    """Corpus-level CLIPPED n-gram precision (the BLEU numerator family,
    n = 1, 2) between candidate/reference text pairs — the
    generation-quality primitive for eval pipelines: per pair and per
    n-gram the match credit is min(count_cand, count_ref) (clipping kills
    the degenerate repeat-a-common-word exploit), summed corpus-level and
    reported with exact ppm precision.  The gate pairs are shifted views
    of the same document (cand = chars 1-200, ref = chars 11-200,
    doc_id < 100) — partial overlap by construction, so both clipping and
    misses are exercised.  The BREVITY PENALTY is deliberately NOT in the
    gated output: BP = e^(1−r/c) is transcendental (not cross-engine
    integer-exact); the len totals it needs are one agg away downstream,
    while the clipped-precision core — where all the counting subtlety
    lives — is hash-gated here.

    100 TB shape: tokenization is a projection; n-gram frames join on
    (n, pair, gram) — census-shaped exchanges; one final n-grain agg.
    Candidate-side totals never require the reference scan twice."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.lower(F.substring("text", 1, 200)).alias("cand"),
        F.lower(F.expr("substring(text, 11, 200)")).alias("ref"),
    )

    # token frames with positions (posexplode is 0-based vs the oracle's
    # 1-based generate_series; the bigram join only needs ADJACENCY so the
    # base does not matter)
    def tok_frame(col):
        return docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(col), r"\s+")).alias("i", "tok"),
        ).filter(F.col("tok") != "")

    def gram_census(col):
        toks = tok_frame(col)
        uni = toks.select(F.lit(1).alias("n"), "doc_id", F.col("tok").alias("g"))
        nxt = toks.select(
            F.col("doc_id").alias("doc_id2"),
            F.col("i").alias("i2"),
            F.col("tok").alias("tok2"),
        )
        bi = (
            toks.join(
                nxt,
                (F.col("doc_id") == F.col("doc_id2")) & (F.col("i2") == F.col("i") + 1),
            )
            .select(
                F.lit(2).alias("n"),
                "doc_id",
                F.concat_ws(" ", "tok", "tok2").alias("g"),
            )
        )
        return (
            uni.unionByName(bi)
            .groupBy("n", "doc_id", "g")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    cg = gram_census("cand")
    rg = gram_census("ref").select(
        "n", "doc_id", "g", F.col("c").alias("rc")
    )
    joined = cg.join(rg, on=["n", "doc_id", "g"], how="left")
    return (
        joined.groupBy("n")
        .agg(
            F.sum(F.least("c", F.coalesce("rc", F.lit(0)))).cast("long").alias("clipped_matches"),
            F.sum("c").cast("long").alias("total_ngrams"),
        )
        .select(
            F.col("n").cast("long").alias("n"),
            "clipped_matches",
            "total_ngrams",
            F.expr("CAST(1000000 * clipped_matches DIV total_ngrams AS BIGINT)").alias(
                "precision_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# quality_functional_dependency — does column A determine column B?
# --------------------------------------------------------------------------
@register(
    "quality_functional_dependency",
    oracle="""
    WITH fd1 AS (
      SELECT o_custkey AS lhs, COUNT(DISTINCT o_orderpriority) AS n_rhs
      FROM orders GROUP BY o_custkey
    ),
    fd2 AS (
      SELECT o_orderkey AS lhs, COUNT(DISTINCT o_custkey) AS n_rhs
      FROM orders GROUP BY o_orderkey
    )
    SELECT 'o_custkey->o_orderpriority' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_lhs,
           CAST(1000000 * SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS violation_ppm,
           CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_lhs
    FROM fd1
    UNION ALL
    SELECT 'o_orderkey->o_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(1000000 * SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT),
           CAST(MAX(n_rhs) AS BIGINT)
    FROM fd2
    """,
)
def quality_functional_dependency_q(spark, sf_dir):
    """Functional-dependency audit — does A → B hold in the data?  The
    schema-inference / normalization primitive every ingest QA suite
    needs next to referential integrity (`quality_referential_integrity`
    checks keys EXIST; this checks a column DETERMINES another): per LHS
    value count distinct RHS values, a violation is any LHS with > 1.
    Two candidate FDs gated — one that genuinely fails on this corpus
    (o_custkey → o_orderpriority: customers order at many priorities,
    the typical spurious-FD hypothesis) and one that holds by key
    construction (o_orderkey → o_custkey, the control) — so both the
    violating and the clean read-out are pinned.

    100 TB shape: one (lhs)-grain distinct-count agg per FD, one 1-row
    rollup — the per-FD cost is a census of the LHS key space, never a
    pair join."""
    orders = _t(spark, sf_dir, "orders")

    def fd(lhs, rhs, name):
        per = orders.groupBy(F.col(lhs).alias("lhs")).agg(
            F.countDistinct(rhs).alias("n_rhs")
        )
        return per.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_lhs"),
            F.expr(
                "CAST(1000000 * SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END)"
                " DIV COUNT(1) AS BIGINT)"
            ).alias("violation_ppm"),
            F.max("n_rhs").cast("long").alias("max_rhs_per_lhs"),
        )

    return fd("o_custkey", "o_orderpriority", "o_custkey->o_orderpriority").unionByName(
        fd("o_orderkey", "o_custkey", "o_orderkey->o_custkey")
    )


# --------------------------------------------------------------------------
# quality_uniqueness_profile — per-column duplication census
# --------------------------------------------------------------------------
@register(
    "quality_uniqueness_profile",
    oracle="""
    WITH cols AS (
      SELECT 'o_orderkey' AS column_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
      UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
      UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
    )
    SELECT column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
           CAST(1000000 * (COUNT(*) - COUNT(DISTINCT v)) // COUNT(*) AS BIGINT)
             AS duplication_ppm,
           COUNT(DISTINCT v) = COUNT(*) AS is_unique
    FROM cols GROUP BY column_name
    """,
)
def quality_uniqueness_profile_q(spark, sf_dir):
    """Per-column uniqueness/duplication census — the candidate-key
    discovery face next to the completeness profile
    (`quality_completeness_profile` counts nulls; this counts how far
    each column is from being a key): rows, exact distinct, duplication
    ppm (1e6·(n−distinct)/n), and the is_unique verdict.  o_orderkey
    reads unique (the PK control); the enum columns read ~saturated
    duplication — both ends pinned.

    100 TB shape: the long unpivot is a projection; one (column)-grain
    distinct agg — for true key discovery over many columns the exact
    distinct swaps for the KMV rung (`sketch_kmv_distinct`) at identical
    plan shape."""
    orders = _t(spark, sf_dir, "orders")
    cols = [
        ("o_orderkey", F.col("o_orderkey").cast("string")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
    ]
    long = None
    for name, expr in cols:
        part = orders.select(F.lit(name).alias("column_name"), expr.alias("v"))
        long = part if long is None else long.unionByName(part)
    return long.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.expr(
            "CAST(1000000 * (COUNT(1) - COUNT(DISTINCT v)) DIV COUNT(1) AS BIGINT)"
        ).alias("duplication_ppm"),
        (F.countDistinct("v") == F.count(F.lit(1))).alias("is_unique"),
    )


# --------------------------------------------------------------------------
# quality_value_length_profile — string-shape drift guard
# --------------------------------------------------------------------------
_LEN_LIMIT = 400


@register(
    "quality_value_length_profile",
    oracle=f"""
    WITH cols AS (
      SELECT 'text' AS column_name, text AS v FROM documents
      UNION ALL SELECT 'lang', lang FROM documents
      UNION ALL SELECT 'source', source FROM documents
    )
    SELECT column_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(length(v)) AS BIGINT) AS min_len,
           CAST(MAX(length(v)) AS BIGINT) AS max_len,
           CAST(SUM(length(v)) // COUNT(*) AS BIGINT) AS mean_len_floor,
           CAST(SUM(CASE WHEN length(v) > {_LEN_LIMIT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_limit
    FROM cols GROUP BY column_name
    """,
)
def quality_value_length_profile_q(spark, sf_dir):
    """Per-string-column length profile — the cheap shape-drift guard an
    ingest runs every batch (a lang code column whose max_len jumps from
    2 to 200 means a misaligned upstream schema long before content
    checks fire): n, min/max length, FLOOR mean (integer DIV — exact
    cross-engine, no float average), and the count over a hard limit
    (truncation / blob-in-string detection at {_LEN_LIMIT} chars).

    100 TB shape: projection + one (column)-grain agg; the lengths never
    leave the scan's partition until the 5-number rollup."""
    docs = _t(spark, sf_dir, "documents")
    cols = [("text", "text"), ("lang", "lang"), ("source", "source")]
    long = None
    for name, c in cols:
        part = docs.select(F.lit(name).alias("column_name"), F.col(c).alias("v"))
        long = part if long is None else long.unionByName(part)
    return long.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(F.length("v")).cast("long").alias("min_len"),
        F.max(F.length("v")).cast("long").alias("max_len"),
        F.expr("CAST(SUM(length(v)) DIV COUNT(1) AS BIGINT)").alias("mean_len_floor"),
        F.sum(F.when(F.length("v") > _LEN_LIMIT, 1).otherwise(0))
        .cast("long")
        .alias("n_over_limit"),
    )


# --------------------------------------------------------------------------
# stream_drawdown_maintain — max drawdown as IVM over the daily-value census
# --------------------------------------------------------------------------
@register("stream_drawdown_maintain", oracle=_DRAWDOWN_ORACLE)
def stream_drawdown_maintain_q(spark, sf_dir):
    """`temporal_max_drawdown` as incremental view maintenance: the
    maintained state is the (user, day, cents) DAILY census — per-day
    sums fold by pure SUM, so state is bundling- and order-independent
    (a late event for an old day folds into that day's cell and the
    read-time curve recomputes correctly — no frozen prefix, unlike
    running statistics that would need revocation) — and the drawdown
    itself is a READ-TIME face (a max-over-prefix is NOT batch-additive;
    the census-not-statistic doctrine of `stream_weighted_median_maintain`
    applied to path statistics).  Shares the batch row's oracle verbatim:
    stream == batch == DuckDB, hash-exact.

    100 TB shape: per trigger one (user, day) partial agg folded into
    entity×calendar-grain state; the face's two cumulative windows run
    per-entity over ≤ days rows, never the event stream."""
    import shutil
    import tempfile

    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_drawdown_")
    census_path = root + "/census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        ).agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("v_c")
        )
        from ..io import read_state_parquet

        state = read_state_parquet(sp, census_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("user_id", "day")
                .agg(F.sum("v_c").cast("long").alias("v_c"))
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

    daily = spark.read.parquet(census_path)
    w_cum = Window.partitionBy("user_id").orderBy("day")
    curve = daily.select(
        "user_id", "day", F.sum("v_c").over(w_cum).alias("equity")
    )
    peaks = curve.select(
        "user_id",
        "equity",
        F.max("equity").over(w_cum.rowsBetween(Window.unboundedPreceding, 0)).alias("peak"),
    )
    out = peaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("peak").cast("long").alias("peak_c"),
        F.max(F.col("peak") - F.col("equity")).cast("long").alias("max_drawdown_c"),
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# text_boilerplate_census — the stop-template report
# --------------------------------------------------------------------------
@register(
    "text_boilerplate_census",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, substring(substring(text, 1, 100), i, 8) AS g
      FROM documents, generate_series(1, 93) t(i)
      WHERE i <= greatest(length(substring(text, 1, 100)) - 7, 0)
    ),
    dfc AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY g
    ),
    tot AS (SELECT COUNT(*) AS n_docs FROM (SELECT DISTINCT doc_id FROM sh))
    SELECT g, df,
           CAST(1000000 * df // t.n_docs AS BIGINT) AS df_ppm
    FROM dfc, tot t
    WHERE df >= 50
    """,
)
def text_boilerplate_census_q(spark, sf_dir):
    """The stop-template report — WHICH shingles are boilerplate, with
    their document frequencies: the capped operators
    (`dedup_minhash_weighted_capped`, `cdc_chunks_capped`,
    `text_inverted_index_capped`) all DROP hot grams to kill the
    quadratic; this row surfaces the dropped mass as a first-class
    artifact (the template/footer/license-header inventory a corpus
    curator reviews, and the allowlist a tuned cap ships with).  Exact:
    per-gram distinct-doc frequency over the 8-gram census, reported with
    df ≥ 50 (gate corpus: the shared prefixes the generator plants) and
    df as ppm of corpus size.

    100 TB shape: one shingle projection + one (gram)-grain distinct agg
    + a 1-row total broadcast — the exchange carries the gram census,
    and the report is by construction tiny (boilerplate is the tail that
    repeats, not the corpus)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 100).alias("text")
    )
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 7, 0)),"
                " i -> substring(text, i, 8))"
            )
        ).alias("g"),
    ).distinct()
    dfc = sh.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("df"))
    tot = sh.select("doc_id").distinct().agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        dfc.filter(F.col("df") >= 50)
        .crossJoin(F.broadcast(tot))
        .select(
            "g",
            "df",
            F.expr("CAST(1000000 * df DIV n_docs AS BIGINT)").alias("df_ppm"),
        )
    )


# --------------------------------------------------------------------------
# shard_assign_lpt — longest-processing-time balanced sharding
# --------------------------------------------------------------------------
_LPT_BINS = 4

_LPT_ORACLE = f"""
    WITH RECURSIVE docs AS (
      SELECT CAST(doc_id % 4 AS BIGINT) AS grp,
             CAST(doc_id AS BIGINT) AS doc_id,
             CAST(n_chars // 16 + 1 AS BIGINT) AS tokens
      FROM documents WHERE doc_id < 200
    ),
    items AS (
      SELECT grp, doc_id, tokens,
             row_number() OVER (PARTITION BY grp
                                ORDER BY tokens DESC, doc_id ASC) AS rn
      FROM docs
    ),
    lpt AS (
      SELECT grp, 0 AS rn,
             CAST([0 FOR _ IN range({_LPT_BINS})] AS BIGINT[]) AS loads,
             CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS tokens,
             CAST(NULL AS BIGINT) AS bin
      FROM (SELECT DISTINCT grp FROM items)
      UNION ALL
      SELECT i.grp, i.rn,
             list_transform(range(1, {_LPT_BINS} + 1),
               k -> CASE WHEN k = pick.idx THEN l.loads[k] + i.tokens
                         ELSE l.loads[k] END),
             i.doc_id, i.tokens, pick.idx
      FROM lpt l
      JOIN items i ON i.grp = l.grp AND i.rn = l.rn + 1
      JOIN LATERAL (
        SELECT MIN(k) AS idx
        FROM (SELECT unnest(range(1, {_LPT_BINS} + 1)) AS k)
        WHERE l.loads[CAST(k AS INT)] = list_min(l.loads)
      ) pick ON TRUE
    )
    SELECT grp, doc_id, tokens, bin
    FROM lpt WHERE doc_id IS NOT NULL
    """


@register("shard_assign_lpt", oracle=_LPT_ORACLE)
def shard_assign_lpt_q(spark, sf_dir):
    """Longest-processing-time balanced sharding — the 4/3-OPT makespan
    classic, completing the packing ladder next to arrival-order greedy
    (`pack_sequences_greedy`) and first-fit-decreasing
    (`pack_sequences_ffd`): where FFD MINIMIZES BIN COUNT under a fixed
    capacity, LPT BALANCES a FIXED bin count (the actual shape of
    writing N balanced output shards / feeding K data-parallel workers):
    items sort by token count descending (ties to smaller id) and each
    goes to the currently LEAST-LOADED bin (ties to the smaller bin
    index — determinism is part of the contract).

    Per-group sequential state (the K bin loads) runs in one Arrow
    `applyInPandas` group per group key — thousands of groups shard in
    parallel; the DuckDB oracle replays LPT exactly with a recursive CTE
    carrying the K-element load vector.

    100 TB shape: one shuffle on the group key; per-group memory = K
    longs; no corpus-wide state."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        (F.col("doc_id") % 4).cast("long").alias("grp"),
        F.col("doc_id").cast("long").alias("doc_id"),
        ((F.col("n_chars") / 16).cast("long") + 1).cast("long").alias("tokens"),
    )

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        loads = [0] * _LPT_BINS
        bins: list[int] = []
        for t in pdf["tokens"].astype("int64"):
            k = min(range(_LPT_BINS), key=lambda i: (loads[i], i))
            loads[k] += int(t)
            bins.append(k + 1)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["grp", "doc_id", "tokens", "bin"]]

    schema = StructType(
        [
            StructField("grp", LongType()),
            StructField("doc_id", LongType()),
            StructField("tokens", LongType()),
            StructField("bin", LongType()),
        ]
    )
    return docs.groupBy("grp").applyInPandas(assign, schema=schema)


# --------------------------------------------------------------------------
# text_vocab_coverage — held-out OOV / coverage audit of a trained vocabulary
# --------------------------------------------------------------------------
_VOCAB_SIZE = 16


_VOCAB_COVERAGE_ORACLE = f"""
    WITH train_toks AS (
      SELECT t.tok FROM (
        SELECT lower(text) AS s FROM documents WHERE doc_id < 100
      ) src, LATERAL unnest(string_split_regex(s, '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS c FROM train_toks GROUP BY tok
      ) QUALIFY row_number() OVER (ORDER BY c DESC, tok ASC) <= {_VOCAB_SIZE}
    ),
    held AS (
      SELECT t.tok FROM (
        SELECT lower(text) AS s FROM documents
        WHERE doc_id >= 100 AND doc_id < 200
      ) src, LATERAL unnest(string_split_regex(s, '\\s+')) AS t(tok)
      WHERE t.tok <> ''
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS held_tokens,
           CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS covered_tokens,
           CAST(1000000 * SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS coverage_ppm,
           CAST(COUNT(DISTINCT CASE WHEN v.tok IS NULL THEN h.tok END) AS BIGINT)
             AS oov_types
    FROM held h LEFT JOIN vocab v ON v.tok = h.tok
    """


@register("text_vocab_coverage", oracle=_VOCAB_COVERAGE_ORACLE)
def text_vocab_coverage_q(spark, sf_dir):
    """Held-out vocabulary-coverage / OOV audit — the tokenizer-fitness
    check every LLM data pipeline runs before committing a vocab: train a
    top-{_VOCAB_SIZE} frequency vocabulary on the first half of the
    corpus (ties broken lexicographically — determinism is the contract),
    then measure token-level coverage ppm and distinct OOV types on the
    HELD-OUT half.  V = {_VOCAB_SIZE} is sized BELOW the synthetic
    corpus's ~31-type token pool deliberately: a vocabulary covering every
    type would gate nothing (coverage pinned at 1e6, OOV at 0 — the
    vacuity the first cut of this row had); at V = 16 both the covered
    mass and the OOV tail are non-empty, so the clip/miss algebra is
    actually exercised.  Whitespace tokens here; the BPE rung composes the
    same audit over `text_bpe_train` merges (whose vocabulary is itself
    hash-gated), so this row pins the COVERAGE algebra once for both.

    100 TB shape: vocab = one (token)-grain census + top-V
    (TakeOrderedAndProject, broadcast downstream); coverage = one
    broadcast hash lookup over the held-out token stream + a 1-row agg —
    no data-scale joins."""
    docs = _t(spark, sf_dir, "documents")

    def toks(lo, hi):
        return (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select(F.posexplode(F.split(F.lower("text"), r"\s+")).alias("i", "tok"))
            .filter(F.col("tok") != "")
            .select("tok")
        )

    vocab = (
        toks(0, 100)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    held = toks(100, 200)
    joined = held.join(F.broadcast(vocab), on="tok", how="left")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("held_tokens"),
        F.sum(F.when(F.col("in_vocab").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("covered_tokens"),
        F.expr(
            "CAST(1000000 * SUM(CASE WHEN in_vocab IS NOT NULL THEN 1 ELSE 0 END)"
            " DIV COUNT(1) AS BIGINT)"
        ).alias("coverage_ppm"),
        F.countDistinct(F.when(F.col("in_vocab").isNull(), F.col("tok")))
        .cast("long")
        .alias("oov_types"),
    )


# --------------------------------------------------------------------------
# multimodal_metadata_profile — typed-metadata completeness over payloads
# --------------------------------------------------------------------------
@register(
    "multimodal_metadata_profile",
    oracle="""
    WITH drifted AS (
      SELECT source, lang, n_chars,
             CASE WHEN doc_id % 7 = 0 THEN text || '\u00e9' ELSE text END AS text
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_lang,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           CAST(SUM(octet_length(encode(text))) // COUNT(*) AS BIGINT)
             AS mean_bytes_floor,
           CAST(SUM(CASE WHEN octet_length(encode(text))
                              <> CAST(n_chars AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_meta_mismatch
    FROM drifted GROUP BY source
    """,
)
def multimodal_metadata_profile_q(spark, sf_dir):
    """Typed-metadata profile over the opaque-payload table — the ingest
    QA face of the multimodal family (`multimodal_columns` pins the
    schema; this pins its HEALTH): per source, payload byte stats
    (min/max/FLOOR mean — integer DIV, no float average), metadata
    completeness (null langs, distinct langs), and the
    METADATA-vs-PAYLOAD consistency count — payloads whose actual byte
    length disagrees with the declared meta.n_chars.  The synthetic corpus
    is pure ASCII (payload bytes == n_chars everywhere — a vacuous gate),
    so the drift is PLANTED: every 7th payload is re-encoded with one
    appended 2-byte character while its metadata stays stale — the exact
    upstream-transcoder-changed failure a real pipeline catches here; the
    oracle replays the same plant, and min/max/mean profile the PLANTED
    payloads too (the profiled table is the drifted one, internally
    consistent).

    100 TB shape: binary payloads never leave the scan — only their
    octet_length enters the agg; one (source)-grain hash agg total."""
    from ..operators.multimodal import attach_binary_payload

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit("\u00e9"))
        ).otherwise(F.col("text")),
    )
    payload = attach_binary_payload(docs)
    return payload.groupBy(F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("meta.lang").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_lang"),
        F.countDistinct("meta.lang").cast("long").alias("n_langs"),
        F.min(F.octet_length("payload")).cast("long").alias("min_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
        F.expr(
            "CAST(SUM(octet_length(payload)) DIV COUNT(1) AS BIGINT)"
        ).alias("mean_bytes_floor"),
        F.sum(
            F.when(
                F.octet_length("payload") != F.col("meta.n_chars").cast("long"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_meta_mismatch"),
    )


# --------------------------------------------------------------------------
# temporal_seasonality_strength — variance-decomposition seasonality score
# --------------------------------------------------------------------------
@register(
    "temporal_seasonality_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    trended AS (
      SELECT day, y,
             list_sort(list(y) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS win
      FROM daily
    ),
    detrended AS (
      SELECT day, y - win[CAST((len(win) + 1) // 2 AS INT)] AS detr,
             dayofweek(day) AS dow
      FROM trended
    ),
    seasonal AS (
      SELECT dow, det_sorted[CAST((len(det_sorted) + 1) // 2 AS INT)] AS s
      FROM (SELECT dow, list_sort(list(detr)) AS det_sorted
            FROM detrended GROUP BY dow)
    ),
    parts AS (
      SELECT d.detr, d.detr - s.s AS rem
      FROM detrended d JOIN seasonal s ON s.dow = d.dow
    ),
    moms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             COUNT(*) * SUM(CAST(detr AS HUGEINT) * detr)
               - SUM(CAST(detr AS HUGEINT)) * SUM(detr) AS vd,
             COUNT(*) * SUM(CAST(rem AS HUGEINT) * rem)
               - SUM(CAST(rem AS HUGEINT)) * SUM(rem) AS vr
      FROM parts
    )
    SELECT n_days,
           CAST(vd AS BIGINT) AS var_num_detr,
           CAST(vr AS BIGINT) AS var_num_rem,
           CASE WHEN vd = 0 THEN NULL
                ELSE CAST(greatest(0, 1000000 - 1000000 * vr // vd) AS BIGINT)
           END AS seasonal_strength_ppm
    FROM moms
    """,
)
def temporal_seasonality_strength_q(spark, sf_dir):
    """Seasonality STRENGTH of the daily series — the STL-family scalar
    1 − Var(remainder)/Var(detrended) (Hyndman's F_s) on top of the same
    robust decomposition `temporal_median_decompose` gates: how much of
    the detrended variance the day-of-week profile explains, in exact
    ppm.  All-integer: both variances enter as the n·Σx²−(Σx)² numerator
    (same n, so the denominators cancel in the ratio), the quotient is
    integer DIV in DECIMAL(38,0)/HUGEINT, and the score clamps at 0 (a
    seasonal fit WORSE than nothing must read 0, not wrap negative).
    The variance numerators ship alongside the score — the audit columns
    that let a monitor recompute the ratio at any precision.

    100 TB shape: the corpus collapses to day grain in one hash agg;
    everything after runs on the tiny daily series (≤7-row windows, a
    7-row seasonal dim, one 1-row final agg)."""
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day", "y", F.sort_array(F.collect_list("y").over(w7)).alias("win")
    )
    lower_median = F.expr("win[CAST((size(win) + 1) DIV 2 AS INT) - 1]")
    detrended = trended.select(
        "day",
        (F.col("y") - lower_median).cast("long").alias("detr"),
        F.dayofweek("day").alias("dow"),
    )
    seasonal = (
        detrended.groupBy("dow")
        .agg(F.sort_array(F.collect_list("detr")).alias("det_sorted"))
        .select(
            "dow",
            F.expr("det_sorted[CAST((size(det_sorted) + 1) DIV 2 AS INT) - 1]")
            .cast("long")
            .alias("s"),
        )
    )
    parts = detrended.join(seasonal, on="dow").select(
        "detr", (F.col("detr") - F.col("s")).cast("long").alias("rem")
    )
    vd = (
        "(COUNT(1) * SUM(CAST(detr AS DECIMAL(38,0)) * detr)"
        " - SUM(CAST(detr AS DECIMAL(38,0))) * SUM(detr))"
    )
    vr = (
        "(COUNT(1) * SUM(CAST(rem AS DECIMAL(38,0)) * rem)"
        " - SUM(CAST(rem AS DECIMAL(38,0))) * SUM(rem))"
    )
    moms = parts.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr(f"{vd}").alias("vd"),
        F.expr(f"{vr}").alias("vr"),
    )
    # ADVICE r12: a degenerate (constant) detrended series zeroes vd; the
    # strength is then undefined — both engines emit NULL, not a division
    # error (DuckDB) or a non-ANSI silent NULL buried in greatest (Spark).
    return moms.select(
        "n_days",
        F.expr("CAST(vd AS BIGINT)").alias("var_num_detr"),
        F.expr("CAST(vr AS BIGINT)").alias("var_num_rem"),
        F.expr(
            "CASE WHEN vd = 0 THEN NULL"
            " ELSE CAST(greatest(0, 1000000 - 1000000 * vr DIV vd) AS BIGINT)"
            " END"
        ).alias("seasonal_strength_ppm"),
    )


# --------------------------------------------------------------------------
# eval_snips_offpolicy — (self-normalized) inverse-propensity policy value
# --------------------------------------------------------------------------
_SNIPS_ORACLE = """
    WITH logged AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS r_c,
             100000 + ('0x' || substring(md5('prop|' || CAST(event_id AS VARCHAR)),
                                         1, 8))::BIGINT % 900001 AS p_ppm
      FROM events
    ),
    weighted AS (
      SELECT r_c, CAST(1000000000000 // p_ppm AS BIGINT) AS w_e6
      FROM logged WHERE event_type = 'click'
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_logged FROM logged)
    SELECT t.n_logged,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(CAST(r_c AS HUGEINT) * w_e6)
                // (CAST(t.n_logged AS HUGEINT) * 1000000) AS BIGINT)
             AS ips_value_c,
           CAST(SUM(CAST(r_c AS HUGEINT) * w_e6) // SUM(w_e6) AS BIGINT)
             AS snips_value_c
    FROM weighted, tot t GROUP BY t.n_logged
    """


@register("eval_snips_offpolicy", oracle=_SNIPS_ORACLE)
def eval_snips_offpolicy_q(spark, sf_dir):
    """Off-policy evaluation by inverse propensity scoring — IPS and the
    self-normalized SNIPS estimator of a target policy's value from
    logged interactions (the counterfactual 'what would the click-always
    policy have earned' question every ranking/recs change answers before
    an A/B): matched events (logged action == target action) weigh
    reward by 1/propensity; IPS divides by ALL logged rounds (unbiased,
    high variance), SNIPS divides by Σw (biased, low variance — the
    estimator pair ships TOGETHER because their disagreement is itself
    the diagnostic).  Logging propensities are md5-derived ppm in
    [0.1, 1.0] (the portable-function doctrine — any engine reproduces
    the exact weights); weights are integer 1e12 DIV p_ppm; both value
    estimates are exact HUGEINT/DECIMAL(38,0) quotients in cents.

    100 TB shape: one projection (weights are per-row expressions), one
    1-row agg plus the 1-row logged-total broadcast — no joins of
    data-scale sides, no per-round state."""
    events = _t(spark, sf_dir, "events")
    logged = events.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("r_c"),
        (
            F.lit(100000)
            + F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("prop|"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 900001
        ).alias("p_ppm"),
    )
    weighted = logged.filter(F.col("event_type") == "click").select(
        "r_c", F.expr("CAST(1000000000000 DIV p_ppm AS BIGINT)").alias("w_e6")
    )
    tot = logged.agg(F.count(F.lit(1)).cast("long").alias("n_logged"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .groupBy("n_logged")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.expr(
                "CAST(SUM(CAST(r_c AS DECIMAL(38,0)) * w_e6)"
                " DIV (CAST(MAX(n_logged) AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
            ).alias("ips_value_c"),
            F.expr(
                "CAST(SUM(CAST(r_c AS DECIMAL(38,0)) * w_e6) DIV SUM(w_e6) AS BIGINT)"
            ).alias("snips_value_c"),
        )
        .select("n_logged", "n_matched", "ips_value_c", "snips_value_c")
    )


# --------------------------------------------------------------------------
# graph_bipartite_projection_capped — item-item co-engagement with basket cap
# --------------------------------------------------------------------------
_BIPARTITE_BASKET_CAP = 7


@register(
    "graph_bipartite_projection_capped",
    oracle=f"""
    WITH ui AS (
      SELECT DISTINCT
             user_id || '|' || CAST(CAST(ts AS DATE) AS VARCHAR) AS basket,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    deg AS (SELECT basket, COUNT(*) AS d FROM ui GROUP BY basket),
    kept AS (
      SELECT ui.basket, ui.item FROM ui JOIN deg ON deg.basket = ui.basket
      WHERE deg.d <= {_BIPARTITE_BASKET_CAP}
    )
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_baskets
    FROM kept a JOIN kept b ON b.basket = a.basket AND b.item > a.item
    GROUP BY a.item, b.item
    HAVING COUNT(*) >= 3
    """,
)
def graph_bipartite_projection_capped_q(spark, sf_dir):
    """Bipartite → unimodal projection with the hot-basket cap: the
    basket–item engagement graph (baskets = (user, day) sessions, items
    = the typed `props.k` payload key) projected onto an item–item
    co-engagement graph weighted by shared baskets — the classic
    market-basket / co-purchase construction — with baskets of degree
    > {_BIPARTITE_BASKET_CAP} dropped BEFORE pair expansion: one
    power-basket touching M items emits M²/2 item pairs (the
    projection's quadratic is per-BASKET fanout — exactly the
    boilerplate-mass shape the cap family kills, `cdc_chunks_capped` on
    the basket axis), and a basket that touches everything discriminates
    nothing (the tf-idf argument).  Gate scale: 4,006 baskets, max
    degree 10, the cap drops 9 — observable, not decorative.  Edges
    require ≥ 3 shared baskets (lower support is noise).

    100 TB shape: one (basket, item) distinct census, basket-degree via
    the count window over the basket partitioning (no join back), one
    basket-keyed equi-join with per-key fanout ≤ {_BIPARTITE_BASKET_CAP}²,
    one (item, item) hash agg — candidate volume linear in kept census
    size, never all-item-pairs."""
    events = _t(spark, sf_dir, "events")
    item = F.get_json_object(F.col("props"), "$.k").cast("long")
    ui = (
        events.select(
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.col("ts").cast("date").cast("string"),
            ).alias("basket"),
            item.alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    # degree via count window over the basket partitioning (the
    # dedup_minhash_weighted_capped census shape — no join back)
    uid = ui.withColumn("d", F.count(F.lit(1)).over(Window.partitionBy("basket")))
    kept = uid.filter(F.col("d") <= _BIPARTITE_BASKET_CAP).select("basket", "item")
    a = kept.select("basket", F.col("item").alias("item_a"))
    b = kept.select("basket", F.col("item").alias("item_b"))
    return (
        a.join(b, on="basket")
        .filter(F.col("item_b") > F.col("item_a"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_baskets"))
        .filter(F.col("n_shared_baskets") >= 3)
    )


# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# stream_vocab_coverage_maintain — the OOV audit as IVM
# --------------------------------------------------------------------------
@register("stream_vocab_coverage_maintain", oracle=_VOCAB_COVERAGE_ORACLE)
def stream_vocab_coverage_maintain_q(spark, sf_dir):
    """`text_vocab_coverage` as incremental view maintenance — the OOV
    monitor running ON the ingest stream: TWO token censuses are the
    state, (tok, c) over the training half (doc_id < 100) and (tok, c)
    over the held-out half (100 ≤ doc_id < 200), both pure-SUM lattices
    (bundling- and order-independent); the top-V vocabulary and the
    coverage/OOV numbers are READ-TIME faces — a token's vocab membership
    can flip as training mass arrives, so the vocabulary is NOT
    batch-additive while its census is (the census-not-face doctrine
    yet again).  Shares the batch row's oracle verbatim.

    100 TB shape: per trigger one token projection + two keyed census
    merges (state = vocabulary-grain, sublinear in tokens — the
    stream_hapax_maintain evidence); the face is a top-V over the train
    census + one broadcast lookup over the held census."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_documents_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_vocab_")
    train_path = root + "/train_census"
    held_path = root + "/held_census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        toks = batch_df.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), r"\s+")).alias("i", "tok"),
        ).filter(F.col("tok") != "")
        for path, lo, hi in ((train_path, 0, 100), (held_path, 100, 200)):
            part = (
                toks.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
                .groupBy("tok")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
            state = read_state_parquet(sp, path)
            merged = (
                state.unionByName(part)
                .groupBy("tok")
                .agg(F.sum("c").cast("long").alias("c"))
                if state is not None
                else part
            )
            commit_state_parquet(merged, path)

    query = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    train = spark.read.parquet(train_path)
    held = spark.read.parquet(held_path)
    vocab = (
        train.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(_VOCAB_SIZE)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    joined = held.join(F.broadcast(vocab), on="tok", how="left")
    out = joined.agg(
        F.sum("c").cast("long").alias("held_tokens"),
        F.sum(F.when(F.col("in_vocab").isNotNull(), F.col("c")).otherwise(0))
        .cast("long")
        .alias("covered_tokens"),
        F.expr(
            "CAST(1000000 * SUM(CASE WHEN in_vocab IS NOT NULL THEN c ELSE 0 END)"
            " DIV SUM(c) AS BIGINT)"
        ).alias("coverage_ppm"),
        F.countDistinct(F.when(F.col("in_vocab").isNull(), F.col("tok")))
        .cast("long")
        .alias("oov_types"),
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# eval_krippendorff_alpha — multi-rater nominal agreement
# --------------------------------------------------------------------------
_KRIPP_RATERS = 3


@register(
    "eval_krippendorff_alpha",
    oracle=f"""
    WITH ratings AS (
      SELECT doc_id, r,
             CASE WHEN ('0x' || substring(md5('noise|' || CAST(r AS VARCHAR)
                          || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10 = 0
                  THEN (('0x' || substring(md5('base|' || CAST(doc_id AS VARCHAR)),
                                           1, 8))::BIGINT + 1 + r) % 4
                  ELSE ('0x' || substring(md5('base|' || CAST(doc_id AS VARCHAR)),
                                          1, 8))::BIGINT % 4
             END AS lab
      FROM (SELECT doc_id FROM documents WHERE doc_id < 200),
           generate_series(0, {_KRIPP_RATERS} - 1) t(r)
    ),
    unit_cat AS (
      SELECT doc_id, lab, CAST(COUNT(*) AS BIGINT) AS n_uc
      FROM ratings GROUP BY doc_id, lab
    ),
    do_parts AS (
      SELECT CAST(SUM(n_uc * ({_KRIPP_RATERS} - n_uc)) AS BIGINT) AS do_num,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_units
      FROM unit_cat
    ),
    pooled AS (
      SELECT lab, CAST(SUM(n_uc) AS BIGINT) AS n_c FROM unit_cat GROUP BY lab
    ),
    de_parts AS (
      SELECT CAST(SUM(CAST(n_c AS HUGEINT) * (t.n_tot - n_c)) AS HUGEINT) AS de_num,
             MAX(t.n_tot) AS n_tot
      FROM pooled, (SELECT CAST(SUM(n_c) AS BIGINT) AS n_tot FROM pooled) t
    )
    SELECT d.n_units,
           CAST(e.n_tot AS BIGINT) AS n_ratings,
           d.do_num,
           CAST(e.de_num AS BIGINT) AS de_num,
           CAST(1000000 - (1000000 * CAST(d.do_num AS HUGEINT)
                           * e.n_tot * (e.n_tot - 1))
                // (e.de_num * d.n_units * {_KRIPP_RATERS}
                    * ({_KRIPP_RATERS} - 1)) AS BIGINT) AS alpha_ppm_floor
    FROM do_parts d, de_parts e
    """,
)
def eval_krippendorff_alpha_q(spark, sf_dir):
    """Krippendorff's alpha (nominal) — the multi-rater agreement
    coefficient that generalizes Cohen's kappa (`eval_cohens_kappa`, two
    raters) to R raters: α = 1 − D_o/D_e with observed disagreement
    D_o = Σ_u Σ_c n_uc(m − n_uc) / (n·m(m−1)) and expected D_e =
    Σ_c N_c(N − N_c) / (N(N−1)) — a RATIO OF RATIONALS, so the gated
    α is the exact floored ppm 1e6 − ⌊1e6·D_o_num·N(N−1) /
    (D_e_num·n·m(m−1))⌋ with both raw numerators shipped as audit
    columns (any downstream can recompute at any precision).  The three
    synthetic raters are md5-pure: base label md5(doc) % 4, each rater
    flipping to a different label with 10% md5-derived probability — so
    agreement is high but not total, and both D terms are non-degenerate.

    100 TB shape: one (unit, category) hash agg (the rating matrix never
    materializes wider than its census), one category-grain pooled agg,
    two 1-row combines — evaluation cost is the census, not n×R."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("doc_id")
    raters = spark.range(_KRIPP_RATERS).select(F.col("id").cast("long").alias("r"))
    base = F.conv(
        F.substring(F.md5(F.concat(F.lit("base|"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    noise = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("noise|"),
                    F.col("r").cast("string"),
                    F.lit("|"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    ratings = docs.crossJoin(F.broadcast(raters)).select(
        "doc_id",
        "r",
        F.when(noise % 10 == 0, (base + 1 + F.col("r")) % 4)
        .otherwise(base % 4)
        .alias("lab"),
    )
    unit_cat = ratings.groupBy("doc_id", "lab").agg(
        F.count(F.lit(1)).cast("long").alias("n_uc")
    )
    do_parts = unit_cat.agg(
        F.sum(F.col("n_uc") * (F.lit(_KRIPP_RATERS) - F.col("n_uc")))
        .cast("long")
        .alias("do_num"),
        F.countDistinct("doc_id").cast("long").alias("n_units"),
    )
    pooled = unit_cat.groupBy("lab").agg(F.sum("n_uc").cast("long").alias("n_c"))
    n_tot_f = pooled.agg(F.sum("n_c").cast("long").alias("n_tot"))
    de_parts = (
        pooled.crossJoin(F.broadcast(n_tot_f))
        .agg(
            F.expr(
                "CAST(SUM(CAST(n_c AS DECIMAL(38,0)) * (n_tot - n_c)) AS DECIMAL(38,0))"
            ).alias("de_num"),
            F.max("n_tot").alias("n_tot"),
        )
    )
    m = _KRIPP_RATERS
    return (
        do_parts.crossJoin(F.broadcast(de_parts))
        .select(
            "n_units",
            F.col("n_tot").cast("long").alias("n_ratings"),
            "do_num",
            F.col("de_num").cast("long").alias("de_num"),
            F.expr(
                "CAST(1000000 - (1000000 * CAST(do_num AS DECIMAL(38,0))"
                " * n_tot * (n_tot - 1))"
                f" DIV (de_num * n_units * {m} * {m - 1}) AS BIGINT)"
            ).alias("alpha_ppm_floor"),
        )
    )


# --------------------------------------------------------------------------
# graph_louvain_move — one synchronous modularity-improving move round
# --------------------------------------------------------------------------
@register(
    "graph_louvain_move",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
             CAST(100000 + l_partkey % 1500 AS BIGINT) AS b
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    und AS (
      SELECT a, b FROM raw UNION ALL SELECT b, a FROM raw
    ),
    deg AS (SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS k FROM und GROUP BY a),
    m_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM raw),
    -- singleton init: community(v) = v; k_{i,c} = multiplicity of (i, nbr)
    cand AS (
      SELECT u.a AS i, u.b AS c, CAST(COUNT(*) AS BIGINT) AS k_ic
      FROM und u GROUP BY u.a, u.b
    ),
    gains AS (
      SELECT cand.i, cand.c,
             2 * m.m * cand.k_ic - ki.k * kc.k AS gain
      FROM cand
      JOIN deg ki ON ki.v = cand.i
      JOIN deg kc ON kc.v = cand.c
      CROSS JOIN m_tot m
    ),
    best AS (
      SELECT i, c, gain,
             row_number() OVER (PARTITION BY i
                                ORDER BY gain DESC, c ASC) AS rn
      FROM gains
    )
    SELECT d.v AS node,
           CAST(CASE WHEN b.gain > 0 THEN b.c ELSE d.v END AS BIGINT)
             AS community,
           CAST(COALESCE(CASE WHEN b.gain > 0 THEN b.gain END, 0) AS BIGINT)
             AS gain_units
    FROM deg d
    LEFT JOIN best b ON b.i = d.v AND b.rn = 1
    """,
)
def graph_louvain_move_q(spark, sf_dir):
    """The Louvain CANDIDATE-MOVE table from the singleton partition —
    the modularity-ascent primitive next to the evaluation row
    (`graph_modularity_audit` SCORES a partition; this computes the
    ascent direction): every node i evaluates joining each neighbor
    community c of the INITIAL partition and reports its best
    strictly-positive move, ties to the smaller community id.  From
    singletons each SINGLE move's exact modularity delta is
    ΔQ = (2m·k_{i,c} − k_i·k_c)/2m² — the integer numerator is the gated
    `gain_units` column (scale factor positive and common, so argmax and
    the gain > 0 test transfer to integers; no float modularity is ever
    computed), and EVERY emitted move improves Q when applied alone
    (pinned by test).  APPLYING the moves is deliberately out of this
    operator: simultaneous application of per-node-optimal moves can
    DECREASE modularity (movers into the same target interact through
    the −k_i·k_j cross term — measured on this very graph), which is
    exactly why production Louvain applies moves sequentially; the
    driver loop applies top moves and re-derives this table per round
    (the PageRank bounded-iteration shape), while the TABLE itself is
    synchronous, deterministic and engine-replayable.  The `community`
    column is the would-be assignment (own id when no positive move
    exists).  The supplier–part co-purchase graph is the shared test
    graph of the community family.

    100 TB shape: one edge-grain census (k_ic), one degree agg, one
    broadcast m, a per-node window argmax — one keyed exchange over the
    edge census per round."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    raw = li.select(
        F.col("l_suppkey").cast("long").alias("a"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
    ).distinct()
    und = raw.unionByName(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    m_tot = raw.agg(F.count(F.lit(1)).cast("long").alias("m"))
    cand = und.groupBy(F.col("a").alias("i"), F.col("b").alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("k_ic")
    )
    gains = (
        cand.join(deg.select(F.col("v").alias("i"), F.col("k").alias("ki")), on="i")
        .join(deg.select(F.col("v").alias("c"), F.col("k").alias("kc")), on="c")
        .crossJoin(F.broadcast(m_tot))
        .select(
            "i",
            "c",
            (F.lit(2) * F.col("m") * F.col("k_ic") - F.col("ki") * F.col("kc")).alias(
                "gain"
            ),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("gain").desc(), F.col("c").asc())
    best = gains.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deg.join(
            best.select(F.col("i").alias("v"), "c", "gain"), on="v", how="left"
        )
        .select(
            F.col("v").alias("node"),
            F.when(F.col("gain") > 0, F.col("c")).otherwise(F.col("v"))
            .cast("long")
            .alias("community"),
            F.coalesce(F.when(F.col("gain") > 0, F.col("gain")), F.lit(0))
            .cast("long")
            .alias("gain_units"),
        )
    )


# --------------------------------------------------------------------------
# sketch_kmv_difference — set-difference estimation, completing the algebra
# --------------------------------------------------------------------------
from .frontier8 import _KMV_HASH_SQL, _KMV_K  # noqa: E402


@register(
    "sketch_kmv_difference",
    oracle=f"""
    WITH sets AS (
      SELECT DISTINCT event_type, {_KMV_HASH_SQL} AS h
      FROM events WHERE event_type IN ('click', 'view')
    ),
    sketches AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM sets
      ) WHERE rn <= {_KMV_K}
    ),
    union_sketch AS (
      SELECT h,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_b
      FROM sketches GROUP BY h
    ),
    topk AS (
      SELECT h, in_a, in_b, row_number() OVER (ORDER BY h) AS rn
      FROM union_sketch
    ),
    sk AS (
      SELECT CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS k_a_only,
             CAST(SUM(in_b * (1 - in_a)) AS BIGINT) AS k_b_only,
             CAST(COUNT(*) AS BIGINT) AS k_eff,
             MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
      FROM topk WHERE rn <= {_KMV_K}
    ),
    est AS (
      SELECT k_eff, k_a_only, k_b_only,
             CAST(CASE WHEN k_eff < {_KMV_K} THEN k_eff
                  ELSE ({_KMV_K} - 1) * 4294967296 // hk END AS BIGINT) AS u_est
      FROM sk
    ),
    exact AS (
      SELECT CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS exact_a_only,
             CAST(SUM(in_b * (1 - in_a)) AS BIGINT) AS exact_b_only
      FROM (
        SELECT h,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_b
        FROM sets GROUP BY h
      )
    )
    SELECT s.k_eff, s.k_a_only, s.k_b_only,
           CAST(s.k_a_only * s.u_est // s.k_eff AS BIGINT) AS a_minus_b_est,
           CAST(s.k_b_only * s.u_est // s.k_eff AS BIGINT) AS b_minus_a_est,
           e.exact_a_only, e.exact_b_only
    FROM est s, exact e
    """,
)
def sketch_kmv_difference_q(spark, sf_dir):
    """Set-DIFFERENCE estimation from two KMV sketches — |A∖B| and
    |B∖A|, completing the KMV set algebra (`sketch_kmv_distinct` counts,
    `sketch_kmv_intersection` overlaps; churn/migration questions — how
    many users clicked but never viewed — need the DIFFERENCES): from
    the union sketch's top-k, the one-sided membership fractions
    k_a_only/k_eff scale the union estimate, all in exact integers
    (k·û DIV k_eff), with exact one-sided audits beside them (the
    measure-the-estimator doctrine).  Same provably-correct membership
    flags as the intersection row: h in the union sketch ⇒ h's per-set
    membership is decidable from the per-set sketches alone.

    100 TB shape: identical to the intersection row — per-set k-min
    windows, ≤ 2k-row sketch algebra, the exact audits drop at
    production scale."""
    events = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    sets = events.select(
        "event_type",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    ).distinct()
    w_set = Window.partitionBy("event_type").orderBy("h")
    sketches = (
        sets.withColumn("rn", F.row_number().over(w_set))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )
    union_sketch = sketches.groupBy("h").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("in_b"),
    )
    w_u = Window.orderBy("h")  # <= 2k rows by construction — bounded
    topk = union_sketch.withColumn("rn", F.row_number().over(w_u))
    sk = topk.filter(F.col("rn") <= _KMV_K).agg(
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long").alias("k_a_only"),
        F.sum(F.col("in_b") * (1 - F.col("in_a"))).cast("long").alias("k_b_only"),
        F.count(F.lit(1)).cast("long").alias("k_eff"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
    )
    exact = (
        sets.groupBy("h")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("in_b"),
        )
        .agg(
            F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long").alias("exact_a_only"),
            F.sum(F.col("in_b") * (1 - F.col("in_a"))).cast("long").alias("exact_b_only"),
        )
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        "k_eff",
        "k_a_only",
        "k_b_only",
        F.expr(
            f"CAST(k_a_only * (CASE WHEN k_eff < {_KMV_K} THEN k_eff"
            f" ELSE ({_KMV_K} - 1) * 4294967296 DIV hk END) DIV k_eff AS BIGINT)"
        ).alias("a_minus_b_est"),
        F.expr(
            f"CAST(k_b_only * (CASE WHEN k_eff < {_KMV_K} THEN k_eff"
            f" ELSE ({_KMV_K} - 1) * 4294967296 DIV hk END) DIV k_eff AS BIGINT)"
        ).alias("b_minus_a_est"),
        "exact_a_only",
        "exact_b_only",
    )


# --------------------------------------------------------------------------
# filter_outlier_iqr — Tukey fences with deterministic rank quartiles
# --------------------------------------------------------------------------
_IQR_ORACLE = """
    WITH vals AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    ranked AS (
      SELECT event_type, v_c,
             row_number() OVER (PARTITION BY event_type ORDER BY v_c) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM vals
    ),
    quarts AS (
      SELECT event_type, MAX(n) AS n,
             MAX(CASE WHEN rn = greatest(1, (n + 1) // 4) THEN v_c END) AS q1_c,
             MAX(CASE WHEN rn = greatest(1, (3 * (n + 1)) // 4) THEN v_c END)
               AS q3_c
      FROM ranked GROUP BY event_type
    )
    SELECT q.event_type, CAST(q.n AS BIGINT) AS n,
           q.q1_c, q.q3_c,
           CAST(SUM(CASE WHEN 2 * v.v_c < 2 * q.q1_c - 3 * (q.q3_c - q.q1_c)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
           CAST(SUM(CASE WHEN 2 * v.v_c > 2 * q.q3_c + 3 * (q.q3_c - q.q1_c)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
    FROM vals v JOIN quarts q ON q.event_type = v.event_type
    GROUP BY q.event_type, q.n, q.q1_c, q.q3_c
    """


@register("filter_outlier_iqr", oracle=_IQR_ORACLE)
def filter_outlier_iqr_q(spark, sf_dir):
    """Tukey IQR fences per group — the rank-based outlier screen next to
    the MAD screen (`filter_outlier_mad`; IQR is the boxplot/reporting
    convention, MAD the robust-statistics one): quartiles are the
    DETERMINISTIC rank elements at positions (n+1) DIV 4 and 3(n+1) DIV 4
    of the cents-quantized values (engine percentile builtins interpolate
    differently — the sorted-element contract again, this time via a
    rank WINDOW so no per-group array ever materializes), and the
    1.5·IQR fences are compared in exact HALF-UNITS (2v < 2q1 − 3·IQR)
    so the ×1.5 never leaves integers.

    100 TB shape: one per-group rank window over cents (sort-based, no
    collect), a group-grain quartile pick, one broadcast-size join back
    for the fence census — no arrays, no floats."""
    events = _t(spark, sf_dir, "events")
    vals = events.select(
        "event_type", F.floor(F.col("value") * 100).cast("long").alias("v_c")
    )
    w = Window.partitionBy("event_type").orderBy("v_c")
    ranked = vals.select(
        "event_type",
        "v_c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    quarts = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rn") == F.greatest(F.lit(1), F.expr("(n + 1) DIV 4")), F.col("v_c"))
        ).alias("q1_c"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.expr("(3 * (n + 1)) DIV 4")),
                F.col("v_c"),
            )
        ).alias("q3_c"),
    )
    return (
        vals.join(F.broadcast(quarts), on="event_type")
        .groupBy("event_type", "n", "q1_c", "q3_c")
        .agg(
            F.sum(
                F.when(
                    2 * F.col("v_c") < 2 * F.col("q1_c") - 3 * (F.col("q3_c") - F.col("q1_c")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(
                F.when(
                    2 * F.col("v_c") > 2 * F.col("q3_c") + 3 * (F.col("q3_c") - F.col("q1_c")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_high_outliers"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "q1_c",
            "q3_c",
            "n_low_outliers",
            "n_high_outliers",
        )
    )


# --------------------------------------------------------------------------
# temporal_snaive_backtest — seasonal-naive forecast error baseline
# --------------------------------------------------------------------------
@register(
    "temporal_snaive_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    scored AS (
      SELECT event_type, y,
             lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
      FROM daily
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(abs(y - yhat)) // COUNT(*) AS BIGINT) AS mae_floor,
           CAST(1000000 * SUM(abs(y - yhat)) // SUM(y) AS BIGINT) AS wape_ppm,
           CAST(SUM(y - yhat) AS BIGINT) AS bias
    FROM scored WHERE yhat IS NOT NULL
    GROUP BY event_type
    """,
)
def temporal_snaive_backtest_q(spark, sf_dir):
    """Seasonal-naive forecast backtest — ŷ(d) = y(d−7), scored per
    event type with FLOOR MAE, WAPE ppm (Σ|e| relative to Σy — the
    scale-free accuracy every forecast eval quotes) and signed bias; the
    BASELINE every real forecasting model must beat, so the backtest of
    the baseline is itself pipeline furniture (a model pipeline diffs
    its own backtest against exactly this row).  All integer: daily
    counts, lag-7 window, absolute-error sums, DIV quotients.

    100 TB shape: the corpus collapses to (type, day) grain in one hash
    agg; the lag window and error rollup run on the tiny daily series."""
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type", "y", F.lag("y", 7).over(w).alias("yhat")
    ).filter(F.col("yhat").isNotNull())
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        F.expr("CAST(SUM(abs(y - yhat)) DIV COUNT(1) AS BIGINT)").alias("mae_floor"),
        F.expr("CAST(1000000 * SUM(abs(y - yhat)) DIV SUM(y) AS BIGINT)").alias(
            "wape_ppm"
        ),
        F.sum(F.col("y") - F.col("yhat")).cast("long").alias("bias"),
    )


# --------------------------------------------------------------------------
# eval_mcc_parts — Matthews correlation in exact integer parts
# --------------------------------------------------------------------------
# the english-detector predicate lives in the leaf contracts module so this
# import carries no catalog-module ordering baggage (frontier3's own import
# chain would replay half of load_all)
from ._text_contracts import LANGID_PRED_SQL as _LANGID_PRED_SQL  # noqa: E402


@register(
    "eval_mcc_parts",
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
           CAST(tp * tn - fp * fn AS BIGINT) AS mcc_num,
           CAST(CASE WHEN tp * tn - fp * fn >= 0 THEN 1 ELSE -1 END
                * ((CAST(tp * tn - fp * fn AS HUGEINT)
                    * (tp * tn - fp * fn) * 1000000000000)
                   // NULLIF(CAST(tp + fp AS HUGEINT) * (tp + fn)
                             * (tn + fp) * (tn + fn), 0)) AS BIGINT)
             AS mcc_sq_e12_signed
    FROM cells
    """.format(pred=_LANGID_PRED_SQL),
)
def eval_mcc_parts_q(spark, sf_dir):
    """Matthews correlation coefficient in EXACT integer parts — the one
    balanced scalar the binary scorecard
    (`eval_binary_detector_metrics`) lacks: precision/recall/F1 all
    ignore TN, so a detector on an imbalanced corpus can score high F1
    while anti-correlating with truth; MCC = (tp·tn − fp·fn)/√(Πmarginals)
    is the chance-corrected correlation.  The √ is transcendental, so
    the gate ships the SIGNED SQUARE: mcc_num (exact, sign = the
    correlation's sign) and sign·⌊1e12·num²/Πmarginals⌋ — monotone in
    |MCC| and sign-faithful, so thresholding and comparing detectors
    works entirely in integers (the eval_auc_delong_var present-the-
    parts doctrine); any consumer wanting the float takes one sqrt of
    the shipped ratio.  Same english-detector cells as the scorecard
    row, so the two rows reconcile by construction.

    100 TB shape: one corpus pass into four counters — the confusion
    cells are the whole exchange."""
    from ..operators.text_analysis import lang_id

    docs = _t(spark, sf_dir, "documents")
    pred = docs.select(
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
        F.expr("CAST(tp * tn - fp * fn AS BIGINT)").alias("mcc_num"),
        F.expr(
            "CAST(CASE WHEN tp * tn - fp * fn >= 0 THEN 1 ELSE -1 END"
            " * ((CAST(tp * tn - fp * fn AS DECIMAL(38,0))"
            "     * (tp * tn - fp * fn) * 1000000000000)"
            # a DEGENERATE confusion matrix (an empty row or column —
            # detector always-fires or labels single-class) zeroes a
            # marginal: NULLIF makes BOTH engines emit NULL instead of a
            # division error (mcc is undefined there, and num = 0 says so)
            "    DIV NULLIF(CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)"
            "               * (tn + fp) * (tn + fn), 0)) AS BIGINT)"
        ).alias("mcc_sq_e12_signed"),
    )


# --------------------------------------------------------------------------
# profile_correlation_pairs — exact integer correlation numerators
# --------------------------------------------------------------------------
@register(
    "profile_correlation_pairs",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice) AS BIGINT) AS price_d,
             o_custkey AS cust,
             CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) // 86400 AS day_n
      FROM orders
    ),
    pairs AS (
      SELECT 'o_totalprice~o_custkey' AS pair, price_d AS x, cust AS y FROM v
      UNION ALL
      SELECT 'o_totalprice~o_orderdate', price_d, day_n FROM v
      UNION ALL
      SELECT 'o_custkey~o_orderdate', cust, day_n FROM v
    ),
    moms AS (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
             COUNT(*) * SUM(CAST(x AS HUGEINT) * y)
               - SUM(CAST(x AS HUGEINT)) * SUM(y) AS cov,
             COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
               - SUM(CAST(x AS HUGEINT)) * SUM(x) AS vx,
             COUNT(*) * SUM(CAST(y AS HUGEINT) * y)
               - SUM(CAST(y AS HUGEINT)) * SUM(y) AS vy
      FROM pairs GROUP BY pair
    )
    SELECT pair, n,
           CAST(cov AS BIGINT) AS cov_num,
           CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END AS INT)
             AS corr_sign,
           CAST(((cov * cov) // NULLIF(vx, 0)) * 1000000 // NULLIF(vy, 0)
                AS BIGINT) AS corr_sq_e6
    FROM moms
    """,
)
def profile_correlation_pairs_q(spark, sf_dir):
    """Pairwise correlation profile over numeric columns — the
    feature-redundancy screen a training pipeline runs before committing
    a feature set (two near-duplicate features waste model capacity and
    break attribution): per pair, the EXACT covariance numerator
    n·Σxy − Σx·Σy (its sign IS the correlation sign), and ρ² in exact
    e6 units via ⌊1e6·cov²/ (varx·vary)⌋ — the same present-the-
    signed-square convention as `eval_mcc_parts`, because ρ's sqrt is
    transcendental while ρ² thresholds ('drop one of any pair with
    ρ² > 0.95') are what pipelines actually gate on.  Timestamps enter
    as FLOOR-epoch day numbers (the truncation pin), money as HALF_UP
    whole units (cents would push cov² past DECIMAL(38,0) — measured
    NUMERIC_VALUE_OUT_OF_RANGE under ANSI; at petabyte row counts the
    moments divide by n before squaring, the documented scale path).

    100 TB shape: ONE pass — every pair's five moments (Σx, Σy, Σxy,
    Σx², Σy²) comes from the same projection-unioned scan, one
    (pair)-grain agg; no column is scanned twice per pair."""
    orders = _t(spark, sf_dir, "orders")
    day_n = F.expr(
        "CAST(timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " o_orderdate) AS BIGINT) DIV 86400"
    )
    v = orders.select(
        F.round(F.col("o_totalprice")).cast("long").alias("price_d"),
        F.col("o_custkey").alias("cust"),
        day_n.alias("day_n"),
    )
    cols = [
        ("o_totalprice~o_custkey", "price_d", "cust"),
        ("o_totalprice~o_orderdate", "price_d", "day_n"),
        ("o_custkey~o_orderdate", "cust", "day_n"),
    ]
    long = None
    for name, xc, yc in cols:
        part = v.select(
            F.lit(name).alias("pair"), F.col(xc).alias("x"), F.col(yc).alias("y")
        )
        long = part if long is None else long.unionByName(part)
    moms = long.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "COUNT(1) * SUM(CAST(x AS DECIMAL(38,0)) * y)"
            " - SUM(CAST(x AS DECIMAL(38,0))) * SUM(y)"
        ).alias("cov"),
        F.expr(
            "COUNT(1) * SUM(CAST(x AS DECIMAL(38,0)) * x)"
            " - SUM(CAST(x AS DECIMAL(38,0))) * SUM(x)"
        ).alias("vx"),
        F.expr(
            "COUNT(1) * SUM(CAST(y AS DECIMAL(38,0)) * y)"
            " - SUM(CAST(y AS DECIMAL(38,0))) * SUM(y)"
        ).alias("vy"),
    )
    return moms.select(
        "pair",
        "n",
        F.col("cov").cast("long").alias("cov_num"),
        F.expr(
            "CAST(CASE WHEN cov > 0 THEN 1 WHEN cov < 0 THEN -1 ELSE 0 END AS INT)"
        ).alias("corr_sign"),
        # two-step floored division keeps every intermediate inside
        # DECIMAL(38,0): cov^2 (<= vx*vy by Cauchy-Schwarz, ~1e35 at gate
        # units) DIV vx first, then the e6 scale, then DIV vy — the inner
        # floor's relative error is ~1e-14 and IDENTICAL in both engines.
        # ADVICE r12: a constant column zeroes its variance numerator; ρ²
        # is undefined there, so NULLIF makes BOTH engines emit NULL
        # instead of a division error (DuckDB) / non-ANSI NULL (Spark).
        F.expr(
            "CAST(((cov * cov) DIV NULLIF(vx, 0)) * 1000000 DIV NULLIF(vy, 0)"
            " AS BIGINT)"
        ).alias("corr_sq_e6"),
    )


# --------------------------------------------------------------------------
# stream_snips_maintain — off-policy value as IVM
# --------------------------------------------------------------------------
@register("stream_snips_maintain", oracle=_SNIPS_ORACLE)
def stream_snips_maintain_q(spark, sf_dir):
    """`eval_snips_offpolicy` as incremental view maintenance — the
    off-policy value monitor running ON the logging stream: the state is
    FOUR pure-SUM counters (Σr·w over matched rounds as DECIMAL(38,0),
    Σw, n_matched, n_logged) — the entire IPS/SNIPS sufficient statistic
    is additive, so this is the rare maintainer whose state is
    CONSTANT-SIZE (one row) and exactly batch-equal under any bundling;
    the two value quotients are read-time faces.  Shares the batch row's
    oracle verbatim.

    100 TB shape: per trigger one projection + one 1-row partial agg
    folded into 1-row state; the face is two divisions."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_snips_")
    state_path = root + "/counters"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        logged = batch_df.select(
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("r_c"),
            (
                F.lit(100000)
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(F.lit("prop|"), F.col("event_id").cast("string"))
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 900001
            ).alias("p_ppm"),
        )
        part = logged.agg(
            F.count(F.lit(1)).cast("long").alias("n_logged"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("n_matched"),
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'click' THEN"
                " CAST(r_c AS DECIMAL(38,0)) * (1000000000000 DIV p_ppm)"
                " ELSE 0 END) AS DECIMAL(38,0))"
            ).alias("num"),
            F.expr(
                "CAST(SUM(CASE WHEN event_type = 'click' THEN"
                " 1000000000000 DIV p_ppm ELSE 0 END) AS DECIMAL(38,0))"
            ).alias("den"),
        )
        state = read_state_parquet(sp, state_path)
        merged = (
            state.unionByName(part).agg(
                F.sum("n_logged").cast("long").alias("n_logged"),
                F.sum("n_matched").cast("long").alias("n_matched"),
                F.sum("num").cast("decimal(38,0)").alias("num"),
                F.sum("den").cast("decimal(38,0)").alias("den"),
            )
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

    st = spark.read.parquet(state_path)
    out = st.select(
        "n_logged",
        "n_matched",
        F.expr(
            "CAST(num DIV (CAST(n_logged AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ).alias("ips_value_c"),
        F.expr("CAST(num DIV den AS BIGINT)").alias("snips_value_c"),
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# stream_iqr_maintain — Tukey fences as IVM over the value census
# --------------------------------------------------------------------------
@register("stream_iqr_maintain", oracle=_IQR_ORACLE)
def stream_iqr_maintain_q(spark, sf_dir):
    """`filter_outlier_iqr` as incremental view maintenance: the
    maintained state is the (group, cents, n) VALUE CENSUS — counts fold
    by pure SUM, bundling- and order-independent — and the quartiles,
    fences and outlier counts are READ-TIME faces (an order statistic is
    not batch-additive; the `stream_weighted_median_maintain` doctrine
    on the quartile face).  The read face ranks the census (not the
    rows): rn positions come from the cumulative census counts, so the
    face costs O(value grid), never O(events).  Shares the batch row's
    oracle verbatim.

    100 TB shape: per trigger one (group, cents) partial agg into
    value-grid state; the face is one cumulative window over the bounded
    per-group grid + one census rollup for the fence counts."""
    import shutil
    import tempfile

    from ..io import read_state_parquet
    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_iqr_")
    census_path = root + "/census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.groupBy(
            "event_type", F.floor(F.col("value") * 100).cast("long").alias("v_c")
        ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        state = read_state_parquet(sp, census_path)
        merged = (
            state.unionByName(part)
            .groupBy("event_type", "v_c")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            if state is not None
            else part
        )
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
    w = Window.partitionBy("event_type").orderBy("v_c")
    cum = census.select(
        "event_type",
        "v_c",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    # the quartile VALUE is the census row whose cumulative count first
    # reaches the target rank (rank semantics identical to row_number
    # over exploded rows: position p lands in the row with cum-cnt < p <= cum)
    quarts = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                (F.col("cum") - F.col("cnt") < F.greatest(F.lit(1), F.expr("(n + 1) DIV 4")))
                & (F.greatest(F.lit(1), F.expr("(n + 1) DIV 4")) <= F.col("cum")),
                F.col("v_c"),
            )
        ).alias("q1_c"),
        F.max(
            F.when(
                (
                    F.col("cum") - F.col("cnt")
                    < F.greatest(F.lit(1), F.expr("(3 * (n + 1)) DIV 4"))
                )
                & (F.greatest(F.lit(1), F.expr("(3 * (n + 1)) DIV 4")) <= F.col("cum")),
                F.col("v_c"),
            )
        ).alias("q3_c"),
    )
    out = (
        census.join(F.broadcast(quarts), on="event_type")
        .groupBy("event_type", "n", "q1_c", "q3_c")
        .agg(
            F.sum(
                F.when(
                    2 * F.col("v_c")
                    < 2 * F.col("q1_c") - 3 * (F.col("q3_c") - F.col("q1_c")),
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(
                F.when(
                    2 * F.col("v_c")
                    > 2 * F.col("q3_c") + 3 * (F.col("q3_c") - F.col("q1_c")),
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_high_outliers"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "q1_c",
            "q3_c",
            "n_low_outliers",
            "n_high_outliers",
        )
    )
    return finish_and_clean(out, root)
