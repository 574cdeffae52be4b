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

from ..io import load_table
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
    vectors assign to their nearest of 4 md5-seeded cells by exact
    quantized cosine, queries keep their nprobe nearest cells by the
    same measure, candidates come from the (cell) equi-join, and the
    exact integer refine (dot ≥ 0 ∧ 16·dot² ≥ |q|²·|t|², DECIMAL(38,0))
    runs per candidate.  With every cell probed the candidate set is all
    pairs and the output is bit-identical to `similarity_range_search`,
    so the SAME oracle constant gates both — cells as a partitioning
    device, pruning off, identity proven rather than claimed.

    Cell selection is rank-based (top-nprobe by centroid cosine, ties to
    the smaller cell) rather than the slack-adjusted τ bound: a coverage-
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
        staging = census_path + "_staging"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(census_path)
        shutil.rmtree(staging, ignore_errors=True)

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


@register(
    "text_vocab_coverage",
    oracle=f"""
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
    """,
)
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
