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
