"""Round-11 extension batch: radius similarity search, weighted near-dedup,
first-fit-decreasing packing, schema-drift monitoring, event-rate shift
auditing, grouped K-fold assignment, exact-substring decontamination, and
the data-quality scorecard as IVM (SURVEY §2.12, §2.11).

- `similarity_range_search` — RADIUS search (all neighbors with cosine ≥
  τ), the missing face next to the top-k ladder: threshold compared by
  cross-multiplication in exact integers (16·dot² ≥ na·nb for τ=0.25),
  never a float sqrt; planted exact copies keep the gate non-vacuous.
- `dedup_minhash_weighted` — tf-WEIGHTED Jaccard near-dedup: repeated
  shingles count (J_w = Σmin(tf)/Σmax(tf)), so a doc that repeats a
  template line differs from one that uses it once — semantics plain
  set-Jaccard cannot express.
- `pack_sequences_ffd` — first-fit-decreasing packing, the 11/9-OPT
  classic next to the strict arrival-order greedy; per-shard sequential
  state in Arrow, replayed exactly by a DuckDB recursive CTE carrying the
  bin-fill list.
- `quality_schema_drift` — cross-snapshot column-profile diff (null ppm,
  distinct counts, new-value counts): the schema/distribution-drift
  monitor every long-running ingest needs.
- `temporal_rate_shift_audit` — per-type Poisson rate comparison between
  the two halves of the observed time range; the shift test is the exact
  integer form (n1−n2)² > 4·(n1+n2) of |z| > 2 under equal exposure.
- `sample_group_kfold` — group-disjoint K-fold assignment (all rows of a
  user land in one fold, md5-pure so any engine reproduces it) + per-fold
  balance audit.
- `contamination_substring_scan` — EXACT-substring decontamination: 24-char
  probes from held-out documents scanned against the corpus with
  locate()/position() — the exact-match complement of the shingle-overlap
  `contamination_ngram`.
- `stream_expectations_maintain` — `quality_expectations` as IVM: row-level
  and FK violation counters fold by SUM; uniqueness keeps a (key, n)
  census; the scorecard is a read-time face.  Shares the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import commit_state_parquet, load_table, read_state_parquet
from . import register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# similarity_range_search — cosine-radius search in exact integers
# --------------------------------------------------------------------------
def range_search_em(spark, sf_dir):
    """The range-search gate corpus, shared by the brute tier and the
    round-12 routed twin (catalog/frontier9.py): embeddings ∪ 5 planted
    exact copies (shifted ids), HALF_UP-quantized with exact int64 norms."""
    from ..operators.similarity import quantize_vec

    base = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = base.unionByName(
        base.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    em = corpus.select("vec_id", quantize_vec(F.col("embedding")).alias("qv"))
    return em.select(
        "vec_id",
        "qv",
        F.aggregate(
            F.zip_with("qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("norm_sq"),
    )


# Shared by `similarity_range_search` (brute gate tier) and the round-12
# `similarity_range_search_routed` (catalog/frontier9.py): at nprobe =
# n_cells the routed output is bit-identical to brute, so ONE oracle
# constant gates both (the similarity_maxsim_routed doctrine).
_RANGE_SEARCH_ORACLE = """
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 5
    ),
    quant AS (
      SELECT vec_id, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM corpus, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    ),
    norms AS (SELECT vec_id, SUM(v * v) AS norm_sq FROM quant GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS q_id, t.vec_id AS t_id, SUM(q.v * t.v) AS dot
      FROM quant q JOIN quant t ON q.i = t.i
      WHERE q.vec_id < 8 AND t.vec_id <> q.vec_id
      GROUP BY q.vec_id, t.vec_id
    )
    SELECT d.q_id, d.t_id, CAST(d.dot AS BIGINT) AS dot_q
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.q_id
    JOIN norms nt ON nt.vec_id = d.t_id
    WHERE d.dot >= 0 AND 16 * d.dot * d.dot >= nq.norm_sq * nt.norm_sq
    """


@register("similarity_range_search", oracle=_RANGE_SEARCH_ORACLE)
def similarity_range_search_q(spark, sf_dir):
    """RADIUS similarity search — every corpus vector within cosine ≥ 0.25
    of each query — the report face the top-k ladder cannot express
    (near-dup audits and recall sweeps need ALL neighbors in a ball, not
    the best k).  The threshold test is exact integer cross-multiplication
    on the HALF_UP-quantized vectors (`quantize_vec` contract): cos ≥ 1/4
    ⟺ dot ≥ 0 ∧ 16·dot² ≥ |q|²·|t|² — no sqrt, no float compare, so both
    engines agree bit-exactly on boundary vectors.  The gate corpus
    plants exact copies of 5 vectors (shifted ids), so the ball contains
    both the cos = 1 planted hits AND the natural near-neighbors random
    64-d vectors produce at τ = 1/4 (τ = 1/2 is empirically EMPTY on an
    isotropic corpus — cos concentrates at ±1/√d ≈ 0.125).

    This is the gate tier (|Q|=8 broadcast against the corpus — the
    `similarity_topk` waiver); production routes candidates through the
    audited bucketed rungs first (`similarity_ann_lsh` bands or
    `similarity_ann_ivf_kmeans` cells: a ball query probes the cells whose
    centroid dot clears a slack-adjusted bound, then this exact refine
    runs per candidate) — radius refine composes with every rung because
    the predicate is per-pair.

    100 TB shape: query side broadcast (8 rows), corpus scanned once,
    per-pair work O(dim); the output is data-dependent (ball occupancy),
    which is WHY production pre-buckets instead of scanning."""
    em = range_search_em(spark, sf_dir)
    q = em.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm_sq").alias("q_norm"),
    )
    pairs = em.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        F.col("vec_id").alias("t_id"),
        F.aggregate(
            F.zip_with("q_qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_q"),
        F.col("q_norm"),
        F.col("norm_sq").alias("t_norm"),
    )
    # DECIMAL(38,0) for the squared compare (ADVICE doctrine): dot ~ 7.6e8
    # already wraps 16*dot^2 past BIGINT, and large-norm embeddings reach it
    # — the oracle's HUGEINT never wraps, so the Spark side must not either.
    return scored.filter(
        (F.col("dot_q") >= 0)
        & (
            F.expr("16 * CAST(dot_q AS DECIMAL(38,0)) * dot_q")
            >= F.expr("CAST(q_norm AS DECIMAL(38,0)) * t_norm")
        )
    ).select("q_id", "t_id", "dot_q")


# --------------------------------------------------------------------------
# dedup_minhash_weighted — tf-weighted Jaccard near-dedup
# --------------------------------------------------------------------------
_WEIGHTED_CORPUS_SQL = """
      SELECT doc_id, substring(text, 1, 60) AS text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 10000, substring(text, 1, 60) FROM documents WHERE doc_id < 10
"""


def weighted_corpus(spark, sf_dir):
    """The weighted-Jaccard gate corpus (60 docs + 10 planted full-prefix
    copies), shared with the round-12 df-capped twin (catalog/frontier9.py)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60).select(
        "doc_id", F.substring("text", 1, 60).alias("text")
    )
    planted = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return docs.unionByName(planted)


@register(
    "dedup_minhash_weighted",
    oracle=f"""
    WITH corpus AS ({_WEIGHTED_CORPUS_SQL}),
    tf AS (
      SELECT doc_id AS id, substring(text, i, 5) AS sh,
             CAST(COUNT(*) AS BIGINT) AS tf
      FROM corpus, generate_series(1, 56) t(i)
      WHERE i <= greatest(length(text) - 4, 0)
      GROUP BY doc_id, substring(text, i, 5)
    ),
    tot AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS t FROM tf GROUP BY id),
    shared AS (
      SELECT x.id AS a, y.id AS b,
             CAST(SUM(least(x.tf, y.tf)) AS BIGINT) AS min_sum
      FROM tf x JOIN tf y ON y.sh = x.sh AND y.id > x.id
      GROUP BY x.id, y.id
    )
    SELECT s.a, s.b, s.min_sum,
           CAST(1000000 * s.min_sum // (ta.t + tb.t - s.min_sum) AS BIGINT)
             AS jw_ppm
    FROM shared s JOIN tot ta ON ta.id = s.a JOIN tot tb ON tb.id = s.b
    WHERE 1000000 * s.min_sum // (ta.t + tb.t - s.min_sum) >= 300000
    """,
)
def dedup_minhash_weighted_q(spark, sf_dir):
    """tf-WEIGHTED Jaccard near-dedup: J_w(a,b) = Σ_s min(tf_a, tf_b) /
    Σ_s max(tf_a, tf_b) over 5-gram shingle term frequencies — repeated
    shingles COUNT, so a document that repeats a boilerplate line 10×
    scores differently against one that uses it once (plain set-Jaccard
    sees both as a single shared shingle).  Exact integer form: Σmax =
    t_a + t_b − Σmin over shared shingles, so only the shared-min sum and
    the two per-doc totals are ever computed; jw in ppm by integer DIV.
    Planted full-prefix copies of 10 docs land at jw = 1e6.

    Candidates come from the shared-shingle equi-join (the inverted-index
    census shape, never all-pairs); at 100 TB the candidate stage swaps in
    banded MinHash (`dedup_minhash_lsh` buckets, whose J estimate lower-
    bounds J_w candidates worth refining) with the hot-shingle cap — this
    row pins the exact REFINE semantics those candidates feed.

    100 TB shape: one shingle pass → (id, sh, tf) census → hash equi-join
    on sh (per-key fanout = docs sharing the shingle — capped in
    production like `cdc_chunks_capped`; the gated df-capped twin is
    `dedup_minhash_weighted_capped`, catalog/frontier9.py), one
    (a,b)-keyed agg."""
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
    tot = tf.groupBy("id").agg(F.sum("tf").cast("long").alias("t"))
    x = tf.select(F.col("id").alias("a"), "sh", F.col("tf").alias("tfa"))
    y = tf.select(F.col("id").alias("b"), "sh", F.col("tf").alias("tfb"))
    shared = (
        x.join(y, on="sh")
        .filter(F.col("b") > F.col("a"))
        .groupBy("a", "b")
        .agg(F.sum(F.least("tfa", "tfb")).cast("long").alias("min_sum"))
    )
    out = (
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
    )
    return out.filter(F.col("jw_ppm") >= 300000)


# --------------------------------------------------------------------------
# pack_sequences_ffd — first-fit-decreasing packing
# --------------------------------------------------------------------------
_FFD_BUDGET = 512

_FFD_ORACLE = f"""
    WITH RECURSIVE docs AS (
      SELECT CAST(doc_id % 4 AS BIGINT) AS shard,
             CAST(doc_id AS BIGINT) AS doc_id,
             CAST(n_chars // 16 + 1 AS BIGINT) AS tokens
      FROM documents WHERE doc_id < 200
    ),
    items AS (
      SELECT shard, doc_id, tokens,
             row_number() OVER (PARTITION BY shard
                                ORDER BY tokens DESC, doc_id ASC) AS rn
      FROM docs
    ),
    ffd AS (
      SELECT shard, 0 AS rn, CAST([] AS BIGINT[]) AS fills,
             CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS tokens,
             CAST(NULL AS BIGINT) AS bin
      FROM (SELECT DISTINCT shard FROM items)
      UNION ALL
      SELECT i.shard, i.rn,
             CASE WHEN fit.idx IS NULL THEN list_append(f.fills, i.tokens)
                  ELSE list_transform(range(1, len(f.fills) + 1),
                         k -> CASE WHEN k = fit.idx THEN f.fills[k] + i.tokens
                                   ELSE f.fills[k] END)
             END,
             i.doc_id, i.tokens,
             COALESCE(fit.idx, len(f.fills) + 1)
      FROM ffd f
      JOIN items i ON i.shard = f.shard AND i.rn = f.rn + 1
      LEFT JOIN LATERAL (
        SELECT MIN(k) AS idx
        FROM (SELECT unnest(range(1, len(f.fills) + 1)) AS k)
        WHERE f.fills[CAST(k AS INT)] + i.tokens <= {_FFD_BUDGET}
      ) fit ON TRUE
    )
    SELECT shard, doc_id, tokens, bin
    FROM ffd WHERE doc_id IS NOT NULL
    """


@register("pack_sequences_ffd", oracle=_FFD_ORACLE)
def pack_sequences_ffd_q(spark, sf_dir):
    """First-fit-decreasing sequence packing — the classic 11/9·OPT+6/9
    bin-packing heuristic, next to the strict arrival-order greedy
    (`pack_sequences_greedy`, which closes a bin the moment one document
    overflows it): documents sort by token count DESCENDING (ties to the
    smaller id — determinism is part of the contract) and each goes into
    the FIRST open bin with room, so large items never strand capacity
    behind them.  Measured on this corpus FFD packs the same documents
    into ≤ the greedy bin count on every shard (pinned by test).

    Per-shard sequential state (the open-bin fill list) runs in one
    Arrow `applyInPandas` group per shard — the `pack_sequences_greedy`
    doctrine: thousands of shards pack in parallel, each bounded by shard
    size.  The packer itself is the shared extraction
    :func:`operators.training.pack_sequences_ffd` — ONE implementation
    backs this row and the composed `pack_sequences_bpe` chain, so the
    two cannot drift.  The DuckDB oracle replays first-fit EXACTLY with
    a recursive CTE carrying the bin-fill LIST per shard.

    100 TB shape: one shuffle on shard; per-shard memory = open-bin list
    (≤ shard tokens / budget entries); no corpus-wide state."""
    from ..operators.training import pack_sequences_ffd

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        (F.col("doc_id") % 4).cast("long").alias("shard"),
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("n_chars") / F.lit(16)).cast("long").alias("_div"),
    ).select(
        "shard", "doc_id", (F.col("_div") + 1).alias("tokens")
    )
    return pack_sequences_ffd(docs, "shard", "doc_id", "tokens", _FFD_BUDGET)


# --------------------------------------------------------------------------
# quality_schema_drift — cross-snapshot column-profile diff
# --------------------------------------------------------------------------
_DRIFT_COL_SQL = """
      SELECT '{name}' AS column_name,
             CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (WHERE half = 2) AS BIGINT) AS n_b,
             CAST(1000000 * COUNT(*) FILTER (WHERE half = 1 AND v IS NULL)
                  // COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS null_ppm_a,
             CAST(1000000 * COUNT(*) FILTER (WHERE half = 2 AND v IS NULL)
                  // COUNT(*) FILTER (WHERE half = 2) AS BIGINT) AS null_ppm_b,
             CAST(COUNT(DISTINCT v) FILTER (WHERE half = 1) AS BIGINT) AS distinct_a,
             CAST(COUNT(DISTINCT v) FILTER (WHERE half = 2) AS BIGINT) AS distinct_b,
             CAST((SELECT COUNT(*) FROM (
                SELECT DISTINCT v FROM snap WHERE half = 2 AND v IS NOT NULL
                EXCEPT
                SELECT DISTINCT v FROM snap WHERE half = 1 AND v IS NOT NULL
             ) WHERE v IN (SELECT {expr} FROM halves WHERE half = 2)) AS BIGINT)
               AS new_values_b
      FROM snap
"""


@register(
    "quality_schema_drift",
    oracle="""
    WITH halves AS (
      SELECT *, CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE 2 END AS half
      FROM orders
    ),
    profiles AS (
      SELECT column_name, half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct
      FROM (
        SELECT 'o_orderstatus' AS column_name, half, o_orderstatus AS v FROM halves
        UNION ALL
        SELECT 'o_orderpriority', half, o_orderpriority FROM halves
        UNION ALL
        SELECT 'o_custkey', half, CAST(o_custkey AS VARCHAR) FROM halves
        UNION ALL
        SELECT 'price_band', half,
               CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)
        FROM halves
      ) long GROUP BY column_name, half
    ),
    newv AS (
      SELECT column_name, CAST(COUNT(*) AS BIGINT) AS new_values_b FROM (
        SELECT column_name, v FROM (
          SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v
          FROM halves WHERE half = 2
          UNION ALL SELECT 'o_orderpriority', o_orderpriority
          FROM halves WHERE half = 2
          UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
          FROM halves WHERE half = 2
          UNION ALL SELECT 'price_band',
               CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)
          FROM halves WHERE half = 2
        ) WHERE v IS NOT NULL
        EXCEPT
        SELECT column_name, v FROM (
          SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v
          FROM halves WHERE half = 1
          UNION ALL SELECT 'o_orderpriority', o_orderpriority
          FROM halves WHERE half = 1
          UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
          FROM halves WHERE half = 1
          UNION ALL SELECT 'price_band',
               CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)
          FROM halves WHERE half = 1
        ) WHERE v IS NOT NULL
      ) GROUP BY column_name
    )
    SELECT a.column_name,
           a.n AS n_a, b.n AS n_b,
           CAST(1000000 * a.n_null // a.n AS BIGINT) AS null_ppm_a,
           CAST(1000000 * b.n_null // b.n AS BIGINT) AS null_ppm_b,
           a.n_distinct AS distinct_a, b.n_distinct AS distinct_b,
           COALESCE(nv.new_values_b, 0) AS new_values_b
    FROM profiles a
    JOIN profiles b ON b.column_name = a.column_name AND b.half = 2
    LEFT JOIN newv nv ON nv.column_name = a.column_name
    WHERE a.half = 1
    """,
)
def quality_schema_drift_q(spark, sf_dir):
    """Cross-snapshot column-profile drift monitor — the ingest-health
    check a long-running 100 TB pipeline runs between loads: for each
    profiled column, row count, exact null ppm, distinct cardinality, and
    the count of values NEW in the later snapshot (a new enum value or
    key range = upstream schema/semantics drift, caught before it poisons
    training).  Snapshots here are the calendar halves of orders
    (month ≤ 6 vs > 6); numerics profile as bounded bands (price DIV
    50000) so cardinality is an enum-shaped signal, not a row count echo.

    100 TB shape: the long unpivot is a projection (no shuffle); profiles
    are one (column, half) hash agg; new-value detection is a left-anti
    join of the two DISTINCT value sets — all exchanges carry (column,
    value) pairs, cardinality-bounded for enum/band columns."""
    orders = _t(spark, sf_dir, "orders").withColumn(
        "half", F.when(F.month("o_orderdate") <= 6, 1).otherwise(2)
    )
    cols = [
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        (
            "price_band",
            F.floor(F.col("o_totalprice") / 50000).cast("long").cast("string"),
        ),
    ]
    long = None
    for name, expr in cols:
        part = orders.select(
            F.lit(name).alias("column_name"), "half", expr.alias("v")
        )
        long = part if long is None else long.unionByName(part)
    profiles = long.groupBy("column_name", "half").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
    )
    vals = long.filter(F.col("v").isNotNull()).select(
        "column_name", "half", "v"
    ).distinct()
    newv = (
        vals.filter(F.col("half") == 2)
        .select("column_name", "v")
        .join(
            vals.filter(F.col("half") == 1).select("column_name", "v"),
            on=["column_name", "v"],
            how="left_anti",
        )
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).cast("long").alias("new_values_b"))
    )
    a = profiles.filter(F.col("half") == 1).select(
        "column_name",
        F.col("n").alias("n_a"),
        F.expr("CAST(1000000 * n_null DIV n AS BIGINT)").alias("null_ppm_a"),
        F.col("n_distinct").alias("distinct_a"),
    )
    b = profiles.filter(F.col("half") == 2).select(
        "column_name",
        F.col("n").alias("n_b"),
        F.expr("CAST(1000000 * n_null DIV n AS BIGINT)").alias("null_ppm_b"),
        F.col("n_distinct").alias("distinct_b"),
    )
    return (
        a.join(b, on="column_name")
        .join(newv, on="column_name", how="left")
        .select(
            "column_name",
            "n_a",
            "n_b",
            "null_ppm_a",
            "null_ppm_b",
            "distinct_a",
            "distinct_b",
            F.coalesce(F.col("new_values_b"), F.lit(0))
            .cast("long")
            .alias("new_values_b"),
        )
    )


# --------------------------------------------------------------------------
# temporal_rate_shift_audit — Poisson rate comparison across the range halves
# --------------------------------------------------------------------------
@register(
    "temporal_rate_shift_audit",
    oracle="""
    WITH bounds AS (
      SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS lo,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS hi
      FROM events
    ),
    marked AS (
      SELECT event_type,
             CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT) * 2 <= b.lo + b.hi
                  THEN 1 ELSE 2 END AS half
      FROM events, bounds b
    )
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS n1,
           CAST(COUNT(*) FILTER (WHERE half = 2) AS BIGINT) AS n2,
           CAST(COUNT(*) FILTER (WHERE half = 1)
                - COUNT(*) FILTER (WHERE half = 2) AS HUGEINT)
           * (COUNT(*) FILTER (WHERE half = 1) - COUNT(*) FILTER (WHERE half = 2))
           > 4 * CAST(COUNT(*) AS HUGEINT) AS shifted
    FROM marked GROUP BY event_type
    """,
)
def temporal_rate_shift_audit_q(spark, sf_dir):
    """Per-event-type Poisson rate-shift audit between the two halves of
    the observed time range — the change-detection face of the
    interarrival family: under equal exposure, the two-rate z statistic
    is (n1−n2)/√(n1+n2), and |z| > 2 is the EXACT integer predicate
    (n1−n2)² > 4·(n1+n2) — no float, no sqrt, engines agree on boundary
    counts.  The half boundary itself is integer epoch arithmetic
    (2·epoch ≤ lo+hi) on FLOOR-truncated epochs in BOTH engines (ADVICE
    r11: a bare CAST(epoch(...) AS BIGINT) in DuckDB ROUNDS fractional
    seconds while Spark's timestampdiff truncates — the repo-wide
    CAST(FLOOR(epoch(ts)) AS BIGINT) pattern pins truncation), so a
    midpoint landing exactly between two events buckets identically.

    100 TB shape: one 1-row min/max agg broadcast onto the scan, one
    (event_type)-grain hash agg — two passes over the event stream, no
    joins of data-scale sides."""
    # TZ-free epoch: pure TIMESTAMP_NTZ arithmetic from the NTZ epoch —
    # unix_timestamp() would interpret NTZ in the SESSION timezone, and a
    # DST-bearing session TZ makes offsets non-constant across the range
    # (the engine-rule: all event-time math runs on TIMESTAMP_NTZ).
    epoch_s = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("long")
    events = _t(spark, sf_dir, "events")
    bounds = events.agg(
        F.min(epoch_s).alias("lo"),
        F.max(epoch_s).alias("hi"),
    )
    marked = events.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(epoch_s * 2 <= F.col("lo") + F.col("hi"), 1).otherwise(2).alias("half"),
    )
    return marked.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).cast("long").alias("n2"),
        # DECIMAL(38,0) square (ADVICE doctrine): (n1-n2)^2 wraps BIGINT
        # past ~3e9 single-type events; the oracle's HUGEINT never wraps
        F.expr(
            "CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)"
            " - SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS DECIMAL(38,0))"
            " * (SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)"
            "    - SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END))"
            " > 4 * CAST(COUNT(1) AS DECIMAL(38,0))"
        ).alias("shifted"),
    )


# --------------------------------------------------------------------------
# sample_group_kfold — group-disjoint K-fold assignment + balance audit
# --------------------------------------------------------------------------
@register(
    "sample_group_kfold",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             ('0x' || substring(md5('kfold|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 5 AS fold
      FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM assigned)
    SELECT fold,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1000000 * COUNT(*) // t.n AS BIGINT) AS rows_ppm
    FROM assigned, tot t GROUP BY fold, t.n
    """,
)
def sample_group_kfold_q(spark, sf_dir):
    """Group-disjoint K-fold assignment (K=5) with the balance audit: the
    fold is a pure md5 function of the GROUP key (user_id), so every row
    of a user lands in one fold BY CONSTRUCTION — the leakage-free CV
    split for entity-correlated data (`sample_split_by_group` generalized
    from one holdout to K rotating folds) — and any engine, any
    parallelism, any day reproduces the same assignment.  The audit
    reports per-fold group counts, row counts, and exact row share in
    ppm (group sizes vary, so row balance ≠ group balance — the thing
    this audit exists to surface).

    100 TB shape: fold is a projection (no shuffle for the assignment
    itself); the audit is one (fold)-grain agg + a 1-row total broadcast.
    """
    events = _t(spark, sf_dir, "events")
    assigned = events.select(
        "user_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("kfold|"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 5
        ).alias("fold"),
    )
    tot = assigned.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        assigned.groupBy("fold")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_groups"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "n_groups",
            "n_rows",
            F.expr("CAST(1000000 * n_rows DIV n AS BIGINT)").alias("rows_ppm"),
        )
    )


# --------------------------------------------------------------------------
# contamination_substring_scan — exact-substring decontamination
# --------------------------------------------------------------------------
@register(
    "contamination_substring_scan",
    oracle="""
    WITH probes AS (
      SELECT doc_id AS probe_id, substring(text, 21, 24) AS probe
      FROM documents WHERE doc_id < 20 AND length(text) >= 44
    ),
    hits AS (
      SELECT p.probe_id, d.doc_id
      FROM probes p JOIN documents d
        ON d.doc_id <> p.probe_id AND position(p.probe IN d.text) > 0
    )
    SELECT p.probe_id,
           CAST(COALESCE(COUNT(h.doc_id), 0) AS BIGINT) AS n_docs_hit,
           CAST(MIN(h.doc_id) AS BIGINT) AS min_hit_doc
    FROM probes p LEFT JOIN hits h ON h.probe_id = p.probe_id
    GROUP BY p.probe_id
    """,
)
def contamination_substring_scan_q(spark, sf_dir):
    """EXACT-substring decontamination scan: 24-char probes lifted from 20
    held-out documents (chars 21-44 — mid-document, where boilerplate
    headers don't alias) scanned against every OTHER document with
    locate()/position() — the exact-match complement of the
    shingle-overlap `contamination_ngram` (which tolerates edits but
    can false-positive on common phrasing; a verbatim 24-char hit is
    near-certain leakage).  Emits per probe the contaminated-doc count
    and the smallest hit id (a deterministic exemplar for triage); zero
    hits still emit the probe row (NULL exemplar).

    100 TB shape: probes are a broadcast dim (the benchmark suite — KB);
    the corpus scans ONCE with the probe set resident per task (at real
    probe counts the per-task matcher is Aho-Corasick over the broadcast
    set inside one mapInPandas pass — same plan shape, one scan); the
    only exchange is the |probes|-grain census."""
    docs = _t(spark, sf_dir, "documents")
    probes = docs.filter(
        (F.col("doc_id") < 20) & (F.length("text") >= 44)
    ).select(
        F.col("doc_id").alias("probe_id"),
        F.substring("text", 21, 24).alias("probe"),
    )
    hits = (
        docs.crossJoin(F.broadcast(probes))
        .filter(
            (F.col("doc_id") != F.col("probe_id"))
            & (F.expr("locate(probe, text)") > 0)
        )
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_hit"),
            F.min("doc_id").cast("long").alias("min_hit_doc"),
        )
    )
    return (
        probes.select("probe_id")
        .join(hits, on="probe_id", how="left")
        .select(
            "probe_id",
            F.coalesce(F.col("n_docs_hit"), F.lit(0)).cast("long").alias("n_docs_hit"),
            F.col("min_hit_doc").cast("long").alias("min_hit_doc"),
        )
    )


# --------------------------------------------------------------------------
# stream_expectations_maintain — the data-quality scorecard as IVM
# --------------------------------------------------------------------------
@register(
    "stream_expectations_maintain",
    oracle="""
    SELECT "constraint", violations, violations = 0 AS passed FROM (
      SELECT 'fk(o_custkey->customer)' AS "constraint",
             CAST((SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
                   AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) AS violations
      UNION ALL
      SELECT 'in_range(o_totalprice,0.0,1000000.0)',
             CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice IS NOT NULL
                   AND (o_totalprice < 0 OR o_totalprice > 1000000)) AS BIGINT)
      UNION ALL
      SELECT 'matches_regex(o_orderpriority)',
             CAST((SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NOT NULL
                   AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$')) AS BIGINT)
      UNION ALL
      SELECT 'not_null(o_custkey)',
             CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
      UNION ALL
      SELECT 'not_null(o_orderkey)',
             CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT)
      UNION ALL
      SELECT 'unique(o_orderkey)',
             CAST(COALESCE((SELECT SUM(n) FROM (
               SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
             )), 0) AS BIGINT)
    ) t ORDER BY "constraint"
    """,
)
def stream_expectations_maintain_q(spark, sf_dir):
    """`quality_expectations` as incremental view maintenance — the
    continuous data-quality gate: row-level constraint violations
    (not-null, in-range, regex) and FK misses against the STATIC customer
    dim are judged per row, so their counts fold by pure SUM — additive,
    bundling-independent.  Uniqueness is NOT batch-additive (two halves
    of a duplicate pair can arrive in different batches), so the
    maintainer keeps the (o_orderkey, n) key census — the
    `stream_hapax_maintain` census-not-face doctrine — and the
    duplicate-row count is a read-time face over census rows with n > 1.
    Shares the batch row's oracle verbatim: stream-maintained == batch ==
    DuckDB, hash-exact.

    100 TB shape: per trigger O(batch) row judgments + one broadcast
    anti-join against the dim + a keyed census merge; the corpus is never
    rescanned; counter state is 5 rows, census state O(distinct keys)."""
    import shutil
    import tempfile

    from ..streaming import read_orders_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_expect_")
    counters_path = root + "/counters"
    census_path = root + "/census"

    customer = _t(spark, sf_dir, "customer").select("c_custkey")

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        fk_miss = (
            batch_df.filter(F.col("o_custkey").isNotNull())
            .join(
                F.broadcast(customer),
                batch_df["o_custkey"] == customer["c_custkey"],
                "left_anti",
            )
            .count()
        )
        row_counts = batch_df.agg(
            F.sum(
                F.when(
                    F.col("o_totalprice").isNotNull()
                    & ((F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 1000000)),
                    1,
                ).otherwise(0)
            ).alias("in_range"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isNotNull()
                    & ~F.col("o_orderpriority").rlike("^[0-9]-[A-Z ]+$"),
                    1,
                ).otherwise(0)
            ).alias("regex"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
                "nn_cust"
            ),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "nn_key"
            ),
        ).collect()[0]
        part = sp.createDataFrame(
            [
                ("fk(o_custkey->customer)", fk_miss),
                ("in_range(o_totalprice,0.0,1000000.0)", int(row_counts.in_range or 0)),
                ("matches_regex(o_orderpriority)", int(row_counts.regex or 0)),
                ("not_null(o_custkey)", int(row_counts.nn_cust or 0)),
                ("not_null(o_orderkey)", int(row_counts.nn_key or 0)),
            ],
            "constraint string, violations long",
        )
        state = read_state_parquet(sp, counters_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("constraint")
                .agg(F.sum("violations").cast("long").alias("violations"))
            )
        else:  # first batch
            merged = part
        commit_state_parquet(merged, counters_path)

        key_part = batch_df.groupBy("o_orderkey").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        census = read_state_parquet(sp, census_path)
        if census is not None:
            merged_census = (
                census.unionByName(key_part)
                .groupBy("o_orderkey")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        else:  # first batch
            merged_census = key_part
        commit_state_parquet(merged_census, census_path)

    query = (
        read_orders_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    counters = spark.read.parquet(counters_path)
    dup = (
        spark.read.parquet(census_path)
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("violations"))
        .select(F.lit("unique(o_orderkey)").alias("constraint"), "violations")
    )
    out = (
        counters.unionByName(dup)
        .select(
            "constraint",
            F.col("violations").cast("long").alias("violations"),
            (F.col("violations") == 0).alias("passed"),
        )
        .orderBy("constraint")
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# stream_schema_drift_maintain — the drift profile as IVM
# --------------------------------------------------------------------------
@register(
    "stream_schema_drift_maintain",
    oracle="""
    WITH halves AS (
      SELECT *, CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE 2 END AS half
      FROM orders
    ),
    profiles AS (
      SELECT column_name, half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct
      FROM (
        SELECT 'o_orderstatus' AS column_name, half, o_orderstatus AS v FROM halves
        UNION ALL
        SELECT 'o_orderpriority', half, o_orderpriority FROM halves
        UNION ALL
        SELECT 'o_custkey', half, CAST(o_custkey AS VARCHAR) FROM halves
        UNION ALL
        SELECT 'price_band', half,
               CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)
        FROM halves
      ) long GROUP BY column_name, half
    ),
    newv AS (
      SELECT column_name, CAST(COUNT(*) AS BIGINT) AS new_values_b FROM (
        SELECT column_name, v FROM (
          SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v
          FROM halves WHERE half = 2
          UNION ALL SELECT 'o_orderpriority', o_orderpriority
          FROM halves WHERE half = 2
          UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
          FROM halves WHERE half = 2
          UNION ALL SELECT 'price_band',
               CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)
          FROM halves WHERE half = 2
        ) WHERE v IS NOT NULL
        EXCEPT
        SELECT column_name, v FROM (
          SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v
          FROM halves WHERE half = 1
          UNION ALL SELECT 'o_orderpriority', o_orderpriority
          FROM halves WHERE half = 1
          UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR)
          FROM halves WHERE half = 1
          UNION ALL SELECT 'price_band',
               CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)
          FROM halves WHERE half = 1
        ) WHERE v IS NOT NULL
      ) GROUP BY column_name
    )
    SELECT a.column_name,
           a.n AS n_a, b.n AS n_b,
           CAST(1000000 * a.n_null // a.n AS BIGINT) AS null_ppm_a,
           CAST(1000000 * b.n_null // b.n AS BIGINT) AS null_ppm_b,
           a.n_distinct AS distinct_a, b.n_distinct AS distinct_b,
           COALESCE(nv.new_values_b, 0) AS new_values_b
    FROM profiles a
    JOIN profiles b ON b.column_name = a.column_name AND b.half = 2
    LEFT JOIN newv nv ON nv.column_name = a.column_name
    WHERE a.half = 1
    """,
)
def stream_schema_drift_maintain_q(spark, sf_dir):
    """`quality_schema_drift` as incremental view maintenance — the drift
    monitor running CONTINUOUSLY on the ingest stream: the maintained
    state is the (column, half, value, n) value census plus per-(column,
    half) null counters, both pure-SUM lattices (bundling-independent —
    any micro-batch split of the corpus converges to the same census);
    null ppm, distinct cardinality, and new-value detection are all
    READ-TIME faces over census rows (distinctness is NOT batch-additive
    — the `stream_hapax_maintain` census-not-face doctrine).  Shares the
    batch row's oracle verbatim: stream == batch == DuckDB, hash-exact.

    100 TB shape: per trigger O(batch) projection + keyed census merge
    (state bounded by value cardinality — enum/band columns by design);
    the face joins census halves, never rescanning the corpus."""
    import shutil
    import tempfile

    from ..streaming import read_orders_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_drift_")
    census_path = root + "/census"
    nulls_path = root + "/nulls"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        half = F.when(F.month("o_orderdate") <= 6, 1).otherwise(2)
        b = batch_df.withColumn("half", half)
        cols = [
            ("o_orderstatus", F.col("o_orderstatus")),
            ("o_orderpriority", F.col("o_orderpriority")),
            ("o_custkey", F.col("o_custkey").cast("string")),
            (
                "price_band",
                F.floor(F.col("o_totalprice") / 50000).cast("long").cast("string"),
            ),
        ]
        long = None
        for name, expr in cols:
            part = b.select(
                F.lit(name).alias("column_name"), "half", expr.alias("v")
            )
            long = part if long is None else long.unionByName(part)
        census_part = (
            long.filter(F.col("v").isNotNull())
            .groupBy("column_name", "half", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        nulls_part = long.groupBy("column_name", "half").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
        )
        census = read_state_parquet(sp, census_path)
        if census is not None:
            merged = (
                census.unionByName(census_part)
                .groupBy("column_name", "half", "v")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        else:  # first batch
            merged = census_part
        commit_state_parquet(merged, census_path)

        nulls = read_state_parquet(sp, nulls_path)
        if nulls is not None:
            merged_n = (
                nulls.unionByName(nulls_part)
                .groupBy("column_name", "half")
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.sum("n_null").cast("long").alias("n_null"),
                )
            )
        else:  # first batch
            merged_n = nulls_part
        commit_state_parquet(merged_n, nulls_path)

    query = (
        read_orders_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    census = spark.read.parquet(census_path)
    nulls = spark.read.parquet(nulls_path)
    prof = nulls.join(
        census.groupBy("column_name", "half").agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct")
        ),
        on=["column_name", "half"],
    )
    vals = census.select("column_name", "half", "v")
    newv = (
        vals.filter(F.col("half") == 2)
        .select("column_name", "v")
        .join(
            vals.filter(F.col("half") == 1).select("column_name", "v"),
            on=["column_name", "v"],
            how="left_anti",
        )
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).cast("long").alias("new_values_b"))
    )
    a = prof.filter(F.col("half") == 1).select(
        "column_name",
        F.col("n").alias("n_a"),
        F.expr("CAST(1000000 * n_null DIV n AS BIGINT)").alias("null_ppm_a"),
        F.col("n_distinct").alias("distinct_a"),
    )
    bb = prof.filter(F.col("half") == 2).select(
        "column_name",
        F.col("n").alias("n_b"),
        F.expr("CAST(1000000 * n_null DIV n AS BIGINT)").alias("null_ppm_b"),
        F.col("n_distinct").alias("distinct_b"),
    )
    out = (
        a.join(bb, on="column_name")
        .join(newv, on="column_name", how="left")
        .select(
            "column_name",
            "n_a",
            "n_b",
            "null_ppm_a",
            "null_ppm_b",
            "distinct_a",
            "distinct_b",
            F.coalesce(F.col("new_values_b"), F.lit(0))
            .cast("long")
            .alias("new_values_b"),
        )
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# quality_column_collision_profile — selectivity / uniqueness profiling
# --------------------------------------------------------------------------
@register(
    "quality_column_collision_profile",
    oracle="""
    WITH long AS (
      SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v FROM orders
      UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL SELECT 'price_band',
           CAST(CAST(floor(o_totalprice / 50000) AS BIGINT) AS VARCHAR)
      FROM orders
    ),
    counts AS (
      SELECT column_name, v, CAST(COUNT(*) AS BIGINT) AS n
      FROM long WHERE v IS NOT NULL GROUP BY column_name, v
    )
    SELECT column_name,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS DOUBLE) AS collision_mass,
           CAST(CASE WHEN SUM(n) > 1
                THEN 1000000 * SUM(CAST(n AS HUGEINT) * (n - 1))
                     // (CAST(SUM(n) AS HUGEINT) * (SUM(n) - 1))
                END AS BIGINT) AS collision_ppm
    FROM counts GROUP BY column_name
    """,
)
def quality_column_collision_profile_q(spark, sf_dir):
    """Per-column collision (Simpson/Gini) profile — the EXACT probability
    that two random non-null rows share a value, 1e6·Σn_v(n_v−1) DIV
    (N(N−1)) — the selectivity statistic join planners and
    uniqueness-drift monitors want: a key column reads ~0 ppm, an enum
    reads ~1e6/|enum|, and a creeping duplicate-key bug moves the number
    BEFORE a uniqueness constraint hard-fails.  Arithmetic stays in
    DECIMAL(38,0)/HUGEINT with pmod-exact floor division (the Brier
    doctrine): Σn_v(n_v−1) reaches N² at full concentration, past BIGINT
    for N beyond ~3e9 rows.

    100 TB shape: one long unpivot (projection), one (column, value) hash
    agg, one |columns|-row rollup — no joins of data-scale sides."""
    orders = _t(spark, sf_dir, "orders")
    cols = [
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        (
            "price_band",
            F.floor(F.col("o_totalprice") / 50000).cast("long").cast("string"),
        ),
    ]
    long = None
    for name, expr in cols:
        part = orders.select(F.lit(name).alias("column_name"), expr.alias("v"))
        long = part if long is None else long.unionByName(part)
    counts = (
        long.filter(F.col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return counts.groupBy("column_name").agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        # DOUBLE for the cross-engine surface (Decimal stringification
        # differs; the catalog-header rule) — the EXACT value still drives
        # collision_ppm below in full DECIMAL(38,0) arithmetic
        F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * (n - 1)"))
        .cast("double")
        .alias("collision_mass"),
        # N <= 1 guard: a single-non-null-row column has no pair to
        # collide — NULL by contract in BOTH engines (DuckDB would error
        # on the bare zero division, Spark non-ANSI would NULL silently)
        F.expr(
            "CASE WHEN SUM(n) > 1 THEN"
            " (1000000 * SUM(CAST(n AS DECIMAL(38,0)) * (n - 1))"
            " - pmod(1000000 * SUM(CAST(n AS DECIMAL(38,0)) * (n - 1)),"
            "        CAST(SUM(n) AS DECIMAL(38,0)) * (SUM(n) - 1)))"
            " / (CAST(SUM(n) AS DECIMAL(38,0)) * (SUM(n) - 1)) END"
        )
        .cast("long")
        .alias("collision_ppm"),
    )


# --------------------------------------------------------------------------
# agg_weighted_median — exact weighted median per group
# --------------------------------------------------------------------------
@register(
    "agg_weighted_median",
    oracle="""
    WITH wq AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ),
    cum AS (
      SELECT flag, q, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY q) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM wq
    )
    SELECT flag, CAST(MIN(q) AS BIGINT) AS weighted_median
    FROM cum WHERE 2 * cw >= tw GROUP BY flag
    """,
)
def agg_weighted_median_q(spark, sf_dir):
    """Exact weighted median per group — the smallest value whose
    cumulative weight reaches half the group's total (weights here:
    revenue cents per quantity level, so the median is
    revenue-representative, not row-representative — the robust central
    statistic cost models and SLA reports want).  Pure integer contract:
    weights pre-aggregate per (group, value) so the cumulative window
    runs over value-cardinality rows, and the 2·cw ≥ tw predicate avoids
    any division.

    100 TB shape: one (group, value) hash agg with map-side combine, then
    a window over the BOUNDED per-group value grid (quantities: tens) —
    the corpus shuffles once at (group, value) grain, never row grain."""
    li = _t(spark, sf_dir, "lineitem")
    wq = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("w")
    )
    w_cum = Window.partitionBy("flag").orderBy("q")
    cum = wq.select(
        "flag",
        "q",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("q").cast("long").alias("weighted_median"))
    )


# --------------------------------------------------------------------------
# pairs_hard_negatives — hard-negative mining over the embedding corpus
# --------------------------------------------------------------------------
@register(
    "pairs_hard_negatives",
    oracle="""
    WITH corpus AS (SELECT vec_id, embedding, label FROM embeddings),
    quant AS (
      SELECT vec_id, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS v
      FROM corpus, generate_series(1, 64) t(i)
      WHERE i <= len(embedding)
    ),
    dots AS (
      SELECT q.vec_id AS anchor, t.vec_id AS cand, SUM(q.v * t.v) AS dot
      FROM quant q JOIN quant t ON q.i = t.i
      JOIN corpus ca ON ca.vec_id = q.vec_id
      JOIN corpus ct ON ct.vec_id = t.vec_id
      WHERE q.vec_id < 16 AND ct.label <> ca.label
      GROUP BY q.vec_id, t.vec_id
    ),
    ranked AS (
      SELECT anchor, cand, dot,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY dot DESC, cand ASC) AS rn
      FROM dots
    )
    SELECT r.anchor, r.cand AS negative, CAST(r.dot AS BIGINT) AS dot_q,
           CAST(ca.label AS BIGINT) AS anchor_label,
           CAST(ct.label AS BIGINT) AS negative_label
    FROM ranked r
    JOIN corpus ca ON ca.vec_id = r.anchor
    JOIN corpus ct ON ct.vec_id = r.cand
    WHERE r.rn = 1
    """,
)
def pairs_hard_negatives_q(spark, sf_dir):
    """Hard-negative mining — for each anchor, the OTHER-labeled vector
    with the highest quantized dot product (ties to the smallest id):
    the contrastive-training pair generator that turns an embedding
    corpus into (anchor, hard negative) rows — easy negatives teach
    nothing, the nearest wrong-label point is where the margin lives.
    Integer dots on HALF_UP-quantized vectors (the `quantize_vec`
    contract) make the argmax deterministic cross-engine.

    Gate tier scans |anchors|=16 broadcast against the corpus (the
    `similarity_topk` waiver); at scale the candidate stage routes
    through the ANN rungs exactly like `similarity_range_search` —
    hard-negative mining IS a top-1 query with a label-inequality
    filter, so every bucketed rung composes.

    100 TB shape: anchor side broadcast; one corpus scan; per-anchor
    argmax via window over the candidate rows."""
    from ..operators.similarity import quantize_vec

    em = _t(spark, sf_dir, "embeddings").select(
        "vec_id", quantize_vec(F.col("embedding")).alias("qv"), "label"
    )
    anchors = em.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("anchor"),
        F.col("qv").alias("a_qv"),
        F.col("label").alias("anchor_label"),
    )
    cands = em.crossJoin(F.broadcast(anchors)).filter(
        F.col("label") != F.col("anchor_label")
    )
    scored = cands.select(
        "anchor",
        "anchor_label",
        F.col("vec_id").alias("negative"),
        F.col("label").alias("negative_label"),
        F.aggregate(
            F.zip_with("a_qv", "qv", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot_q"),
    )
    w = Window.partitionBy("anchor").orderBy(
        F.col("dot_q").desc(), F.col("negative").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor",
            "negative",
            F.col("dot_q").cast("long").alias("dot_q"),
            F.col("anchor_label").cast("long").alias("anchor_label"),
            F.col("negative_label").cast("long").alias("negative_label"),
        )
    )


# --------------------------------------------------------------------------
# eval_threshold_best_f1 — exact best-F1 operating point
# --------------------------------------------------------------------------
@register(
    "eval_threshold_best_f1",
    oracle="""
    WITH scored AS (
      SELECT
        CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) AS score,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    grid AS (
      SELECT score,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM scored GROUP BY score
    ),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p FROM grid),
    sweep AS (
      SELECT score AS threshold,
             SUM(pos) OVER (ORDER BY score DESC) AS tp,
             SUM(n - pos) OVER (ORDER BY score DESC) AS fp
      FROM grid
    ),
    f1 AS (
      SELECT threshold, tp, fp, t.p - tp AS fn,
             CAST(CASE WHEN 2 * tp + fp + (t.p - tp) > 0
                  THEN 1000000 * 2 * tp // (2 * tp + fp + (t.p - tp))
                  ELSE 0 END AS BIGINT) AS f1_ppm
      FROM sweep, tot t
    )
    SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, f1_ppm
    FROM f1
    ORDER BY f1_ppm DESC, threshold ASC LIMIT 1
    """,
)
def eval_threshold_best_f1_q(spark, sf_dir):
    """Exact best-F1 operating point — the threshold a deployed binary
    detector actually ships with, computed by sweeping EVERY distinct
    score value with descending-cumulative TP/FP windows (the
    `eval_pr_curve` machinery) and arg-maxing F1 in exact truncated ppm
    (ties to the LOWEST threshold — prefer recall at equal F1; the
    tie-break is part of the contract, so both engines pick the same
    point even on F1 plateaus).  Same stopword-English-ness score and
    lang='en' labels as the Brier/detector family, so the eval rows
    compose into one consistent suite.

    100 TB shape: one (score)-grain hash agg, one window over the
    BOUNDED score grid (≤ 1e6+1 distinct ppm values), a 1-row argmax."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    stop = F.filter(
        toks, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is")
    )
    scored = docs.select(
        (F.lit(1000000) * F.size(stop)).cast("long").alias("_num"),
        F.size(toks).cast("long").alias("_den"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    ).select(F.expr("CAST(_num DIV _den AS BIGINT)").alias("score"), "y")
    grid = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = grid.agg(F.sum("pos").cast("long").alias("p"))
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = grid.select(
        F.col("score").alias("threshold"),
        F.sum("pos").over(w).alias("tp"),
        F.sum(F.col("n") - F.col("pos")).over(w).alias("fp"),
    )
    f1 = sweep.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "tp",
        "fp",
        (F.col("p") - F.col("tp")).alias("fn"),
        # zero-denominator guard (all-negative corpus at the top
        # threshold): F1 defined as 0 there, in BOTH engines
        F.expr(
            "CAST(CASE WHEN 2 * tp + fp + (p - tp) > 0"
            " THEN 1000000 * 2 * tp DIV (2 * tp + fp + (p - tp))"
            " ELSE 0 END AS BIGINT)"
        ).alias("f1_ppm"),
    )
    pick = Window.orderBy(F.col("f1_ppm").desc(), F.col("threshold").asc())
    return (
        f1.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "threshold",
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.col("fn").cast("long").alias("fn"),
            "f1_ppm",
        )
    )


# --------------------------------------------------------------------------
# agg_mode_per_group — exact mode with deterministic tie-break
# --------------------------------------------------------------------------
@register(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT o_orderpriority AS grp, o_orderstatus AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    ranked AS (
      SELECT grp, v, n,
             row_number() OVER (PARTITION BY grp ORDER BY n DESC, v ASC) AS rn
      FROM counts
    )
    SELECT grp, v AS mode_value, n AS mode_count FROM ranked WHERE rn = 1
    """,
)
def agg_mode_per_group_q(spark, sf_dir):
    """Exact per-group mode with a DETERMINISTIC tie-break (highest count,
    ties to the lexicographically smallest value — arrival-order modes
    are nondeterministic under any parallelism, which is why naive
    first-seen implementations can't be hash-gated).  The categorical
    central-tendency primitive next to `agg_weighted_median`.

    100 TB shape: one (group, value) hash agg with map-side combine, then
    a window over value-cardinality rows per group — the classic
    two-level regroup; never a corpus-grain window."""
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderstatus").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("grp").orderBy(F.col("n").desc(), F.col("v").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("grp", F.col("v").alias("mode_value"), F.col("n").alias("mode_count"))
    )


# --------------------------------------------------------------------------
# sample_balanced_downsample — auto-balance to the minority class
# --------------------------------------------------------------------------
@register(
    "sample_balanced_downsample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5('bal|' || CAST(doc_id AS VARCHAR)), doc_id) AS r
      FROM documents
    ),
    floor_n AS (
      SELECT CAST(MIN(n) AS BIGINT) AS k FROM (
        SELECT COUNT(*) AS n FROM documents GROUP BY lang
      )
    )
    SELECT r.doc_id, r.lang
    FROM ranked r, floor_n f WHERE r.r <= f.k
    """,
)
def sample_balanced_downsample_q(spark, sf_dir):
    """Class-balanced downsampling — every class kept at EXACTLY the
    minority-class size, members chosen by md5 rank within the class (the
    md5-pure-function sampling family: any engine, any parallelism, any
    day selects the same rows — rerunnable data curation, not a coin
    flip).  The complement of `sample_class_weights` (reweight instead of
    drop) and the auto-K form of `sample_cap_per_group` (the cap is
    COMPUTED — min class size — not configured).

    100 TB shape: one (class)-grain count agg (KB) broadcast as the cap,
    one md5 rank window per class partition, no joins of data-scale
    sides; the md5 sort key is uniform so class partitions are balanced
    by construction."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("bal|"), F.col("doc_id").cast("string"))), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "lang", F.row_number().over(w).alias("r"))
    k = docs.groupBy("lang").count().agg(F.min("count").cast("long").alias("k"))
    return (
        ranked.crossJoin(F.broadcast(k))
        .filter(F.col("r") <= F.col("k"))
        .select("doc_id", "lang")
    )


# --------------------------------------------------------------------------
# text_ngram_novelty_profile — per-document novelty vs everything earlier
# --------------------------------------------------------------------------
@register(
    "text_ngram_novelty_profile",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, substring(substring(text, 1, 100), i, 8) AS g
      FROM documents, generate_series(1, 93) t(i)
      WHERE doc_id < 200 AND i <= greatest(length(substring(text, 1, 100)) - 7, 0)
    ),
    first_seen AS (
      SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM sh GROUP BY g
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(1000000 * SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM sh s JOIN first_seen f ON f.g = s.g
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty_profile_q(spark, sf_dir):
    """Per-document n-gram NOVELTY against everything earlier in the
    corpus order — the doc-grain face of `text_vocab_growth`: a document
    whose 8-grams were all first seen in EARLIER documents is template
    mass / near-duplicate (novelty → 0), while genuinely new content
    keeps novelty high; the curation signal for ordering-aware dedup
    sweeps and crawl-frontier prioritization.  First-seen attribution is
    MIN(doc_id) per distinct gram — exact, order-free, and retry-safe
    (an arrival-order 'seen set' would be nondeterministic under any
    parallelism).

    100 TB shape: one shingle pass → (gram)-grain MIN agg (the
    first-occurrence index, vocabulary-sized) → one keyed join back to
    the (doc, gram) census; at corpus scale the gram census is the same
    inverted-index shape every dedup family already shuffles."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
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
    first_seen = sh.groupBy("g").agg(F.min("doc_id").cast("long").alias("first_doc"))
    return (
        sh.join(first_seen, on="g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
            F.expr(
                "CAST(1000000 * SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


# --------------------------------------------------------------------------
# stream_weighted_median_maintain — the weighted median as IVM
# --------------------------------------------------------------------------
@register(
    "stream_weighted_median_maintain",
    oracle="""
    WITH wq AS (
      SELECT l_returnflag AS flag,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ),
    cum AS (
      SELECT flag, q, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY q) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM wq
    )
    SELECT flag, CAST(MIN(q) AS BIGINT) AS weighted_median
    FROM cum WHERE 2 * cw >= tw GROUP BY flag
    """,
)
def stream_weighted_median_maintain_q(spark, sf_dir):
    """`agg_weighted_median` as incremental view maintenance: the
    maintained state is the (group, value, weight) census — weights fold
    by pure SUM, so state is bundling-independent — and the median itself
    is a READ-TIME face (a quantile is NOT batch-additive: the median of
    medians is not the median, which is exactly why the census, not the
    statistic, is the IVM-legitimate state — the `stream_pr_curve`
    doctrine applied to weighted order statistics).  Shares the batch
    row's oracle verbatim: stream == batch == DuckDB, hash-exact.

    100 TB shape: per trigger one (group, value) partial agg into
    value-grid-sized state; the face's cumulative window runs over the
    BOUNDED per-group value grid, never the corpus."""
    import shutil
    import tempfile

    from ..streaming import read_lineitem_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_wmed_")
    census_path = root + "/census"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("q"),
        ).agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("w")
        )
        state = read_state_parquet(sp, census_path)
        if state is not None:
            merged = (
                state.unionByName(part)
                .groupBy("flag", "q")
                .agg(F.sum("w").cast("long").alias("w"))
            )
        else:  # first batch
            merged = part
        commit_state_parquet(merged, census_path)

    query = (
        read_lineitem_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    wq = spark.read.parquet(census_path)
    w_cum = Window.partitionBy("flag").orderBy("q")
    cum = wq.select(
        "flag",
        "q",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tw"),
    )
    out = (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("q").cast("long").alias("weighted_median"))
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# sketch_kmv_distinct — k-minimum-values distinct estimation, md5-exact
# --------------------------------------------------------------------------
_KMV_K = 64

_KMV_HASH_SQL = (
    "('0x' || substring(md5('kmv|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT"
)


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH hashes AS (
      SELECT DISTINCT event_type, {_KMV_HASH_SQL} AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
      FROM hashes
    )
    SELECT event_type,
           CAST(MAX(n_distinct) AS BIGINT) AS exact_distinct_hashes,
           CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                ELSE ({_KMV_K} - 1) * 4294967296 // MAX(CASE WHEN rn = {_KMV_K}
                                                        THEN h END)
                END AS BIGINT) AS kmv_estimate
    FROM ranked WHERE rn <= {_KMV_K}
    GROUP BY event_type
    """,
)
def sketch_kmv_distinct_q(spark, sf_dir):
    """K-minimum-values distinct-count sketch — the mergeable sketch rung
    between the exact bitmap (`agg_bitmap_distinct`) and HLL
    (`agg_approx_distinct`): keep the k smallest 32-bit md5 hashes per
    group; estimate = (k−1)·2³² DIV h_k (exact count when the group holds
    ≤ k values — the sketch IS the set there).  Because the hash is md5
    (the portable-function doctrine), the sketch content — and therefore
    the ESTIMATE — is bit-identical in any engine: this gate is
    hash-EXACT, unlike HLL's engine-specific register layouts that force
    `agg_approx_distinct` into a bounded-error contract.  Unlike bitmaps,
    KMV state is O(k) per group at ANY cardinality; unlike HLL, two KMV
    sketches support INTERSECTION estimation (`sketch_kmv_intersection`).
    The `exact_distinct_hashes` audit column counts distinct 32-BIT
    HASHES, not distinct keys (ADVICE r11): at ~100k keys per group,
    birthday collisions in the 32-bit space undercount true distinct keys
    by a few — both engines compute it identically, and the name says
    what it is.

    100 TB shape: one (group, hash)-distinct agg, then a per-group k-min
    (rank window over the group's distinct hashes); state/exchange O(k)
    per group after the distinct; merge of two sketches = k smallest of
    the union — an idempotent, commutative lattice (the IVM twin's
    bundling-independence proof)."""
    events = _t(spark, sf_dir, "events")
    hashes = events.select(
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
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashes.select(
        "event_type",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n_distinct"),
    )
    return (
        ranked.filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(
            F.max("n_distinct").cast("long").alias("exact_distinct_hashes"),
            # sketch-only estimator (identical rule to the IVM twin): the
            # sketch cannot distinguish n == k from n > k, so k_eff == k
            # means the (k-1)*2^32/h_k estimator; exact_distinct_hashes beside
            # is the AUDIT column, never an estimator input
            F.expr(
                f"CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)"
                f" ELSE ({_KMV_K} - 1) * 4294967296 DIV MAX(CASE WHEN rn = {_KMV_K}"
                " THEN h END) END AS BIGINT)"
            ).alias("kmv_estimate"),
        )
    )


# --------------------------------------------------------------------------
# sketch_kmv_intersection — set-overlap estimation from two KMV sketches
# --------------------------------------------------------------------------
@register(
    "sketch_kmv_intersection",
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
      SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS k_both,
             CAST(COUNT(*) AS BIGINT) AS k_eff,
             MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
      FROM topk WHERE rn <= {_KMV_K}
    ),
    exact AS (
      SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter,
             CAST(COUNT(*) AS BIGINT) AS exact_union
      FROM (
        SELECT h,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_b
        FROM sets GROUP BY h
      )
    )
    SELECT s.k_eff, s.k_both,
           CAST(CASE WHEN s.k_eff < {_KMV_K} THEN s.k_eff
                ELSE ({_KMV_K} - 1) * 4294967296 // s.hk END AS BIGINT)
             AS union_estimate,
           CAST(1000000 * s.k_both // s.k_eff AS BIGINT) AS jaccard_est_ppm,
           e.exact_inter, e.exact_union,
           CAST(1000000 * e.exact_inter // e.exact_union AS BIGINT)
             AS jaccard_exact_ppm
    FROM sk s, exact e
    """,
)
def sketch_kmv_intersection_q(spark, sf_dir):
    """Set-INTERSECTION estimation from two KMV sketches — the operation
    HLL cannot do without inclusion-exclusion error blowup and the reason
    KMV earns its place on the sketch ladder.  Pure SKETCH ALGEBRA: the
    union sketch is the k smallest of the two per-set sketches' union
    (<= 2k rows), and membership flags come from the sketches themselves
    — provably identical to flagging against the full sets (h in the
    union sketch and h in A implies h in A's sketch: fewer than k union
    hashes precede h, so fewer than k A-hashes do), so no corpus-grain
    global window ever runs.  The fraction of union-sketch hashes in both
    sets estimates Jaccard; |A intersect B| ~ J_hat * |A union B|.  md5
    hashing keeps sketch content — hence the estimate AND the audit
    columns (exact overlap computed beside it) — bit-identical
    cross-engine: a hash-exact gate for an approximate algorithm, the
    `similarity_ann_recall` measure-the-estimator doctrine.

    100 TB shape: per-set k-min windows partition by set; everything
    after is <= 2k rows; only the EXACT audit columns scan data, and
    they drop at production scale leaving pure sketch algebra."""
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
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("k_both"),
        F.count(F.lit(1)).cast("long").alias("k_eff"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
    )
    exact = (
        sets.groupBy("h")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "in_b"
            ),
        )
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("exact_inter"),
            F.count(F.lit(1)).cast("long").alias("exact_union"),
        )
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        "k_eff",
        "k_both",
        F.expr(
            f"CAST(CASE WHEN k_eff < {_KMV_K} THEN k_eff"
            f" ELSE ({_KMV_K} - 1) * 4294967296 DIV hk END AS BIGINT)"
        ).alias("union_estimate"),
        F.expr("CAST(1000000 * k_both DIV k_eff AS BIGINT)").alias("jaccard_est_ppm"),
        "exact_inter",
        "exact_union",
        F.expr("CAST(1000000 * exact_inter DIV exact_union AS BIGINT)").alias(
            "jaccard_exact_ppm"
        ),
    )


# --------------------------------------------------------------------------
# stream_kmv_maintain — the KMV sketch as IVM
# --------------------------------------------------------------------------
@register(
    "stream_kmv_maintain",
    oracle=f"""
    WITH hashes AS (
      SELECT DISTINCT event_type, {_KMV_HASH_SQL} AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashes
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS k_eff,
           CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                ELSE ({_KMV_K} - 1) * 4294967296 // MAX(CASE WHEN rn = {_KMV_K}
                                                        THEN h END)
                END AS BIGINT) AS kmv_estimate
    FROM ranked WHERE rn <= {_KMV_K}
    GROUP BY event_type
    """,
)
def stream_kmv_maintain_q(spark, sf_dir):
    """The KMV sketch as incremental view maintenance — the sketch the
    maintainer keeps IS the state: per group the k smallest hashes, and
    merge(old sketch, batch sketch) = k smallest of the union — an
    idempotent, commutative, associative lattice, so ANY micro-batch
    bundling converges to the same sketch (the strongest
    bundling-independence of all the IVM twins: not just additive, a
    true semilattice).  The estimate is a read-time face over ≤ k state
    rows per group.  Unlike `stream_hapax_maintain`'s vocabulary census
    (state grows with distinct values), KMV state is CAPPED at k rows
    per group at ANY cardinality — the sketch family's whole point.

    Estimator face: k_eff < k means the sketch holds the entire set —
    exact count; at k_eff == k, (k−1)·2³² DIV h_k.

    100 TB shape: per trigger O(batch) hashing + a per-group k-min over
    (state ∪ batch-mins) — state rows ≤ k·|groups| forever."""
    import shutil
    import tempfile

    from ..streaming import read_events_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_kmv_")
    sketch_path = root + "/sketch"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        part = batch_df.select(
            "event_type",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        ).distinct()
        state = read_state_parquet(sp, sketch_path)
        pool = state.unionByName(part).distinct() if state is not None else part
        w = Window.partitionBy("event_type").orderBy("h")
        merged = (
            pool.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _KMV_K)
            .select("event_type", "h")
        )
        commit_state_parquet(merged, sketch_path)

    query = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    sketch = spark.read.parquet(sketch_path)
    w = Window.partitionBy("event_type").orderBy("h")
    out = (
        sketch.withColumn("rn", F.row_number().over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_eff"),
            F.expr(
                f"CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)"
                f" ELSE ({_KMV_K} - 1) * 4294967296 DIV MAX(CASE WHEN rn = {_KMV_K}"
                " THEN h END) END AS BIGINT)"
            ).alias("kmv_estimate"),
        )
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# temporal_twap — exact time-weighted average per entity
# --------------------------------------------------------------------------
@register(
    "temporal_twap",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(floor(value * 100) AS BIGINT) AS v_c,
             epoch_us(ts) AS us,
             lead(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS us_next
      FROM events
    ),
    held AS (
      SELECT user_id, v_c, us_next - us AS dur_us
      FROM seq WHERE us_next IS NOT NULL
    )
    SELECT user_id,
           CAST(SUM(dur_us) AS BIGINT) AS span_us,
           -- exact FLOOR division for any sign (DuckDB // truncates toward
           -- zero on negatives; Spark's pmod form floors — make both floor)
           CAST(CASE WHEN SUM(dur_us) > 0
                THEN (SUM(CAST(v_c AS HUGEINT) * dur_us)
                      - ((SUM(CAST(v_c AS HUGEINT) * dur_us) % SUM(dur_us)
                          + SUM(dur_us)) % SUM(dur_us)))
                     // SUM(dur_us)
                END AS BIGINT) AS twap_c
    FROM held GROUP BY user_id
    """,
)
def temporal_twap_q(spark, sf_dir):
    """Exact TIME-weighted average per entity — the billing/sensor/position
    average where each observation is held until the next one (piecewise-
    constant interpolation), so a value held for an hour weighs 3600x one
    held a second; the plain AVG the events table would naively get is
    wrong whenever sampling is irregular (which is always).  Pure integer
    contract in MICROSECONDS: second-grain epochs are NOT cross-engine
    safe (DuckDB's epoch() keeps the fractional part and CAST rounds,
    Spark's timestampdiff(SECOND) truncates — measured off-by-one on this
    corpus), while both engines agree bit-exactly on integer epoch
    microseconds.  The cents quotient uses FLOOR semantics FOR ANY SIGN:
    Spark's pmod form floors naturally, and the oracle floors explicitly
    ((S - pmod(S, D)) // D) because DuckDB's bare `//` truncates toward
    zero on negative numerators — a divergence positive-only gate data
    would never catch.  The weighted sum accumulates in DECIMAL(38,0)/HUGEINT
    (the Brier doctrine: v_c x a multi-year span in us brushes the BIGINT
    edge) and only the floored cents quotient — bounded by the value
    range — surfaces as BIGINT.  Zero-duration repeats contribute nothing
    (weight 0); entities with one event have no covered span and emit NO
    row (nothing was ever *held*).  Tie order (ts, event_id) is part of
    the contract.

    100 TB shape: one per-entity window (lead) over event-time-ordered
    rows + one entity-grain hash agg; no joins, no corpus-grain window."""
    events = _t(spark, sf_dir, "events")
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_c"),
        epoch_us.alias("us"),
        F.lead(epoch_us).over(w).alias("us_next"),
    )
    held = seq.filter(F.col("us_next").isNotNull()).select(
        "user_id", "v_c", (F.col("us_next") - F.col("us")).alias("dur_us")
    )
    return held.groupBy("user_id").agg(
        F.sum("dur_us").cast("long").alias("span_us"),
        F.expr(
            "CAST(CASE WHEN SUM(dur_us) > 0 THEN"
            " (SUM(CAST(v_c AS DECIMAL(38,0)) * dur_us)"
            "  - pmod(SUM(CAST(v_c AS DECIMAL(38,0)) * dur_us),"
            "         CAST(SUM(dur_us) AS DECIMAL(38,0))))"
            " / SUM(dur_us) END AS BIGINT)"
        ).alias("twap_c"),
    )


# --------------------------------------------------------------------------
# stream_novelty_maintain — the novelty profile as IVM
# --------------------------------------------------------------------------
@register(
    "stream_novelty_maintain",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, substring(substring(text, 1, 100), i, 8) AS g
      FROM documents, generate_series(1, 93) t(i)
      WHERE doc_id < 200 AND i <= greatest(length(substring(text, 1, 100)) - 7, 0)
    ),
    first_seen AS (
      SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM sh GROUP BY g
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(1000000 * SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM sh s JOIN first_seen f ON f.g = s.g
    GROUP BY s.doc_id
    """,
)
def stream_novelty_maintain_q(spark, sf_dir):
    """`text_ngram_novelty_profile` as incremental view maintenance — the
    crawl-frontier novelty monitor running ON the ingest stream.  Two
    state pieces: the (gram, first_doc) first-occurrence index folds by
    MIN (idempotent semilattice — the KMV doctrine), and the per-doc
    (n_grams, n_novel) counters fold by SUM over deltas: each batch
    attributes its own docs against (prior index ∪ batch minima), and —
    the ADVICE r11 fix — when a LATER batch delivers a SMALLER doc_id
    that steals a gram's first_doc from an already-counted doc, the
    batch emits a −1 revocation delta to the displaced doc, so the
    maintained counters equal the batch operator's global-MIN attribution
    under ANY arrival order, not just in-id-order arrival.  Batch-
    boundary subtlety pinned by the bundling tests (contiguous AND
    id-shuffled splits): a gram first seen by TWO docs in the SAME batch
    credits only the smaller id, exactly like the batch operator.
    Shares the batch row's oracle verbatim.

    100 TB shape: per trigger one shingle pass over the batch, one MIN
    merge into the vocabulary-sized first-seen index, one per-doc
    counter-delta fold (revocations are bounded by the batch's stolen
    grams, never a corpus rescan)."""
    import shutil
    import tempfile

    from ..streaming import read_documents_stream
    from . import finish_and_clean

    root = tempfile.mkdtemp(prefix="stream_novelty_")
    index_path = root + "/first_seen"
    counters_path = root + "/counters"

    def handle_batch(batch_df, batch_id):
        sp = batch_df.sparkSession
        docs = batch_df.filter(F.col("doc_id") < 200).select(
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
        batch_min = sh.groupBy("g").agg(
            F.min("doc_id").cast("long").alias("first_doc")
        )
        state = read_state_parquet(sp, index_path)
        displaced = None
        if state is not None:
            # MIN-semilattice merge: known grams keep their (earlier)
            # first_doc; new grams enter with the batch-local min
            merged = (
                state.unionByName(batch_min)
                .groupBy("g")
                .agg(F.min("first_doc").cast("long").alias("first_doc"))
            )
            effective = merged
            # Revocation deltas (ADVICE r11): grams whose first_doc this
            # batch STEALS (a smaller doc_id arrived late) emit a −1
            # n_novel delta to the displaced doc, so the counters match
            # global-MIN attribution under any arrival order.
            displaced = (
                state.join(
                    batch_min.withColumnRenamed("first_doc", "new_first"), on="g"
                )
                .filter(F.col("new_first") < F.col("first_doc"))
                .groupBy(F.col("first_doc").alias("doc_id"))
                .agg(
                    F.lit(0).cast("long").alias("n_grams"),
                    (-F.count(F.lit(1))).cast("long").alias("n_novel"),
                )
            )
        else:  # first batch
            merged = batch_min
            effective = batch_min
        # this batch's per-doc counter deltas against the EFFECTIVE index
        # (prior state ∪ this batch's minima)
        part = (
            sh.join(effective, on="g")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_grams"),
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_novel"),
            )
        )
        if displaced is not None:
            part = part.unionByName(displaced)
        # ORDER MATTERS: the counter deltas are LAZY over the OLD
        # first-seen parquet (via `effective`/`state`), so they must land
        # before the index rewrite deletes those files (the staging
        # rewrite pattern's one sequencing hazard).
        counters = read_state_parquet(sp, counters_path)
        merged_c = counters.unionByName(part) if counters is not None else part
        merged_c = merged_c.groupBy("doc_id").agg(
            F.sum("n_grams").cast("long").alias("n_grams"),
            F.sum("n_novel").cast("long").alias("n_novel"),
        )
        commit_state_parquet(merged_c, counters_path)
        commit_state_parquet(merged, index_path)

    query = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "/checkpoint")
        .start()
    )
    query.awaitTermination()

    out = spark.read.parquet(counters_path).select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.expr("CAST(1000000 * n_novel DIV n_grams AS BIGINT)").alias("novelty_ppm"),
    )
    return finish_and_clean(out, root)


# --------------------------------------------------------------------------
# temporal_median_decompose — STL-lite trend/seasonal/remainder, all-integer
# --------------------------------------------------------------------------
@register(
    "temporal_median_decompose",
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
      SELECT day, y,
             win[CAST((len(win) + 1) // 2 AS INT)] AS trend,
             y - win[CAST((len(win) + 1) // 2 AS INT)] AS detr,
             dayofweek(day) AS dow
      FROM trended
    ),
    seasonal AS (
      SELECT dow, det_sorted[CAST((len(det_sorted) + 1) // 2 AS INT)] AS s
      FROM (SELECT dow, list_sort(list(detr)) AS det_sorted
            FROM detrended GROUP BY dow)
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.y,
           CAST(d.trend AS BIGINT) AS trend,
           CAST(s.s AS BIGINT) AS seasonal,
           CAST(d.y - d.trend - s.s AS BIGINT) AS remainder
    FROM detrended d JOIN seasonal s ON s.dow = d.dow
    """,
)
def temporal_median_decompose_q(spark, sf_dir):
    """STL-lite robust decomposition of the daily event series into
    trend + day-of-week seasonal + remainder — the anomaly-triage
    primitive (`temporal_rolling_anomaly` flags points; this explains
    them: is Monday low because of trend, seasonality, or a genuine
    residual?).  Medians, not means, at both stages (outliers must land
    in the REMAINDER, not smear the trend — the whole reason STL is
    median/loess-shaped), and every median is the deterministic LOWER
    median (sorted window, element (n+1) DIV 2): engine median()
    builtins interpolate even-length windows differently, so the sorted-
    array element IS the cross-engine contract.  Trend = centered 7-day
    rolling median (edge days use their available window, identically in
    both engines); seasonal = per-dow median of the detrended series;
    remainder closes the identity y = trend + seasonal + remainder by
    construction.

    100 TB shape: the corpus reduces to DATE grain in one hash agg
    (bounded by calendar days); everything after runs on the tiny daily
    series — windows over ≤7 rows, a 7-row seasonal dim, one keyed
    join."""
    events = _t(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "y",
        F.sort_array(F.collect_list("y").over(w7)).alias("win"),
    )
    lower_median = F.expr("win[CAST((size(win) + 1) DIV 2 AS INT) - 1]")
    detrended = trended.select(
        "day",
        "y",
        lower_median.cast("long").alias("trend"),
        (F.col("y") - lower_median).cast("long").alias("detr"),
        F.dayofweek("day").alias("dow"),
    )
    seasonal = (
        detrended.groupBy("dow")
        .agg(F.sort_array(F.collect_list("detr")).alias("det_sorted"))
        .select(
            "dow",
            F.expr(
                "det_sorted[CAST((size(det_sorted) + 1) DIV 2 AS INT) - 1]"
            )
            .cast("long")
            .alias("s"),
        )
    )
    return (
        detrended.join(seasonal, on="dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "y",
            "trend",
            F.col("s").alias("seasonal"),
            (F.col("y") - F.col("trend") - F.col("s")).cast("long").alias("remainder"),
        )
    )


# --------------------------------------------------------------------------
# eval_auc_delong_var — exact DeLong variance components for the AUC
# --------------------------------------------------------------------------
@register(
    "eval_auc_delong_var",
    oracle="""
    WITH scored AS (
      SELECT
        CAST(1000000 * len(list_filter(string_split_regex(text, '\\s+'),
               t -> t IN ('the','a','of','and','to','in','is')))
             // len(string_split_regex(text, '\\s+')) AS BIGINT) AS score,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    grid AS (
      SELECT score,
             CAST(SUM(y) AS BIGINT) AS kp,
             CAST(SUM(1 - y) AS BIGINT) AS kn
      FROM scored GROUP BY score
    ),
    cum AS (
      SELECT score, kp, kn,
             COALESCE(SUM(kn) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below,
             COALESCE(SUM(kp) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos_above
      FROM grid
    ),
    tot AS (
      SELECT CAST(SUM(kp) AS BIGINT) AS m, CAST(SUM(kn) AS BIGINT) AS n
      FROM grid
    ),
    comps AS (
      SELECT
        SUM(kp * (2 * neg_below + kn)) AS sum_d,
        SUM(kp * CAST(2 * neg_below + kn AS HUGEINT)
               * CAST(2 * neg_below + kn AS HUGEINT)) AS sum_d2,
        SUM(kn * (2 * pos_above + kp)) AS sum_e,
        SUM(kn * CAST(2 * pos_above + kp AS HUGEINT)
               * CAST(2 * pos_above + kp AS HUGEINT)) AS sum_e2
      FROM cum
    )
    SELECT t.m, t.n,
           CAST(1000000 * CAST(c.sum_d AS HUGEINT)
                // (2 * CAST(t.m AS HUGEINT) * t.n) AS BIGINT) AS auc_ppm,
           CAST(CASE WHEN t.m > 1 AND t.n > 0 THEN
                1000000000000 * (t.m * c.sum_d2 - CAST(c.sum_d AS HUGEINT) * c.sum_d)
                // (CAST(t.m AS HUGEINT) * t.m * (t.m - 1) * 4 * t.n * t.n)
                END AS BIGINT) AS var10_e12,
           CAST(CASE WHEN t.n > 1 AND t.m > 0 THEN
                1000000000000 * (t.n * c.sum_e2 - CAST(c.sum_e AS HUGEINT) * c.sum_e)
                // (CAST(t.n AS HUGEINT) * t.n * (t.n - 1) * 4 * t.m * t.m)
                END AS BIGINT) AS var01_e12
    FROM comps c, tot t
    """,
)
def eval_auc_delong_var_q(spark, sf_dir):
    """Exact DeLong variance components for the ROC AUC — the statistic
    behind every 'is model A's AUC significantly above B's' readout:
    var(AUC) = S10/m + S01/n, where S10/S01 are the sample variances of
    the per-positive / per-negative placement values.  Everything stays
    rational-exact via dominance counting on the score grid (the
    eval_auc_rank / eval_cindex_full doctrine — NEVER per-pair): each
    positive at score s has doubled placement d = 2·(negatives below) +
    (negatives tied), so Σd and Σd² fold from (score, count) grid rows;
    symmetrically for negatives with positives above.  Variance
    numerators m·Σd²−(Σd)² clear the rational mean exactly; outputs are
    floored e12-scaled components (var = var10 + var01 at the
    presentation layer; the sqrt for a CI is presentation too — this
    engine ships exact integers, not rounding policy).  AUC ppm emitted
    beside them, tie-aware (doubled-rank), consistent with
    `eval_auc_rank`.

    100 TB shape: one (score)-grain hash agg + two cumulative windows
    over the BOUNDED ppm grid + a 1-row combine — the corpus is scanned
    once; no all-pairs anything."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    stop = F.filter(
        toks, lambda t: t.isin("the", "a", "of", "and", "to", "in", "is")
    )
    scored = docs.select(
        (F.lit(1000000) * F.size(stop)).cast("long").alias("_num"),
        F.size(toks).cast("long").alias("_den"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    ).select(F.expr("CAST(_num DIV _den AS BIGINT)").alias("score"), "y")
    grid = scored.groupBy("score").agg(
        F.sum("y").cast("long").alias("kp"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("kn"),
    )
    w_up = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    w_dn = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = grid.select(
        "score",
        "kp",
        "kn",
        F.coalesce(F.sum("kn").over(w_up), F.lit(0)).alias("neg_below"),
        F.coalesce(F.sum("kp").over(w_dn), F.lit(0)).alias("pos_above"),
    )
    comps = cum.agg(
        F.sum(F.col("kp") * (2 * F.col("neg_below") + F.col("kn")))
        .cast("long")
        .alias("sum_d"),
        F.sum(
            F.col("kp")
            * F.expr(
                "CAST(2 * neg_below + kn AS DECIMAL(38,0))"
                " * CAST(2 * neg_below + kn AS DECIMAL(38,0))"
            )
        ).alias("sum_d2"),
        F.sum(F.col("kn") * (2 * F.col("pos_above") + F.col("kp")))
        .cast("long")
        .alias("sum_e"),
        F.sum(
            F.col("kn")
            * F.expr(
                "CAST(2 * pos_above + kp AS DECIMAL(38,0))"
                " * CAST(2 * pos_above + kp AS DECIMAL(38,0))"
            )
        ).alias("sum_e2"),
    )
    tot = grid.agg(
        F.sum("kp").cast("long").alias("m"), F.sum("kn").cast("long").alias("n")
    )

    def _floor_div(num: str, den: str) -> str:
        return f"CAST(({num} - pmod({num}, {den})) / ({den}) AS BIGINT)"

    return comps.crossJoin(F.broadcast(tot)).select(
        "m",
        "n",
        F.expr(
            _floor_div(
                "1000000 * CAST(sum_d AS DECIMAL(38,0))",
                "2 * CAST(m AS DECIMAL(38,0)) * n",
            )
        ).alias("auc_ppm"),
        # degenerate-class guard: m<=1 (or n=0) has no sample variance —
        # NULL by contract in BOTH engines, never a zero division
        F.expr(
            "CASE WHEN m > 1 AND n > 0 THEN "
            + _floor_div(
                "1000000000000 * (m * sum_d2 - CAST(sum_d AS DECIMAL(38,0)) * sum_d)",
                "CAST(m AS DECIMAL(38,0)) * m * (m - 1) * 4 * n * n",
            )
            + " END"
        ).alias("var10_e12"),
        F.expr(
            "CASE WHEN n > 1 AND m > 0 THEN "
            + _floor_div(
                "1000000000000 * (n * sum_e2 - CAST(sum_e AS DECIMAL(38,0)) * sum_e)",
                "CAST(n AS DECIMAL(38,0)) * n * (n - 1) * 4 * m * m",
            )
            + " END"
        ).alias("var01_e12"),
    )
