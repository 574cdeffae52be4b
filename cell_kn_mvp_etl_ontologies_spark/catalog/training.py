"""Training-data pipeline queries (deterministic splits, sampling, packing,
sharding, quantization, decontamination) over the documents/embeddings
tables — every sampling decision is a pure md5 function of the row key, so
each query has an exact DuckDB oracle.

The Spark↔SQL hash contract: Spark `conv(substring(md5(s),1,8),16,10)`
== DuckDB `('0x' || substring(md5(s),1,8))::BIGINT` (both uniform 32-bit);
fractions divide by 2^32 (power of two → exact in double).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..operators.training import (
    assign_shards,
    contamination_ngrams,
    interleave_weighted,
    pack_sequences,
    pack_sequences_greedy,
    quantize_embeddings_int8,
    sample_stratified,
    split_train_val_test,
)
from . import register

# DuckDB equivalents of hash_fraction / hash_bucket (salt inlined).
_FRAC = "(('0x' || substring(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"
_BUCKET = "(('0x' || substring(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT % {n})"
_HASH32 = "(('0x' || substring(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT)"


@register(
    "sample_split_hash",
    oracle="""
    WITH f AS (
      SELECT doc_id, {frac} AS frac FROM documents
    )
    SELECT doc_id,
           CASE WHEN frac < 0.8 THEN 'train'
                WHEN frac < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM f
    """.format(frac=_FRAC.format(salt="split", key="doc_id")),
)
def sample_split_hash_q(spark, sf_dir):
    """80/10/10 hash-threshold split of the corpus: membership is a pure
    function of doc_id (stable under re-runs, retries, repartitioning —
    `randomSplit` is none of those).  Pure projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return split_train_val_test(docs, "doc_id")


@register(
    "sample_split_by_group",
    oracle="""
    WITH d AS (
      SELECT doc_id, 'dom' || CAST(doc_id % 37 AS VARCHAR) AS domain
      FROM documents
    ),
    f AS (SELECT doc_id, domain, {frac} AS frac FROM d)
    SELECT doc_id, domain,
           CASE WHEN frac < 0.8 THEN 'train'
                WHEN frac < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM f
    """.format(frac=_FRAC.format(salt="groupsplit", key="domain")),
)
def sample_split_by_group_q(spark, sf_dir):
    """Leakage-safe grouped split (round 5): the hash threshold applies to
    the GROUP key (here a synthetic url-domain), so every document of a
    domain lands in one split — the guard against near-dup train/test
    leakage across a domain.  Atomicity is structural (split is a pure
    function of domain); the gate hash-checks every row's assignment."""
    from ..operators.training import split_by_group_leakage_safe

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("dom"), (F.col("doc_id") % 37).cast("string")).alias("domain"),
    )
    return split_by_group_leakage_safe(docs, "domain")


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE {frac} <
          CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.9
                    WHEN 'de' THEN 0.25 ELSE 0.1 END
    """.format(frac=_FRAC.format(salt="strat", key="doc_id")),
)
def sample_stratified_q(spark, sf_dir):
    """Per-language deterministic downsample (rebalance a web-scale corpus
    toward under-represented languages).  Literal-map rate lookup + hash
    threshold: one narrow pass, rows keep/drop decisions stable forever."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    rates = {"en": 0.5, "zh": 0.9, "de": 0.25}
    return sample_stratified(docs, "lang", rates, "doc_id", default_fraction=0.1)


@register(
    "sample_weighted",
    oracle="""
    SELECT doc_id, n_chars,
           CAST(least(n_chars, 2000) AS DOUBLE) / 2000 AS w
    FROM documents
    WHERE {frac} < 0.5 * (CAST(least(n_chars, 2000) AS DOUBLE) / 2000)
    """.format(frac=_FRAC.format(salt="wsample", key="doc_id")),
)
def sample_weighted_q(spark, sf_dir):
    """Quality-weighted importance sampling (operators/training.
    sample_weighted): keep probability min(1, rate x weight) with a length-
    derived weight — the curation downsample that keeps higher-quality
    documents at a higher rate, reproducible because membership is a pure
    function of (doc_id, salt, weight).  Pure projection+filter."""
    from ..operators.training import sample_weighted

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.least(F.col("n_chars"), F.lit(2000)).cast("double") / 2000).alias("w"),
    )
    return sample_weighted(docs, "doc_id", "w", base_rate=0.5)


@register(
    "interleave_weighted",
    oracle="""
    SELECT doc_id, source, {ordh} AS order_hash
    FROM documents
    WHERE source IN ('src0', 'src1', 'src2', 'src3')
      AND {frac} <
          CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                      WHEN 'src2' THEN 0.25 ELSE 0.125 END
    """.format(
        ordh=_HASH32.format(salt="mix:ord", key="doc_id"),
        frac=_FRAC.format(salt="mix:acc", key="doc_id"),
    ),
)
def interleave_weighted_q(spark, sf_dir):
    """Weighted source mixture + deterministic shuffle order: each source
    down-sampled to its mixture rate, surviving rows keyed by an order hash
    (range-partition the write on it = global shuffle with no global
    window)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1", "src2", "src3"))
        .select("doc_id", "source")
    )
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.125}
    return interleave_weighted(docs, "source", weights, "doc_id")


@register(
    "shard_assign",
    oracle="""
    WITH s AS (SELECT doc_id, {bucket} AS shard FROM documents)
    SELECT shard, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM s GROUP BY shard
    """.format(bucket=_BUCKET.format(salt="shard", key="doc_id", n=8)),
)
def shard_assign_q(spark, sf_dir):
    """Stable hash sharding into 8 output shards + per-shard occupancy
    (uniformity check).  Incremental rebuilds rewrite only shards whose
    members changed."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        assign_shards(docs, "doc_id", 8)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


# token estimate shared by both packers: ceil-ish chars/4, arithmetic only
# (no tokenizer in either engine; pure-integer so Spark/DuckDB agree).
_TOKENS_SQL = "greatest(n_chars // 4, 1)"
_PACK_CORPUS_SQL = """
    SELECT doc_id, {bucket} AS shard, {tokens} AS tokens
    FROM documents
""".format(bucket=_BUCKET.format(salt="shard", key="doc_id", n=4), tokens=_TOKENS_SQL)


def _pack_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    docs = assign_shards(docs, "doc_id", 4)
    return docs.select(
        "doc_id", "shard", F.greatest(F.floor(F.col("n_chars") / 4), F.lit(1)).cast("long").alias("tokens")
    )


@register(
    "pack_sequences",
    oracle="""
    WITH corpus AS ({corpus}),
    packed AS (
      SELECT shard, doc_id, tokens,
             CAST(COALESCE(SUM(tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
      FROM corpus
    )
    SELECT shard, bin, COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY shard, bin
    """.format(corpus=_PACK_CORPUS_SQL),
)
def pack_sequences_q(spark, sf_dir):
    """Quotient packing into 512-token bins per shard (window partitioned by
    shard — no global window; bins may overflow by at most one straddling
    document).  Returns per-bin occupancy."""
    packed = pack_sequences(_pack_corpus(spark, sf_dir), "shard", "doc_id", "tokens", 512)
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("tokens").alias("bin_tokens")
    )


@register(
    "pack_sequences_greedy",
    oracle="""
    WITH RECURSIVE corpus AS ({corpus}),
    ordered AS (
      SELECT shard, doc_id, tokens,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM corpus
    ),
    packed AS (
      SELECT shard, rn, doc_id, tokens, tokens AS fill, CAST(0 AS BIGINT) AS bin
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.tokens,
             CASE WHEN p.fill + o.tokens > 512 THEN o.tokens ELSE p.fill + o.tokens END,
             CASE WHEN p.fill + o.tokens > 512 THEN p.bin + 1 ELSE p.bin END
      FROM ordered o JOIN packed p ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY shard, bin
    """.format(corpus=_PACK_CORPUS_SQL),
)
def pack_sequences_greedy_q(spark, sf_dir):
    """Strict greedy packing (no bin exceeds 512 tokens unless a single doc
    does): sequential per-shard state via applyInPandas — Arrow-batched, one
    group per shard, shards pack in parallel.  Oracle: per-shard recursive
    CTE with identical semantics."""
    packed = pack_sequences_greedy(_pack_corpus(spark, sf_dir), "shard", "doc_id", "tokens", 512)
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("tokens").alias("bin_tokens")
    )


@register(
    "embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) t(i)
      WHERE vec_id < 100 AND i <= len(embedding)
      UNION ALL
      SELECT 99999, i, 0.0 FROM generate_series(1, 64) t(i)
    ),
    s AS (SELECT vec_id, MAX(abs(x)) / 127.0 AS scale FROM v GROUP BY vec_id)
    SELECT v.vec_id, v.i,
           CAST(coalesce(floor(v.x / nullif(s.scale, 0.0) + 0.5), 0) AS BIGINT) AS q,
           s.scale
    FROM v JOIN s ON v.vec_id = s.vec_id
    """,
)
def embedding_quantize_q(spark, sf_dir):
    """Symmetric per-vector int8 quantization, exploded to components so the
    oracle checks every value.  floor(x+0.5) rounding — the one mode Spark,
    DuckDB, and a C++ serving stack agree on (Spark round is half-even,
    DuckDB's is half-away).  An injected all-zero vector pins the degenerate
    scale=0 case (q defined as 0, not NULL/divide-by-zero) in both engines."""
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    zero = spark.createDataFrame(
        [(99999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    return quantize_embeddings_int8(em.select("vec_id", "embedding").unionByName(zero))


@register(
    "text_repetition_filter",
    oracle="""
    WITH words AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM documents WHERE doc_id < 200
    ),
    base AS (
      SELECT doc_id AS id, CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words, w
      FROM words
    ),
    bigrams AS (
      SELECT id, w[i] || ' ' || w[i + 1] AS bg
      FROM base, generate_series(1, 600) t(i)
      WHERE i <= len(w) - 1
    ),
    top AS (
      SELECT id, MAX(c) AS top_bg
      FROM (SELECT id, bg, COUNT(*) AS c FROM bigrams GROUP BY id, bg)
      GROUP BY id
    )
    SELECT b.id, b.n_words, b.n_distinct_words,
           COALESCE(b.n_distinct_words / CAST(NULLIF(b.n_words, 0) AS DOUBLE), 0.0)
             AS distinct_word_ratio,
           COALESCE(t.top_bg * 2.0 / CAST(NULLIF(b.n_words, 0) AS DOUBLE), 0.0)
             AS top_bigram_frac
    FROM base b LEFT JOIN top t USING (id)
    """,
)
def text_repetition_filter_q(spark, sf_dir):
    """Intra-document repetition metrics (distinct-word ratio, top-bigram
    coverage) — the boilerplate/spam filter signals.  Single-exchange
    two-level aggregation; see operators/text_analysis.py."""
    from ..operators.text_analysis import repetition_metrics

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return repetition_metrics(docs, "text", "doc_id")


@register(
    "dedup_connected_components",
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
    )
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
    """,
)
def dedup_connected_components_q(spark, sf_dir):
    """Duplicate-cluster finisher: pair output from exact/LSH dedup is only
    half the job — keep-one-per-group needs the transitive closure of pairs.
    Min-label propagation over a planted chain graph (diameter 3, so the
    iteration actually propagates); component = min reachable doc_id."""
    from ..plans.graph_query import connected_components

    ids = load_table(spark, sf_dir, "documents").select(F.col("doc_id").cast("long"))
    link = lambda n, off_a, off_b: ids.filter(F.col("doc_id") < n).select(  # noqa: E731
        (F.col("doc_id") + off_a).alias("a"), (F.col("doc_id") + off_b).alias("b")
    )
    pairs = link(30, 0, 10000).unionByName(link(15, 10000, 20000)).unionByName(
        link(5, 20000, 30000)
    )
    return connected_components(pairs)


@register(
    "agg_quantiles",
    oracle="""
    WITH qs AS (
      SELECT lang, quantile_cont(n_chars, [0.5, 0.9, 0.99]) AS q
      FROM documents GROUP BY lang
    )
    SELECT lang, i, q[i] AS q_value FROM qs, generate_series(1, 3) t(i)
    """,
)
def agg_quantiles_q(spark, sf_dir):
    """Exact per-language length quantiles (p50/p90/p99) — the distribution
    stats that drive corpus curation cutoffs.  Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition, so the oracle
    is exact.  At 100 TB swap for `approx_percentile` (t-digest-style, one
    pass, mergeable) — same call shape, declared tolerance."""
    docs = load_table(spark, sf_dir, "documents")
    qs = docs.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q")
    )
    return qs.select("lang", F.posexplode("q").alias("i0", "q_value")).select(
        "lang", (F.col("i0") + 1).alias("i"), "q_value"
    )


@register(
    "agg_approx_quantiles",
    oracle="""
    SELECT d.lang, CAST(t.i AS BIGINT) AS i,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS within_tol
    FROM documents d, (SELECT unnest([1, 2, 3]) AS i) t
    GROUP BY d.lang, t.i
    """,
)
def agg_approx_quantiles_q(spark, sf_dir):
    """The 100-TB path `agg_quantiles` names: `approx_percentile` (one pass,
    mergeable partial sketches, bounded state per group — no per-group sort
    of raw values).  Sketch estimates are engine-specific, so the gate
    hashes a BOUNDED-ERROR differential instead of the estimate: for each
    (lang, percentile) the estimate's RANK among that group's values must
    sit within the GK sketch's published tolerance of the target rank
    (ε = 1/accuracy, gated at 2εn + 1 for boundary-convention slack).
    The oracle emits TRUE unconditionally — the gate goes red if the
    sketch ever exceeds its declared accuracy.  The same check previously
    lived only in tests/test_training.py; now the catalog row itself is
    hash-gated."""
    docs = load_table(spark, sf_dir, "documents")
    qs = docs.groupBy("lang").agg(
        F.approx_percentile(
            F.col("n_chars"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(1000)
        ).alias("q")
    )
    est = qs.select("lang", F.posexplode("q").alias("i0", "est")).select(
        "lang", (F.col("i0") + 1).cast("long").alias("i"), "est"
    )
    ps = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    ranked = (
        docs.select("lang", "n_chars")
        .join(F.broadcast(est), on="lang")
        .groupBy("lang", "i", "est")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum((F.col("n_chars") < F.col("est")).cast("long")).alias("rk_lt"),
            F.sum((F.col("n_chars") <= F.col("est")).cast("long")).alias("rk_le"),
        )
    )
    # a tied value occupies the whole rank span [rk_lt+1, rk_le]; the
    # sketch guarantee holds if ANY rank in that span is within tol
    target = F.element_at(ps, F.col("i").cast("int")) * F.col("n_rows")
    tol = F.lit(2.0) * F.col("n_rows") / F.lit(1000) + F.lit(1.0)
    return ranked.select(
        "lang",
        "i",
        "n_rows",
        (
            (target >= F.col("rk_lt") + 1 - tol) & (target <= F.col("rk_le") + tol)
        ).alias("within_tol"),
    )


@register(
    "sink_range_sharded",
    oracle="SELECT COUNT(*) AS total_rows, true AS ranges_disjoint FROM documents",
)
def sink_range_sharded_q(spark, sf_dir):
    """Globally ordered shard write: repartitionByRange + sortWithinPartitions
    on the interleave order hash (one sampled-boundary shuffle, each task
    writes its own sorted file — no merge step, no driver bottleneck).
    Verification reads the files back and checks per-file key intervals are
    disjoint."""
    import tempfile

    from ..operators.training import interleave_weighted
    from ..sinks.sharded import verify_range_sharded, write_range_sharded
    from . import finish_and_clean

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ordered = interleave_weighted(
        docs, "source", {f"src{i}": 1.0 for i in range(20)}, "doc_id"
    )
    root = tempfile.mkdtemp(prefix="range_shard_")
    back = write_range_sharded(ordered, root + "/shards", "order_hash", 8)
    return finish_and_clean(verify_range_sharded(back, "order_hash"), root)


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id, i,
           ('0x' || substring(md5(text), 2 * i - 1, 2))::INT / 255.0 AS f
    FROM documents, generate_series(1, 16) t(i)
    WHERE doc_id < 100
    """,
)
def multimodal_feature_extract_q(spark, sf_dir):
    """Arrow-batched feature extraction over binary payloads — the bridge
    from multimodal columns into the similarity/dedup operators.  Container
    stand-in encoder is md5-derived (deterministic ⇒ exact oracle); the
    Spark plumbing (mapInPandas batches, no shuffle) is the production
    shape."""
    from ..operators.multimodal import attach_binary_payload, extract_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = extract_features(attach_binary_payload(docs))
    return feats.select(
        "doc_id", F.posexplode("embedding").alias("i0", "f")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "f")


@register(
    "contamination_ngram",
    oracle="""
    WITH train AS (
      SELECT doc_id, substring(text, 1, 120) AS prefix FROM documents WHERE source <> 'src0'
      UNION ALL
      SELECT 99991, 'abc'
    ),
    bench AS (
      SELECT doc_id, substring(text, 1, 120) AS prefix FROM documents WHERE source = 'src0'
      UNION ALL
      SELECT doc_id + 10000, substring(text, 1, 120) FROM documents
      WHERE source <> 'src0' AND doc_id % 7 = 0
      UNION ALL
      SELECT 99992, 'abc'
    ),
    tsh AS (
      SELECT DISTINCT doc_id, md5(substring(prefix, i, 8)) AS sh
      FROM train, generate_series(1, 113) t(i)
      WHERE i <= greatest(length(prefix) - 7, 0)
    ),
    bsh AS (
      SELECT DISTINCT md5(substring(prefix, i, 8)) AS sh
      FROM bench, generate_series(1, 113) t(i)
      WHERE i <= greatest(length(prefix) - 7, 0)
    )
    SELECT doc_id, COUNT(*) AS n_hits
    FROM tsh JOIN bsh USING (sh)
    GROUP BY doc_id
    """,
)
def contamination_ngram_q(spark, sf_dir):
    """Benchmark decontamination: 8-char shingle overlap between the
    training split and a 'benchmark' set that deliberately contains copies
    of every 7th training doc (true positives).  md5 shingle keys, per-side
    dedup, benchmark side broadcast.  Injected sub-shingle-width ('abc')
    rows on BOTH sides pin the short-text edge: texts shorter than the
    shingle width emit zero shingles, never a spurious whole-text hit."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0").select("doc_id", "text").unionByName(
        spark.createDataFrame([(99991, "abc")], "doc_id long, text string")
    )
    bench = (
        docs.filter(F.col("source") == "src0")
        .select("doc_id", "text")
        .unionByName(
            docs.filter((F.col("source") != "src0") & (F.col("doc_id") % 7 == 0)).select(
                (F.col("doc_id") + 10000).alias("doc_id"), "text"
            )
        )
        .unionByName(spark.createDataFrame([(99992, "abc")], "doc_id long, text string"))
    )
    return contamination_ngrams(train, bench)


# --------------------------------------------------------------------------
# corpus curation: PII redaction + C4 line cleaning (operators/curation.py)
# --------------------------------------------------------------------------
# The synthetic documents contain no PII and no newlines, so both queries
# append deterministic structure (same expression in Spark and SQL) before
# running the operator — the injection IS part of the differential check.

_PII_AUG_SQL = """
    SELECT doc_id,
      text
      || CASE WHEN doc_id % 5 = 0 THEN ' contact bob.smith+spam@example.org now' ELSE '' END
      || CASE WHEN doc_id % 7 = 0 THEN ' call 415-555-0123.' ELSE '' END
      || CASE WHEN doc_id % 11 = 0 THEN ' card 4111 1111 1111 1111 exp' ELSE '' END
      || CASE WHEN doc_id % 13 = 0 THEN ' ssn 123-45-6789' ELSE '' END
      || CASE WHEN doc_id % 17 = 0 THEN ' from 10.0.42.7 host' ELSE '' END AS text
    FROM documents WHERE doc_id < 300
"""


def _pii_augmented(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    frags = [
        (5, " contact bob.smith+spam@example.org now"),
        (7, " call 415-555-0123."),
        (11, " card 4111 1111 1111 1111 exp"),
        (13, " ssn 123-45-6789"),
        (17, " from 10.0.42.7 host"),
    ]
    text = F.col("text")
    for mod, frag in frags:
        text = F.concat(text, F.when(F.col("doc_id") % mod == 0, F.lit(frag)).otherwise(F.lit("")))
    return docs.select("doc_id", text.alias("text"))


@register(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS ({_PII_AUG_SQL})
    SELECT doc_id AS id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
              '\\b\\d{{4}}[- ]\\d{{4}}[- ]\\d{{4}}[- ]\\d{{4}}\\b', '[CREDIT_CARD]', 'g'),
            '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '[SSN]', 'g'),
          '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b', '[PHONE]', 'g'),
        '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '[IPV4]', 'g') AS redacted,
      CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(text, '\\b\\d{{4}}[- ]\\d{{4}}[- ]\\d{{4}}[- ]\\d{{4}}\\b')) AS BIGINT) AS n_credit_card,
      CAST(len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS BIGINT) AS n_ssn,
      CAST(len(regexp_extract_all(text, '\\b\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}\\b')) AS BIGINT) AS n_phone,
      CAST(len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4
    FROM aug
    """,
)
def text_pii_redact_q(spark, sf_dir):
    """PII scrub over the corpus: mask emails/cards/SSNs/phones/IPs with
    [KIND] tokens and count hits per kind.  Pure chained regexp_replace —
    a narrow map stage, no shuffle; patterns are RE2-safe so Spark and
    DuckDB agree byte-for-byte."""
    from ..operators.curation import redact_pii

    return redact_pii(_pii_augmented(spark, sf_dir))


_C4_AUG_SQL = """
    SELECT doc_id,
      'First line of doc ' || CAST(doc_id AS VARCHAR) || '.' || chr(10)
      || CASE WHEN doc_id % 2 = 0 THEN 'contains lorem ipsum filler.' ELSE 'a good second line here!' END || chr(10)
      || 'too short.' || chr(10)
      || substring(text, 1, 40) || chr(10)
      || CASE WHEN doc_id % 5 = 0 THEN 'Cookie Policy applies here.' ELSE 'another well formed sentence.' END || chr(10)
      || 'final line ends well.' AS text
    FROM documents WHERE doc_id < 300
"""


def _c4_augmented(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    nl = F.lit("\n")
    text = F.concat(
        F.lit("First line of doc "), F.col("doc_id").cast("string"), F.lit("."), nl,
        F.when(F.col("doc_id") % 2 == 0, F.lit("contains lorem ipsum filler.")).otherwise(
            F.lit("a good second line here!")
        ), nl,
        F.lit("too short."), nl,
        F.substring(F.col("text"), 1, 40), nl,
        F.when(F.col("doc_id") % 5 == 0, F.lit("Cookie Policy applies here.")).otherwise(
            F.lit("another well formed sentence.")
        ), nl,
        F.lit("final line ends well."),
    )
    return docs.select("doc_id", text.alias("text"))


@register(
    "text_c4_line_filter",
    oracle=f"""
    WITH aug AS ({_C4_AUG_SQL}),
    l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM aug),
    k AS (
      SELECT doc_id, lines,
        list_filter(lines, x ->
          regexp_matches(x, '[.!?"'']$')
          AND len(list_filter(string_split_regex(x, '\\s+'), w -> w <> '')) >= 3
          AND NOT contains(lower(x), 'javascript')
          AND NOT contains(lower(x), 'lorem ipsum')
          AND NOT contains(lower(x), 'cookie policy')
          AND NOT contains(lower(x), 'terms of use')) AS kept
      FROM l
    )
    SELECT doc_id AS id, array_to_string(kept, chr(10)) AS cleaned,
           CAST(len(lines) AS BIGINT) AS n_lines, CAST(len(kept) AS BIGINT) AS n_kept
    FROM k
    """,
)
def text_c4_line_filter_q(spark, sf_dir):
    """C4-style line cleaning: keep sentence-like lines (terminal
    punctuation, >= 3 words, no boilerplate phrases), rejoin survivors.
    Higher-order array filter per row — no explode, no shuffle; documents
    never leave their partition."""
    from ..operators.curation import c4_line_filter

    return c4_line_filter(_c4_augmented(spark, sf_dir))


@register(
    "dedup_pipeline_keep_canonical",
    oracle="""
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 25
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 5
      UNION ALL
      SELECT doc_id + 20000, text || ' extra tail words' FROM documents WHERE doc_id < 5
    ),
    hx AS (SELECT doc_id AS id, md5(text) AS h FROM corpus),
    exact_pairs AS (
      SELECT x.id AS a, y.id AS b FROM hx x JOIN hx y ON x.h = y.h AND x.id < y.id
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id, substring(substring(text, 1, 40), i, 3) AS shingle
      FROM corpus, generate_series(1, 38) t(i)
      WHERE i <= greatest(length(substring(text, 1, 40)) - 2, 0)
    ),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
    common AS (
      SELECT x.id AS a, y.id AS b, COUNT(*) AS n
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.id < y.id
      GROUP BY x.id, y.id
    ),
    near_pairs AS (
      SELECT a, b FROM common
      JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
      WHERE CAST(n AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n AS DOUBLE) >= 0.5
    ),
    pairs AS (SELECT a, b FROM exact_pairs UNION SELECT a, b FROM near_pairs),
    sym AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
    reach AS (
      SELECT x AS node, x AS r FROM sym
      UNION
      SELECT s.x, reach.r FROM sym s JOIN reach ON reach.node = s.y
    ),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT node, component AS keep_id FROM comp WHERE node <> component
    """,
)
def dedup_pipeline_keep_canonical_q(spark, sf_dir):
    """The full dedup pipeline, end to end: exact pairs (content hash
    self-join) ∪ near-dup pairs (3-gram Jaccard >= 0.5 on a 40-char prefix)
    → connected components (transitive closure: an exact copy of A and a
    near copy of A land in ONE cluster even though they never compared) →
    keep the min id per cluster, emit (dropped node, keep_id).  The corpus
    plants exact copies (+10000) and tail-extended near copies (+20000) of
    the first five docs."""
    from ..operators.dedup import ngram_jaccard_pairs
    from ..plans.graph_query import connected_components

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 25).select("doc_id", "text")
    corpus = (
        base.unionByName(
            docs.filter(F.col("doc_id") < 5).select((F.col("doc_id") + 10000).alias("doc_id"), "text")
        ).unionByName(
            docs.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 20000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" extra tail words")).alias("text"),
            )
        )
    )
    hx = corpus.select(F.col("doc_id").alias("id"), F.md5("text").alias("h"))
    exact = (
        hx.alias("x")
        .join(hx.alias("y"), "h")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
    )
    near = (
        ngram_jaccard_pairs(corpus, "text", "doc_id", shingle_width=3, prefix_len=40)
        .filter(F.col("jaccard") >= 0.5)
        .select("a", "b")
    )
    pairs = exact.unionByName(near).distinct()
    comp = connected_components(pairs)
    return comp.filter(F.col("node") != F.col("component")).select(
        "node", F.col("component").alias("keep_id")
    )


@register(
    "sample_cap_per_group",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY {frac}, doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rn <= 12
    """.format(frac=_FRAC.format(salt="cap", key="doc_id")),
)
def sample_cap_per_group_q(spark, sf_dir):
    """Domain capping: at most 12 docs per source, chosen by md5-hash order
    (reproducible uniform choice, not head-of-partition bias) — bounds any
    one domain's share of the corpus."""
    from ..operators.training import sample_cap_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return sample_cap_per_group(docs, "source", "doc_id", 12)


@register(
    "sample_source_sqrt",
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 < 7 THEN 'web'
                  WHEN doc_id % 10 < 9 THEN 'books'
                  ELSE 'code' END AS mix_source
      FROM documents
    ),
    c AS (SELECT mix_source, CAST(COUNT(*) AS BIGINT) AS n_source FROM docs GROUP BY mix_source),
    m AS (SELECT MIN(n_source) AS mn FROM c),
    dim AS (
      SELECT mix_source, n_source,
             sqrt(CAST(m.mn AS DOUBLE) / CAST(n_source AS DOUBLE)) AS keep_rate
      FROM c, m
    )
    SELECT d.doc_id, d.mix_source, dim.n_source, dim.keep_rate
    FROM docs d JOIN dim ON d.mix_source = dim.mix_source
    WHERE {frac} < dim.keep_rate
    """.format(frac=_FRAC.format(salt="srcbal", key="d.doc_id")),
)
def sample_source_sqrt_q(spark, sf_dir):
    """Square-root source balancing (operators/training.sample_source_sqrt):
    the temperature-style corpus-mix downsample at its cross-engine-exact
    T=2 point — per-source keep rate sqrt(min_n/n_s), so kept counts land
    ∝ sqrt(n_s) (large sources damped, smallest kept whole), membership a
    pure md5 function of (doc_id, salt, source share).  One KB-scale dim
    aggregate broadcast onto the corpus; the corpus pays one
    projection+filter and no shuffle.  The synthetic documents table has
    UNIFORM sources (rate 1 everywhere — a vacuous gate), so the query
    derives a 70/20/10 web/books/code mix whose three rates
    (~0.378/0.707/1.0) all bite."""
    from ..operators.training import sample_source_sqrt

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 7, F.lit("web"))
        .when(F.col("doc_id") % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code"))
        .alias("mix_source"),
    )
    return sample_source_sqrt(docs, "doc_id", "mix_source")
