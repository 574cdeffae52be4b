"""Text analysis operators for training-data pipelines (SURVEY.md §2.12):
language-ID heuristic, quality scoring, token counting, fingerprinting.
All pure Column expressions — portable and codegen-resident.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    return F.split(text, r"\s+")


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    toks = ws_tokens(text)
    matches = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return matches.cast("double") / F.size(toks).cast("double")


def lang_id(text: Column, threshold: float = 0.04) -> Column:
    """N-gram/stopword heuristic language ID: flag as 'en' when the English
    stopword ratio clears the threshold.  (Real profiles plug in as extra
    stopword lists; the synthetic corpus only distinguishes en-like text.)"""
    return F.when(stopword_ratio(text) >= threshold, "en").otherwise("unk")


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens, n_chars)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(ws_tokens(text)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))).cast("long").alias("n_bpe_tokens"),
        F.length(text).cast("long").alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, punct_ratio, stopword_ratio, quality DOUBLE) — a
    deterministic length/punctuation/stopword quality heuristic."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    n_toks = F.size(ws_tokens(text))
    sw = stopword_ratio(text)
    punct_ratio = n_punct.cast("double") / (n_chars.cast("double") + F.lit(1.0))
    quality = sw * F.lit(0.5) + (F.lit(1.0) - punct_ratio) * F.lit(0.5)
    return df.select(
        F.col(id_col).alias("id"),
        n_toks.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        sw.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str,
                    shingle_width: int = 4, prefix_len: int = 40) -> DataFrame:
    """(id, fingerprint): winnowing-style document fingerprint — the minimum
    md5 over character shingles (rolling-hash analog, engine-portable)."""
    from .dedup import shingles

    sh = shingles(df, text_col, id_col, shingle_width, prefix_len)
    return sh.groupBy("id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))


def repetition_metrics(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_words, n_distinct_words, distinct_word_ratio, top_bigram_frac)
    — intra-document repetition signals (the Gopher/MassiveText-style
    repetition filter): low distinct-word ratio or a single bigram covering
    a large token fraction flags boilerplate/spam for removal.

    Shape: word/distinct counts are per-row array expressions (no shuffle);
    the top-bigram count explodes bigrams and aggregates twice over ONE
    exchange — the explicit repartition on id satisfies both the (id, bg)
    and the (id) grouping (hash-partitioning on a subset of the grouping key
    is a valid clustered distribution), the same single-exchange two-level
    shape as the positional index.  Explode fan-out is ~n_words per doc —
    linear, unlike an O(words²) per-row expression.
    """
    toks = F.filter(ws_tokens(F.col(text_col)), lambda x: x != F.lit(""))
    # sequence(1, 0) DESCENDS ([1, 0]) rather than being empty — docs with
    # fewer than two words must short-circuit to an empty bigram array
    bigrams = F.when(
        F.size(F.col("toks")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("toks")) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .select(
            "id",
            F.size("toks").cast("long").alias("n_words"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_words"),
            bigrams.alias("bgs"),
        )
    )
    bg = base.select(
        "id", "n_words", "n_distinct_words", F.explode_outer("bgs").alias("bg")
    ).repartition("id")
    per_bg = bg.groupBy("id", "n_words", "n_distinct_words", "bg").agg(
        F.count(F.when(F.col("bg").isNotNull(), 1)).alias("c")
    )
    top = per_bg.groupBy("id", "n_words", "n_distinct_words").agg(
        F.max("c").alias("top_bg")
    )
    nz = F.when(F.col("n_words") > 0, F.col("n_words").cast("double"))
    return top.select(
        "id",
        "n_words",
        "n_distinct_words",
        F.coalesce(F.col("n_distinct_words") / nz, F.lit(0.0)).alias("distinct_word_ratio"),
        F.coalesce(F.col("top_bg") * F.lit(2.0) / nz, F.lit(0.0)).alias("top_bigram_frac"),
    )


def filter_quality_percentile(
    df: DataFrame, text_col: str, id_col: str, group_col: str, min_pct: float = 0.5
) -> DataFrame:
    """Keep documents at or above the ``min_pct`` quality percentile WITHIN
    their group (per-language/per-source cutoffs, not one global bar).

    percent_rank is pure order statistics — ties share a rank in every
    engine, so the cut is reproducible cross-engine even though quality is
    float-valued.  One shuffle (window partitioned by group); at 100 TB
    replace the exact window with approx_percentile cutoffs joined back if
    a group's rows exceed executor memory.

    Output: (id, group, quality, pct) for surviving docs.
    """
    from pyspark.sql import Window

    q = quality_score(df, text_col, id_col).join(
        df.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp")), on="id"
    )
    w = Window.partitionBy("grp").orderBy("quality")
    return (
        q.withColumn("pct", F.percent_rank().over(w))
        .filter(F.col("pct") >= F.lit(min_pct))
        .select("id", F.col("grp").alias(group_col), "quality", "pct")
    )


def chunk_text(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_len: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split each document into fixed-size overlapping character windows —
    the context-window chunking step of an embedding/retrieval corpus build
    (chunk, embed, index), where ``stride < chunk_len`` gives the overlap
    that keeps sentences straddling a boundary retrievable.

    Chunk starts are 0, stride, 2*stride, ... while start < length: every
    document yields ceil(len/stride)-ish chunks, the last possibly short but
    never empty.  Pure per-row expressions (sequence + explode + substring),
    no shuffle, linear ~len/stride fan-out inside codegen — at 100 TB the
    chunker is a map-only stage that pipelines straight into the embedding
    UDF or the token counter.

    Output: (id, chunk_idx, n_chunks, chunk_chars, chunk) — one row per
    chunk, ``chunk_idx`` 0-based.  Empty/NULL documents yield no rows.
    """
    last_idx = F.floor((F.length(F.col(text_col)) - 1) / stride).cast("int")
    out = (
        df.filter(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col).alias("id"),
            (last_idx + 1).cast("long").alias("n_chunks"),
            F.col(text_col).alias("_txt"),
            F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"),
        )
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "n_chunks",
            F.expr(f"substring(_txt, chunk_idx * {stride} + 1, {chunk_len})").alias(
                "chunk"
            ),
        )
    )
    return out.select(
        "id",
        "chunk_idx",
        "n_chunks",
        F.length("chunk").cast("long").alias("chunk_chars"),
        "chunk",
    )


def unigram_lm_scores(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame | None = None
) -> DataFrame:
    """Per-document unigram language-model quality proxy, integer-exact.

    The CCNet/KenLM-style curation signal — "is this document made of
    plausible tokens?" — reduced to a unigram model with integer-quantized
    log-probabilities so the score is bit-exact across engines and
    reduction orders: each token contributes ``floor(log2(corpus_freq))``
    (exact for doubles: log2 of an integer can only land ON an integer at
    powers of two, where it is computed exactly, so the floor can never
    waver).  Higher total/mean bits = more common tokens = more natural
    text; gibberish and rare-token spam score low.

    ``vocab`` defaults to the input corpus's own token frequencies (the
    self-scoring curation pass); pass a frozen vocab table with columns
    named EXACTLY ``(tok, freq)`` to score NEW documents against a
    reference corpus — tokens absent from it count as ``oov_tokens`` and
    contribute 0 bits.  Supplied rows with ``freq < 1`` are treated as
    out-of-vocabulary too (filtered before the join) rather than silently
    dropping the token's contribution while still counting it in
    ``n_tokens``, which is what a NULL ``log2`` would otherwise do
    (ADVICE r4).

    Shape: one shuffle builds the vocab, the score join keys on token, the
    doc rollup keys on id — three exchanges, all keyed, none corpus-squared.
    At 100 TB the vocab join is the big one; bucket the frozen vocab on
    token for co-located probes, or broadcast it when the vocabulary is
    bounded (real text: millions of tokens, broadcastable).

    Output: (id, n_tokens, oov_tokens, score_bits, mean_millibits).
    """
    # 0x1F is delimiter-class alongside whitespace, matching the BPE word
    # tokenizer (operators/bpe.py word_frequencies) — one tokenization
    # contract across the text-analysis surface
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"[\s\x1f]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    if vocab is None:
        vocab = toks.groupBy(F.col("tok")).agg(
            F.count(F.lit(1)).cast("long").alias("freq")
        )
    else:
        missing = {"tok", "freq"} - set(vocab.columns)
        if missing:
            raise ValueError(
                f"unigram_lm_scores: vocab must have columns ('tok', 'freq'); missing {sorted(missing)}"
            )
    # freq < 1 would make log2 NULL and silently drop the token from
    # score_bits while still counting it in n_tokens — treat as OOV instead
    scored = toks.join(vocab.select("tok", "freq").filter(F.col("freq") >= 1), "tok", "left")
    bits = F.when(
        F.col("freq").isNotNull(), F.floor(F.log2(F.col("freq"))).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("freq").isNull(), 1).otherwise(0)).cast("long").alias("oov_tokens"),
        F.sum(bits).cast("long").alias("score_bits"),
    )
    return per_doc.withColumn(
        "mean_millibits",
        F.floor(F.col("score_bits") * 1000 / F.col("n_tokens")).cast("long"),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bigram_vocab: DataFrame | None = None,
    unigram_vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document BIGRAM language-model quality proxy, integer-exact —
    the transition-plausibility upgrade of ``unigram_lm_scores`` (round 7):
    a document of common words in an implausible ORDER ("the the of and")
    scores high under a unigram model but low here.

    Doctrine unchanged: integer-quantized log-probabilities so the score
    is bit-exact across engines and reduction orders.  Each adjacent token
    pair (w1, w2) contributes ``floor(log2(c2(w1,w2)))`` pair bits and
    ``floor(log2(c2(w1,w2))) - floor(log2(c1(w1)))`` conditional bits —
    the latter an integer quantization of log2 P(w2|w1), negative when the
    transition is rarer than its context is common.  floor(log2(int)) is
    exact (log2 lands on an integer only at powers of two, computed
    exactly), and the conditional difference stays in int64.

    Tokenization matches the whole text-analysis surface (lowercase,
    ``[\\s\\x1f]+`` split, empties dropped ORDER-PRESERVINGLY via a
    filter on the token array — the pairing is over the cleaned sequence).
    ``bigram_vocab`` (w1, w2, freq) / ``unigram_vocab`` (tok, freq)
    default to the corpus's own counts (self-scoring pass, oov 0 by
    construction); pass frozen tables to score new documents — unseen
    pairs count as ``oov_bigrams`` and contribute 0 to both sums.

    Shape: bigram extraction is one codegen map (filter + slice + zip +
    explode — the token arrays never shuffle); one shuffle each for the
    two vocab builds; the score joins key on (w1, w2) and w1; the doc
    rollup keys on id.  At 100 TB broadcast or bucket the frozen vocabs
    (real-text bigram vocabularies are ~100M rows — bucketed, not
    broadcast).

    Output: (id, n_bigrams, oov_bigrams, pair_bits, cond_bits,
    mean_cond_millibits) — docs with fewer than two tokens carry zeros.
    """
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"[\s\x1f]+"), lambda t: t != ""
    )
    n = F.size(ws)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(ws, 1, n - 1).alias("w1"), F.slice(ws, 2, n - 1).alias("w2")
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    base = df.select(F.col(id_col).alias("id"), pairs.alias("ps"))
    bi = base.select(
        "id", F.explode_outer("ps").alias("p")
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # explode_outer keeps sub-2-token docs as a NULL pair row so they
    # surface with zero counts instead of vanishing
    if bigram_vocab is None:
        bigram_vocab = (
            bi.filter(F.col("w1").isNotNull())
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("long").alias("freq2"))
        )
    else:
        missing = {"w1", "w2", "freq"} - set(bigram_vocab.columns)
        if missing:
            raise ValueError(
                f"bigram_lm_scores: bigram_vocab needs (w1, w2, freq); missing {sorted(missing)}"
            )
        bigram_vocab = bigram_vocab.select(
            "w1", "w2", F.col("freq").cast("long").alias("freq2")
        ).filter(F.col("freq2") >= 1)
    if unigram_vocab is None:
        unigram_vocab = (
            bi.filter(F.col("w1").isNotNull())
            .groupBy(F.col("w1").alias("tok"))
            .agg(F.count(F.lit(1)).cast("long").alias("freq1"))
        )
    else:
        missing = {"tok", "freq"} - set(unigram_vocab.columns)
        if missing:
            raise ValueError(
                f"bigram_lm_scores: unigram_vocab needs (tok, freq); missing {sorted(missing)}"
            )
        unigram_vocab = unigram_vocab.select(
            "tok", F.col("freq").cast("long").alias("freq1")
        ).filter(F.col("freq1") >= 1)
    scored = bi.join(bigram_vocab, ["w1", "w2"], "left").join(
        unigram_vocab, bi["w1"] == unigram_vocab["tok"], "left"
    )
    known = F.col("freq2").isNotNull() & F.col("freq1").isNotNull()
    pair_bits = F.when(known, F.floor(F.log2("freq2")).cast("long")).otherwise(F.lit(0))
    cond_bits = F.when(
        known,
        (F.floor(F.log2("freq2")) - F.floor(F.log2("freq1"))).cast("long"),
    ).otherwise(F.lit(0))
    per_doc = scored.groupBy("id").agg(
        F.sum(F.when(F.col("w1").isNotNull(), 1).otherwise(0)).cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("w1").isNotNull() & ~known, 1).otherwise(0))
        .cast("long")
        .alias("oov_bigrams"),
        F.sum(pair_bits).cast("long").alias("pair_bits"),
        F.sum(cond_bits).cast("long").alias("cond_bits"),
    )
    return per_doc.withColumn(
        "mean_cond_millibits",
        F.when(
            F.col("n_bigrams") >= 1,
            F.floor(F.col("cond_bits") * 1000 / F.col("n_bigrams")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def collocations_pmi(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
) -> DataFrame:
    """Corpus collocation mining by integer-quantized PMI — the phrase
    discovery pass (word2vec's phrase pass, "new_york"-style compounds)
    a tokenizer-training pipeline runs before vocab induction.

    PMI(w1, w2) = log2( P(w1,w2) / (P(w1)·P(w2)) )
                = log2( c12·N / (c1·c2) )
    with c1 = w1's LEFT-position count, c2 = w2's RIGHT-position count and
    N = total bigrams — so the unigram marginals are the bigram table's own
    marginals and the probabilities sum to 1 exactly.  The score is
    quantized to the integer envelope floor(log2(c12·N)) − floor(log2(c1·c2)):
    both args are exact int64 products (< 2^53 for any corpus this gate
    sees; at web scale split the logs: floor-log2 of each factor brackets
    the same ranking), so the score is bit-exact cross-engine, reduction-
    order-free, and within 1 bit of true PMI — rank-faithful enough to
    screen collocation candidates, which is this operator's one job.

    Tokenization matches the rest of the text surface (lowercase,
    ``[\\s\\x1f]+`` split, empties dropped order-preservingly).  Shape:
    bigram extraction is a codegen map; ONE shuffle builds the bigram
    counts; the marginals re-aggregate FROM the bigram table (tiny) and
    join back broadcast — the token stream is read once.

    Output: (w1, w2, c12, c1, c2, pmi_bits), c12 >= min_count.
    """
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"[\s\x1f]+"), lambda t: t != ""
    )
    n = F.size(ws)
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(ws, 1, n - 1).alias("w1"), F.slice(ws, 2, n - 1).alias("w2")
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    n_total = bi.groupBy().agg(F.sum("c12").cast("long").alias("n_bi"))
    left = bi.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    right = bi.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    scored = (
        bi.filter(F.col("c12") >= min_count)
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(n_total))
    )
    pmi_bits = (
        F.floor(F.log2(F.col("c12") * F.col("n_bi")))
        - F.floor(F.log2(F.col("c1") * F.col("c2")))
    ).cast("long")
    return scored.select("w1", "w2", "c12", "c1", "c2", pmi_bits.alias("pmi_bits"))
