"""Deduplication operators for training-data pipelines (SURVEY.md §2.12).

All hashing is md5/sha2-based (identical across Spark/DuckDB/most engines)
rather than engine-native hash functions, so results are portable and
oracle-checkable.  Everything is expression-level (no UDFs) and shuffle-
bounded: exact dedup is one hash aggregate; MinHash-LSH is
shingle-explode → per-doc signature aggregate → band-key join, the standard
linear-scan + bucketed-join shape that survives 100 TB corpora (no all-pairs
comparison ever materializes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..search.analyzers import char_ngrams


def dedup_exact_hash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact content dedup: one row per distinct sha2(text); keeps the
    smallest id as the canonical representative (deterministic)."""
    h = F.sha2(F.col(text_col), 256)
    return (
        df.select(h.alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    width: int,
    prefix_len: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) pairs: character shingles of the (optionally truncated)
    text.  ``distinct=False`` skips the set-dedup shuffle for consumers that
    are duplicate-insensitive (MIN-based MinHash): the biggest intermediate
    in the pipeline then never shuffles at all — partial aggregation folds it
    map-side."""
    src = F.col(text_col)
    if prefix_len is not None:
        src = F.substring(src, 1, prefix_len)
    out = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_ngrams(src, width, width, preserve_original=False)).alias("shingle"),
    )
    return out.distinct() if distinct else out


def minhash_signatures(
    sh: DataFrame, n_hashes: int, portable: bool = True
) -> DataFrame:
    """Per-id MinHash signature: sig[k] = MIN(h1 + k*h2) (Kirsch-Mitzenmacher
    double hashing, the same family Spark ML's MinHashLSH uses).

    ``portable=True`` (oracle-checkable): h1/h2 are the first/second 8 hex
    chars of md5(shingle) as integers — ONE digest per shingle row; deriving
    the k-th function arithmetically instead of hashing k times cuts the
    signature stage's md5 count by n_hashes× (the pipeline's dominant cost).
    Integer arithmetic is exact and engine-portable: h1,h2 < 2^32 and
    k < 2^16, so h1 + k*h2 < 2^49 never overflows BIGINT in any engine.

    ``portable=False``: h1/h2 = xxhash64(shingle, seed) masked to 32 bits —
    Spark-specific hashes, so only the portable path is differentially
    checked.  Measured at sf0.1 the md5 path is FASTER here (one digest
    CSE'd across h1/h2 vs two separate xxhash64 evaluations), so portable
    is also the default performance choice; the flag remains for engines
    pinning different hash families.
    """
    if portable:
        d = F.md5(F.col("shingle"))
        h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    else:
        h1 = F.xxhash64(F.col("shingle"), F.lit(1)).bitwiseAND(F.lit(0xFFFFFFFF))
        h2 = F.xxhash64(F.col("shingle"), F.lit(2)).bitwiseAND(F.lit(0xFFFFFFFF))
    sh = sh.select("id", h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min(F.col("h1") + F.lit(k) * F.col("h2")).alias(f"sig_{k}")
        for k in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_band_keys(sigs: DataFrame, n_hashes: int, n_bands: int) -> DataFrame:
    """(id, band_key) rows; band_key = md5(band || member sig values).

    Emitted via a single explode over an array of band expressions — a
    per-band union would re-evaluate the whole signature-aggregation subplan
    once per band (4 bands = 4 redundant aggregations in the physical plan).
    """
    rows_per_band = n_hashes // n_bands
    bands = []
    for b in range(n_bands):
        members = [
            F.col(f"sig_{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        bands.append(F.md5(F.concat_ws("|", F.lit(str(b)), *members)))
    return sigs.select("id", F.explode(F.array(*bands)).alias("band_key"))


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_width: int = 5,
    prefix_len: int | None = None,
    n_hashes: int = 6,
    n_bands: int = 3,
    portable: bool = True,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) sharing at least one LSH band.

    Scale shape: signatures are one aggregate over the shingle explode;
    candidates come from a self-join on band_key — the join key space is the
    band hash, so skew only arises from genuinely duplicate content.

    ``max_bucket`` (round 5, the stop-template lever): a template-heavy
    corpus concentrates most documents into a few band buckets, and the
    candidate volume is sum(bucket²/2) — at sf0.1 the synthetic documents
    put 736 of 5250 docs in ONE bucket (270k pairs from a single band;
    1.68M emissions total; SCALE.md §minhash-profile), which is real pair
    volume, not hashing cost.  Setting ``max_bucket`` drops buckets larger
    than the cap before pair expansion — the same overcrowded-posting-list
    doctrine as the capped inverted index: a band shared by hundreds of
    documents identifies a boilerplate template, not near-duplication, and
    pairs sharing ONLY such bands are (documented) recall loss.  The capped
    path groups per bucket and double-explodes the member array, so the cap
    also bounds per-task work; ``None`` keeps exact join semantics."""
    sigs = minhash_signatures(
        shingles(df, text_col, id_col, shingle_width, prefix_len, distinct=False),
        n_hashes,
        portable=portable,
    )
    bands = minhash_band_keys(sigs, n_hashes, n_bands)
    if max_bucket is not None:
        buckets = bands.groupBy("band_key").agg(
            F.sort_array(F.collect_set("id")).alias("ids")
        )
        buckets = buckets.filter(
            (F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
        )
        pairs = (
            buckets.select(F.explode("ids").alias("a"), "ids")
            .select("a", F.explode("ids").alias("b"))
            .filter(F.col("a") < F.col("b"))
        )
        return pairs.distinct()
    a = bands.select(F.col("id").alias("a"), "band_key")
    b = bands.select(F.col("id").alias("b"), "band_key")
    return (
        a.join(b, on="band_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def dedup_incremental_lsh(
    new_df: DataFrame,
    corpus_bands: DataFrame,
    text_col: str,
    id_col: str,
    shingle_width: int = 5,
    prefix_len: int | None = None,
    n_hashes: int = 6,
    n_bands: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Screen a NEW batch of documents against an existing corpus whose LSH
    band keys are already materialized — the incremental-ingestion shape of
    near-dedup: per increment, only the new batch is shingled and hashed; the
    corpus is never rescanned, its (id, band_key) table is just joined.

    At 100 TB this is the difference between O(batch) and O(corpus) work per
    ingest: corpus band keys live in a bucketed table keyed on band_key, so
    the probe is a co-located join.  ``corpus_bands`` must come from
    ``minhash_band_keys`` with the SAME shingle/hash/band parameters —
    mismatched parameters silently produce disjoint key spaces.

    Output: one row per distinct new id — (id, is_dup BOOLEAN,
    matched = min matching corpus id or NULL).
    """
    sigs = minhash_signatures(
        shingles(new_df, text_col, id_col, shingle_width, prefix_len, distinct=False),
        n_hashes,
        portable=portable,
    )
    new_bands = minhash_band_keys(sigs, n_hashes, n_bands)
    hits = (
        new_bands.join(
            corpus_bands.select(F.col("id").alias("matched"), "band_key"),
            on="band_key",
        )
        .groupBy("id")
        .agg(F.min("matched").alias("matched"))
    )
    ids = new_df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(hits, on="id", how="left").select(
        "id", F.col("matched").isNotNull().alias("is_dup"), "matched"
    )


def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash fingerprint over whitespace tokens (portable bit
    arithmetic: hex-digit decoding via instr, no engine-native hash).

    Output: (id, simhash BIGINT).  Identical fingerprints flag near-identical
    token distributions; at scale, group by fingerprint (or by rotated
    fingerprint segments) to generate candidates.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    bits = toks.select(
        "id", "tok", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b")
    )
    # bit b of the first 4 hex chars of md5(tok):
    #   char index = b div 4, bit-in-char = 3 - b % 4 (MSB first)
    hex_char = F.substring(F.md5(F.col("tok")), F.floor(F.col("b") / 4).cast("int") + 1, 1)
    hex_val = F.instr(F.lit("0123456789abcdef"), hex_char) - 1
    bit = F.floor(hex_val / F.pow(F.lit(2.0), (3 - F.col("b") % 4).cast("double"))).cast("long") % 2
    votes = bits.select("id", "b", F.when(bit == 1, 1).otherwise(-1).alias("vote"))
    per_bit = votes.groupBy("id", "b").agg(F.sum("vote").alias("v"))
    # 2^b via pow (exact for b<=15; shiftleft needs a literal bit count)
    return per_bit.groupBy("id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("b").cast("double")).cast("long")).otherwise(0)
        ).alias("simhash")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_width: int = 3,
    prefix_len: int | None = None,
    min_containment: float = 0.0,
) -> DataFrame:
    """Directed shingle containment C(a→b) = |A∩B| / |A| for ordered pairs —
    the asymmetric twin of Jaccard that catches SUBSET duplicates (a short
    document wholly embedded in a longer one, quote farms, benchmark text
    pasted into a webpage), which symmetric Jaccard under-scores because the
    union is dominated by the longer side.

    Same sparse-similarity shape as ngram_jaccard_pairs: candidates come from
    a shingle equi-join (never a cross product), |A∩B| from the join count,
    |A| from a per-doc size aggregate.  Emits both directions of each pair
    (a≠b) so callers filter on the direction they mean: high C(a→b) reads
    "a is contained in b"."""
    sh = shingles(df, text_col, id_col, shingle_width, prefix_len)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("n_a"))
    out = common.join(sa, "a").select(
        "a",
        "b",
        (F.col("n_common").cast("double") / F.col("n_a").cast("double")).alias(
            "containment"
        ),
    )
    if min_containment > 0.0:
        out = out.filter(F.col("containment") >= min_containment)
    return out


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, shingle_width: int = 3, prefix_len: int | None = None
) -> DataFrame:
    """Exact pairwise Jaccard over character-shingle sets via a shingle join:
    |A∩B| from the join, |A∪B| = |A| + |B| − |A∩B|.  Emits (a, b, jaccard
    DOUBLE) for pairs sharing ≥1 shingle — the sparse-similarity shape that
    avoids the full cross product."""
    sh = shingles(df, text_col, id_col, shingle_width, prefix_len)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def fuzzy_pairs_levenshtein(
    df: DataFrame,
    text_col: str,
    id_col: str,
    prefix_len: int = 12,
    max_dist: int = 4,
) -> DataFrame:
    """Edit-distance near-duplicate pairs via prefix-bucketed candidate
    generation: normalize (lower + trim), equi-join on the first
    ``prefix_len`` characters, then refine with exact levenshtein ≤
    ``max_dist``.  Output: (id_a, id_b, dist) with id_a < id_b.

    The prefix bucket turns the all-pairs O(N²) comparison into an
    equi-join whose cost is Σ bucket_size² — at 100 TB the buckets are the
    unit of work and the levenshtein refine (JVM codegen, no Python) runs
    only inside them.  Recall contract: a pair is found iff the edits all
    fall AFTER the shared prefix; for edits anywhere, swap the bucket key
    for a MinHash band key (dedup_minhash_lsh) and keep the same refine.
    Boilerplate-heavy corpora (shared headers) make one bucket quadratic —
    cap bucket size or extend prefix_len upstream for those.
    """
    norm = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.lower(F.trim(F.col(text_col))).alias("_t"),
    ).withColumn("_pfx", F.substring(F.col("_t"), 1, prefix_len))
    a, b = norm.alias("a"), norm.alias("b")
    dist = F.levenshtein(F.col("a._t"), F.col("b._t"))
    return (
        a.join(
            b,
            (F.col("a._pfx") == F.col("b._pfx")) & (F.col("a._id") < F.col("b._id")),
        )
        .filter(dist <= max_dist)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            dist.cast("long").alias("dist"),
        )
    )


def duplicated_span_hashes(
    df: DataFrame, text_col: str, id_col: str, window_tokens: int = 8
) -> DataFrame:
    """Cross-document duplicated token-window detection — the scalable core
    of substring-level exact dedup (the suffix-array method of "Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022, recast as
    a window-hash equi-group instead of a monolithic suffix array).

    Every ``window_tokens``-token sliding window is hashed; a hash held by
    more than one document marks a duplicated span.  Output: (span, n_docs,
    n_occurrences, first_doc) per duplicated window hash.

    Scale: tokenization and window hashing are per-row expression work (no
    shuffle, no Python); the only shuffle is the groupBy on the 128-bit span
    hash, which partial-aggregates map-side.  Fan-out is ~one row per token
    (each token starts ≤1 window), so the exploded set is O(total tokens) —
    the same order as the corpus itself.  Downstream, consumers join spans
    back to documents to splice out repeated regions; stop-phrase-grade
    spans (boilerplate headers at 1e6+ occurrences) are the skew risk —
    the groupBy's map-side combine absorbs them, and a HAVING-style cap on
    n_occurrences bounds what flows to the join.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).cast("long").alias("_id"), toks.alias("_t"))
    n_wins = F.size("_t") - window_tokens + 1
    # Hash inside transform() so only the 32-char hashes explode — exploding
    # the window INDEX instead would copy the whole token array into every
    # window row within the stage.
    span_hashes = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_t"), i, window_tokens))),
    )
    wins = base.filter(F.size("_t") >= window_tokens).select(
        "_id", F.explode(span_hashes).alias("span")
    )
    return (
        wins
        .groupBy("span")
        .agg(
            F.countDistinct("_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("_id").cast("long").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def remove_duplicate_segments(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    seg_tokens: int = 10,
) -> DataFrame:
    """Corpus REWRITE removing exact duplicated segments across documents
    (Lee et al. 2022's dedup-then-keep-one applied at aligned-segment
    grain): the token stream is cut into fixed ``seg_tokens`` segments,
    each distinct segment text survives only at its globally FIRST
    occurrence (min (doc, position) — deterministic, not partition-order),
    and every document is rebuilt from its kept segments in order.  The
    detection siblings (`dedup_substring_spans` = sliding window hashes,
    `dedup_exact_hash` = whole-doc) report; this one produces the cleaned
    corpus, which is the artifact a training pipeline actually ships.

    Shape: segmentation is a codegen map (slice + array_join inside
    ``transform`` — token arrays never shuffle); ONE shuffle elects
    winners (groupBy segment text, min-struct — boilerplate mega-segments
    absorb into map-side combine); one join back + one keyed rebuild.
    Output: (id, clean_text, n_segments, n_kept) for EVERY input doc
    (fully-duplicated docs come back with empty text, making removal
    visible rather than silent).
    """
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"[\s\x1f]+"), lambda t: t != ""
    )
    n_seg = F.ceil(F.size(ws) / F.lit(seg_tokens)).cast("int")
    segs_arr = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(ws, i * seg_tokens + 1, seg_tokens), " "),
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.when(F.size(ws) > 0, segs_arr)
        .otherwise(F.array().cast("array<string>"))
        .alias("_segs"),
    )
    segs = base.select(
        "id", F.posexplode("_segs").alias("seg_idx", "seg")
    )
    winners = segs.groupBy("seg").agg(
        F.min(F.struct(F.col("id").alias("wid"), F.col("seg_idx").alias("widx"))).alias("w")
    )
    kept = (
        segs.join(winners, "seg")
        .filter((F.col("id") == F.col("w.wid")) & (F.col("seg_idx") == F.col("w.widx")))
        .select("id", "seg_idx", "seg")
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = base.select("id", F.size("_segs").cast("long").alias("n_segments"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_segments",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )
