"""BPE (byte-pair-encoding) tokenizer training and encoding, corpus-scale.

The structure that makes this viable at 100 TB: the CORPUS is touched
exactly once — a single shuffle builds the word-frequency table — and every
training iteration (and the whole encode) runs over VOCABULARY-cardinality
data (distinct words), which is orders of magnitude smaller and shrinks
nothing as the corpus grows past full vocabulary coverage.  This is the
same factorization production tokenizer trainers use.

Training loop (``bpe_train``): per merge round, adjacent-symbol pair counts
are ONE partial-aggregating groupBy over the vocab table; the argmax is a
1-row driver collect (the pagerank-class bounded driver loop, n_merges
iterations); the merge applies as a left-fold ``aggregate()`` expression
over each word's symbol array — greedy leftmost non-overlapping
replacement, the standard BPE application order, entirely JVM-side.  ``localCheckpoint``
after each application keeps the expression tree flat (k nested folds would
otherwise grow the plan linearly in merges).

Determinism: counts are exact integers; the argmax tie-break is
(count DESC, left ASC, right ASC) — bit-stable across partitionings and
engines, so trained merge tables are reproducible artifacts.

Encoding (``bpe_encode_words``): applies the ranked merge list to the
DISTINCT words, producing a word→tokens dictionary to broadcast-join onto
the token stream — the corpus is never folded per merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq): lowercased whitespace words — the ONE corpus-scale
    aggregation in the BPE pipeline.

    The US control character (0x1F) is delimiter-class alongside
    whitespace: the DuckDB oracle's replace-based merge replay brackets
    symbols with chr(31), so a word CONTAINING chr(31) would corrupt its
    delimiter structure (ADVICE r5).  Excluding it from word content here
    — mirrored in the oracles' split regex — makes the in-band delimiter
    sound by construction; no real tokenizer keeps C0 controls in tokens."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"[\s\x1f]+")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, syms ARRAY<STRING>): initial single-character symbols."""
    return words.select("word", "freq", F.split(F.col("word"), "").alias("syms"))


def bpe_pair_counts(symdf: DataFrame) -> DataFrame:
    """(left, right, cnt): frequency-weighted adjacent-symbol pair counts
    over the vocabulary — one merge round's statistics in one aggregate.

    The pair explode is vocab-scale fan-out (~word length per word) and the
    groupBy's partial aggregation collapses it map-side; single-symbol words
    are guarded out (``sequence(1, 0)`` DESCENDS in Spark rather than being
    empty)."""
    pairs = symdf.filter(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS left, syms[i] AS right))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("freq").cast("long").alias("cnt")
    )


def _apply_merge(symdf: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every leftmost non-overlapping (left, right) adjacency with
    the concatenated symbol, via a left-fold aggregate() — a merged token
    never immediately re-merges because left+right != left (right is
    non-empty), matching standard BPE application."""
    la, lb = F.lit(left), F.lit(right)
    merged = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return symdf.select("word", "freq", merged.alias("syms"))


def bpe_train(df: DataFrame, text_col: str, n_merges: int) -> list[tuple[int, str, str]]:
    """Train ``n_merges`` BPE merges; returns [(rank, left, right), ...]
    (possibly shorter if the vocabulary runs out of adjacent pairs).

    Driver involvement is one 1-row collect per round (the argmax) — the
    same bounded control-flow class as PageRank's convergence loop.  All
    heavy work is vocab-cardinality; the corpus feeds ONE word-count
    shuffle up front."""
    syms = _initial_symbols(word_frequencies(df, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        best = (
            bpe_pair_counts(syms)
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((rank, left, right))
        # checkpoint per round: each fold wraps syms in another aggregate()
        # expression — without the cut the plan deepens linearly in merges
        syms = _apply_merge(syms, left, right).localCheckpoint()
    return merges


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[int, str, str]]
) -> DataFrame:
    """(word, tokens ARRAY<STRING>): apply the ranked merge list to distinct
    words — the dictionary to broadcast-join onto a token stream, so the
    corpus itself is never re-folded per merge.  Checkpoints every few
    merges to bound the expression tree."""
    out = words.select("word", "freq", F.split(F.col("word"), "").alias("syms"))
    for i, (_, left, right) in enumerate(sorted(merges)):
        out = _apply_merge(out, left, right)
        if (i + 1) % 4 == 0:
            out = out.localCheckpoint()
    return out.select("word", "freq", F.col("syms").alias("tokens"))
