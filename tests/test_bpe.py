"""BPE training/encoding vs a pure-Python reference implementation.

bpe_train is an iterative driver loop (rows-only in the differential gate),
so its exactness evidence lives here: the same corpus, the same greedy
leftmost-non-overlapping merge application, the same (count DESC, pair ASC)
tie-break, compared merge-for-merge against an independent pure-Python BPE —
both on the gate's own sf0.01 documents table and on hypothesis-generated
corpora."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cell_kn_mvp_etl_ontologies_spark.operators.bpe import (
    bpe_encode_words,
    bpe_train,
    word_frequencies,
)

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ----------------------------------------------------------- reference ----
def ref_word_freqs(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            c[w] += 1
    return c


def ref_apply_merge(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def ref_bpe_train(texts: list[str], n_merges: int) -> list[tuple[int, str, str]]:
    vocab = {tuple(w): f for w, f in ref_word_freqs(texts).items()}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # max count, tie-break (left, right) ascending — mirrors the operator
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1]))
        vocab = {
            ref_apply_merge(s, best[0], best[1]): f for s, f in vocab.items()
        }
    return merges


def ref_encode(word: str, merges) -> tuple[str, ...]:
    syms = tuple(word)
    for _, left, right in sorted(merges):
        syms = ref_apply_merge(syms, left, right)
    return syms


# --------------------------------------------------------------- tests ----
def test_bpe_train_matches_python_reference_on_gate_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = bpe_train(docs, "text", n_merges=6)
    assert got == ref_bpe_train(texts, 6)
    assert len(got) == 6  # the corpus has at least 6 mergeable pairs


@SETTINGS
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=6
    ),
    st.integers(min_value=1, max_value=5),
)
def test_bpe_train_property(spark, texts, n_merges):
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    assert bpe_train(df, "text", n_merges) == ref_bpe_train(texts, n_merges)


def test_bpe_encode_words_matches_reference(spark):
    texts = ["the cat sat on the mat", "the cats", "a mat the cat likes"]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    merges = bpe_train(df, "text", n_merges=5)
    words = word_frequencies(df, "text")
    got = {r.word: tuple(r.tokens) for r in bpe_encode_words(words, merges).collect()}
    assert got == {w: ref_encode(w, merges) for w in got}
    # training words must round-trip: concatenating tokens rebuilds the word
    assert all("".join(toks) == w for w, toks in got.items())


def test_word_frequencies_treats_us_control_char_as_delimiter(spark):
    """ADVICE r5: chr(31) is the BPE oracle's in-band bracket delimiter, so
    it is delimiter-class in the tokenizer — a word can never contain it,
    making the oracle's replace-based merge replay sound by construction."""
    df = spark.createDataFrame(
        [("ab\x1fcd ef",), ("\x1f\x1fgh\x1f",)], "text STRING"
    )
    got = {r.word: r.freq for r in word_frequencies(df, "text").collect()}
    assert got == {"ab": 1, "cd": 1, "ef": 1, "gh": 1}
