"""Text analyzers re-expressing the ArangoSearch layer (SURVEY.md §2.9).

Pure Column/DataFrame expressions — ``transform(sequence(...))`` generates
n-grams JVM-side with no UDFs, so analysis runs inside codegen and scales
linearly with text volume.

Ref: ArangoDbUtilities.java:219-249 (n-gram min3 max4 preserveOriginal;
text_en_no_stem: lowercase, accent-strip, no stemming, edge n-grams 3-12
preserveOriginal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal Latin-1 accent fold — matches the analyzer's accent:false intent for
# the corpora at hand; extend the mapping as inputs require.
_ACCENTED = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
_FOLDED = "aaaaaaceeeeiiiinooooouuuuyy"


def accent_fold(col: Column) -> Column:
    return F.translate(col, _ACCENTED, _FOLDED)


def char_ngrams(col: Column, n_min: int, n_max: int, preserve_original: bool) -> Column:
    """Array of character n-grams of ``col`` for n in [n_min, n_max],
    optionally including the original string.  Ref: ArangoDbUtilities.java:219-231."""
    # NB: the transform lambda must take exactly ONE parameter — PySpark
    # binds a second parameter to the array index, so a `n=n` default-arg
    # capture silently turns into (element, index).
    def gram_fn(n: int):
        return lambda i: col.substr(i, F.lit(n))

    grams = []
    for n in range(n_min, n_max + 1):
        grams.append(
            F.when(
                F.length(col) >= n,
                F.transform(F.sequence(F.lit(1), F.length(col) - (n - 1)), gram_fn(n)),
            ).otherwise(F.array())
        )
    out = F.concat(*grams) if len(grams) > 1 else grams[0]
    if preserve_original:
        out = F.concat(out, F.array(col))
    return out


def edge_ngrams(token: Column, n_min: int, n_max: int, preserve_original: bool) -> Column:
    """Array of edge (prefix) n-grams of a token for n in [n_min, n_max],
    optionally including the full token.  Ref: ArangoDbUtilities.java:234-249."""
    grams = F.when(
        F.length(token) >= n_min,
        F.transform(
            F.sequence(F.lit(n_min), F.least(F.lit(n_max), F.length(token))),
            lambda i: token.substr(F.lit(1), i),
        ),
    ).otherwise(F.array())
    if preserve_original:
        # preserveOriginal emits the whole token when it exceeds n_max
        grams = F.when(
            F.length(token) > n_max, F.concat(grams, F.array(token))
        ).otherwise(grams)
    return grams


def text_en_no_stem_tokens(col: Column) -> Column:
    """Lowercase + accent-fold + whitespace tokenize (NO stemming)."""
    return F.split(accent_fold(F.lower(col)), r"\s+")


def analyze_ngram(df: DataFrame, text_col: str, out_col: str = "ngram",
                  n_min: int = 3, n_max: int = 4, preserve_original: bool = True) -> DataFrame:
    """Emit one row per n-gram: the `n-gram` analyzer as a DataFrame op."""
    return df.select(
        "*", F.explode(char_ngrams(F.col(text_col), n_min, n_max, preserve_original)).alias(out_col)
    )


def analyze_edge_ngram(df: DataFrame, text_col: str, out_col: str = "gram",
                       n_min: int = 3, n_max: int = 12, preserve_original: bool = True) -> DataFrame:
    """Emit one row per edge n-gram per token: the `text_en_no_stem` analyzer."""
    toks = df.select("*", F.explode(text_en_no_stem_tokens(F.col(text_col))).alias("_token"))
    return toks.select(
        "*", F.explode(edge_ngrams(F.col("_token"), n_min, n_max, preserve_original)).alias(out_col)
    ).drop("_token")
