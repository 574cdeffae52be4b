"""Corpus-curation operators: PII redaction and C4-style line cleaning
(SURVEY.md §2.12 training-data surface).

Both are pure expression pipelines — chained ``regexp_replace`` /
higher-order array filters, no UDFs, no shuffle: they scale as a narrow map
stage over any corpus partitioning, and both are exactly reproducible in
DuckDB for the differential gate.

Regex portability contract: every pattern here is backreference- and
lookaround-free, so it means the same thing to Java's regex engine (Spark)
and RE2 (DuckDB, Go tooling).  Keep it that way when adding patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns for the common PII shapes a pre-training corpus scrub
# targets.  Order matters: credit cards before phones (a 16-digit card with
# dashes contains phone-shaped substrings).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Mask PII spans with ``[KIND]`` tokens and count hits per kind.

    Output: (id, redacted, n_<kind>... BIGINT).  Counts are taken on the
    ORIGINAL text per kind (before any replacement), then replacements are
    applied in pattern order — so an email inside a longer match is counted
    for its own kind, and the count columns are independent of replacement
    order.  One projection, no shuffle; at 100 TB this is a narrow map stage
    whose cost is the regex scans themselves (k patterns × bytes).
    """
    patterns = patterns if patterns is not None else PII_PATTERNS
    redacted: Column = F.col(text_col)
    counts = []
    for kind, pat in patterns.items():
        counts.append(
            # group 0 = whole match: Spark defaults to group 1, and these
            # patterns deliberately have no capture groups (RE2 parity)
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{kind}")
        )
        redacted = F.regexp_replace(redacted, pat, f"[{kind.upper()}]")
    return df.select(F.col(id_col).alias("id"), redacted.alias("redacted"), *counts)


# Phrases whose presence disqualifies a line (C4's "policy/boilerplate"
# list, abridged): lowercase membership check, not regex.
C4_BAD_PHRASES = ["javascript", "lorem ipsum", "cookie policy", "terms of use"]

# Terminal punctuation a kept line must end with (C4 keeps only sentence-
# like lines).  Character class shared verbatim with the DuckDB oracle.
_TERMINAL = r"""[.!?"']$"""


def _line_ok(line: Column, min_words: int, bad_phrases: list[str]) -> Column:
    words = F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))
    ok = line.rlike(_TERMINAL) & (words >= F.lit(min_words))
    low = F.lower(line)
    for phrase in bad_phrases:
        ok = ok & ~low.contains(phrase)
    return ok


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    bad_phrases: list[str] | None = None,
) -> DataFrame:
    """C4-style line-level cleaning: keep only sentence-like lines.

    A line survives iff it ends in terminal punctuation, has at least
    ``min_words`` whitespace tokens, and contains none of ``bad_phrases``
    (case-insensitive).  Output: (id, cleaned, n_lines, n_kept) with cleaned
    = surviving lines re-joined by newline ('' when nothing survives).

    Pure higher-order array expressions over ``split(text, '\\n')`` — per-row
    compute, no explode, no shuffle; documents never leave their partition.
    """
    bad = bad_phrases if bad_phrases is not None else C4_BAD_PHRASES
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _line_ok(l, min_words, bad))
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("cleaned"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )


# Query-parameter prefixes that carry tracking state, not content identity.
# '=' included where the name is exact so e.g. 'referrer=' is NOT dropped.
URL_TRACKING_PREFIXES: tuple[str, ...] = ("utm_", "fbclid=", "gclid=", "msclkid=", "ref=")

_URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonicalize_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_prefixes: tuple[str, ...] = URL_TRACKING_PREFIXES,
) -> DataFrame:
    """Web-crawl URL canonicalization for duplicate-cluster keying.

    Normalizations (the ones that never change what a server serves):
    fragment dropped; scheme and host lowercased; default port stripped
    (':80' for http, ':443' for https); trailing path slashes stripped with
    bare-host normalized to '/'; tracking query params dropped
    (``tracking_prefixes``); remaining params sorted so param order doesn't
    split a cluster.

    Output: (id, canonical_url).  Pure regex + higher-order array
    expressions — a narrow map stage, no shuffle, no UDF; every pattern is
    RE2-safe (no backrefs/lookaround) so DuckDB computes the identical
    canonical form for the differential gate.  At crawl scale this runs
    before every dedup operator in this module: exact-hash on
    canonical_url removes the largest duplicate class (same page re-crawled
    under URL noise) for the cost of a projection.
    """
    url = F.col(url_col)
    no_frag = F.regexp_replace(url, r"#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, _URL_SCHEME_RE, 1))
    rest = F.regexp_replace(no_frag, _URL_SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_extract(rest, r"^[^/?]*(.*)$", 1)
    path_raw = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path_raw, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)

    def _keep(p):
        cond = p != ""
        for pref in tracking_prefixes:
            cond = cond & ~p.startswith(pref)
        return cond

    params = F.filter(F.split(query, "&"), _keep)
    cquery = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(cquery == "", F.lit("")).otherwise(F.concat(F.lit("?"), cquery)),
    )
    return df.select(F.col(id_col).alias("id"), canonical.alias("canonical_url"))
