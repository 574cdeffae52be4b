"""Deterministic English stemming analyzer — the ``text_en`` view analyzer
(SURVEY.md §2.9; ref ArangoDbUtilities.java:301, where the search view links
"text_en" alongside "text_en_no_stem", "n-gram", and identity per field).

A Porter-subset stemmer expressed as a RULE CHAIN of regexp conditions —
one stage per Porter step, each stage a single SQL expression over the
previous stage's column.  The same rule table renders to BOTH dialects
(Spark SQL for the data plane, DuckDB SQL for the differential oracle), so
the catalog gate replays the exact rules rather than trusting a second
implementation.  Everything stays JVM-side whole-stage codegen: no UDFs,
and staging via columns (not nested expressions) keeps each codegen
fragment small.

Subset semantics (documented divergences from full Porter, all
deterministic): step 1a verbatim; step 1b with the m>0 / *v* measure
conditions expressed as vowel / vowel-consonant regex guards (Porter's
y-as-vowel refinement is ignored); 1b fixups AT/BL/IZ→+e and
double-consonant undoubling (the (m=1 ∧ *o)→E rule is omitted); step 1c
verbatim; a step-2 suffix subset (ATIONAL→ATE, TIONAL→TION, IZATION→IZE,
IVENESS→IVE, FULNESS→FUL, OUSNESS→OUS, BILITI→BLE, ENTLI→ENT, OUSLI→OUS,
NESS→∅) under the same VC guard; and final-E deletion under a VC guard
(step 5a's common case).  At 100 TB the analyzer is a per-token map —
no shuffle, no state; stemming cost is linear in token volume and fully
vectorized by codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) — step 2 subset, first match wins, longest first
# where suffixes overlap (Porter's own table order keeps ATIONAL before
# TIONAL).  The VC guard '[aeiou][^aeiou][a-z]*' is prepended at render
# time; because the regex requires the WHOLE literal suffix after the VC
# pair, a VC inside the suffix itself can never satisfy the guard.
STEP2_RULES: list[tuple[str, str]] = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("ization", "ize"),
    ("iveness", "ive"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("biliti", "ble"),
    ("entli", "ent"),
    ("ousli", "ous"),
    ("ness", ""),
]

_DOUBLE = "(bb|cc|dd|ff|gg|hh|jj|kk|mm|nn|pp|qq|rr|tt|vv|ww|xx)$"


def _m(expr: str, pattern: str, dialect: str) -> str:
    """Regex-match predicate in the target dialect."""
    if dialect == "duckdb":
        return f"regexp_matches({expr}, '{pattern}')"
    return f"({expr} RLIKE '{pattern}')"


def step1a_sql(c: str, dialect: str) -> str:
    """Porter 1a: SSES→SS, IES→I, SS→SS, S→∅ (first match wins)."""
    return (
        f"CASE WHEN {_m(c, 'sses$', dialect)} THEN regexp_replace({c}, 'sses$', 'ss') "
        f"WHEN {_m(c, 'ies$', dialect)} THEN regexp_replace({c}, 'ies$', 'i') "
        f"WHEN {_m(c, 'ss$', dialect)} THEN {c} "
        f"WHEN {_m(c, 's$', dialect)} THEN regexp_replace({c}, 's$', '') "
        f"ELSE {c} END"
    )


def step1b_sql(c: str, dialect: str) -> str:
    """Porter 1b strip: (VC)EED→EE; (*v*)ED→∅; (*v*)ING→∅.  EVERY output
    is prefixed with a one-char marker — '+' when an ED/ING strip happened
    (the NEXT stage must apply the 1b fixups; a 'mitt' must not be
    undoubled), '-' otherwise — so a RAW token that happens to start with
    '+' can never impersonate a marked strip (the fixup stage always
    removes exactly one marker char)."""
    return (
        f"CASE WHEN {_m(c, '[aeiou][^aeiou][a-z]*eed$', dialect)} "
        f"THEN '-' || regexp_replace({c}, 'eed$', 'ee') "
        # longest-suffix-match: an EED that fails the m>0 guard (feed)
        # STOPS here — it must not fall through to the ED rule
        f"WHEN {_m(c, 'eed$', dialect)} THEN '-' || {c} "
        f"WHEN {_m(c, '[aeiou][a-z]*ed$', dialect)} "
        f"THEN '+' || regexp_replace({c}, 'ed$', '') "
        f"WHEN {_m(c, '[aeiou][a-z]*ing$', dialect)} "
        f"THEN '+' || regexp_replace({c}, 'ing$', '') "
        f"ELSE '-' || {c} END"
    )


def step1b_fixup_sql(c: str, dialect: str) -> str:
    """Porter 1b fixups on '+'-marked strips: AT/BL/IZ → +'e'; double
    consonant (not l/s/z) → single.  Always removes exactly the one
    marker char step1b prefixed ('-'-marked tokens pass through)."""
    return (
        f"CASE WHEN {c} LIKE '-%' THEN substr({c}, 2, length({c}) - 1) "
        f"WHEN {_m(c, '(at|bl|iz)$', dialect)} "
        f"THEN substr({c}, 2, length({c}) - 1) || 'e' "
        f"WHEN {_m(c, _DOUBLE, dialect)} THEN substr({c}, 2, length({c}) - 2) "
        f"ELSE substr({c}, 2, length({c}) - 1) END"
    )


def step1c_sql(c: str, dialect: str) -> str:
    """Porter 1c: (*v*) Y→I."""
    return (
        f"CASE WHEN {_m(c, '[aeiou][a-z]*y$', dialect)} "
        f"THEN regexp_replace({c}, 'y$', 'i') ELSE {c} END"
    )


def step2_sql(c: str, dialect: str) -> str:
    """Step-2 suffix subset under the m>0 (vowel-consonant-in-stem) guard."""
    whens = " ".join(
        f"WHEN {_m(c, '[aeiou][^aeiou][a-z]*' + suf + '$', dialect)} "
        f"THEN regexp_replace({c}, '{suf}$', '{rep}')"
        for suf, rep in STEP2_RULES
    )
    return f"CASE {whens} ELSE {c} END"


def step5e_sql(c: str, dialect: str) -> str:
    """Final-E deletion under the VC guard (step 5a's common case:
    merge→merg, value→valu; blue/the untouched — no VC before the e)."""
    return (
        f"CASE WHEN {_m(c, '[aeiou][^aeiou][a-z]*e$', dialect)} "
        f"THEN substr({c}, 1, length({c}) - 1) ELSE {c} END"
    )


STAGES = [step1a_sql, step1b_sql, step1b_fixup_sql, step1c_sql, step2_sql, step5e_sql]


def stem_tokens(df: DataFrame, token_col: str, out_col: str = "stem") -> DataFrame:
    """Add ``out_col`` = stem(``token_col``) via the staged rule chain.

    Tokens are assumed lowercased (use ``text_en_no_stem_tokens`` /
    ``accent_fold`` upstream).  Each stage is its own column so codegen
    fragments stay small — nesting all six stages into one expression
    would duplicate the input ~6^6 times."""
    cur = token_col
    tmp: list[str] = []
    for i, stage in enumerate(STAGES):
        nxt = out_col if i == len(STAGES) - 1 else f"__stem_s{i}"
        if nxt != out_col:
            tmp.append(nxt)
        df = df.withColumn(nxt, F.expr(stage(cur, "spark")))
        cur = nxt
    return df.drop(*tmp)


def stem_chain_ctes(
    input_cte: str, token_col: str, out_cte: str, dialect: str = "duckdb",
    prefix: str = "__stem",
) -> str:
    """Render the stage chain as SQL CTE clauses (for the DuckDB oracle):
    ``<in> -> <prefix>0 ... -> <out_cte>(.. stem)``.  Returns the text to
    splice after a WITH; every non-token column of ``input_cte`` is
    carried through via ``* EXCLUDE``.  Pass a distinct ``prefix`` per
    chain when one query stems two inputs (corpus + query terms)."""
    parts = []
    cur_cte, cur_col = input_cte, token_col
    for i, stage in enumerate(STAGES):
        nxt_cte = out_cte if i == len(STAGES) - 1 else f"{prefix}{i}"
        nxt_col = "stem" if i == len(STAGES) - 1 else f"{prefix}c{i}"
        parts.append(
            f"{nxt_cte} AS (SELECT * EXCLUDE ({cur_col}), "
            f"{stage(cur_col, dialect)} AS {nxt_col} FROM {cur_cte})"
        )
        cur_cte, cur_col = nxt_cte, nxt_col
    return ", ".join(parts)


def analyze_text_en(df: DataFrame, text_col: str, out_col: str = "stem") -> DataFrame:
    """The ``text_en`` analyzer as a DataFrame op: lowercase + accent-fold
    + whitespace tokenize + stem; one row per (input row, stemmed token).
    Ref: ArangoDbUtilities.java:301 ("text_en" in the view's analyzer list)."""
    from .analyzers import text_en_no_stem_tokens

    toks = df.select(
        "*", F.explode(text_en_no_stem_tokens(F.col(text_col))).alias("__token")
    ).filter(F.col("__token") != "")
    return stem_tokens(toks, "__token", out_col).drop("__token")
