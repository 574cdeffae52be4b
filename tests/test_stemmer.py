"""text_en stemming analyzer (search/stemmer.py): golden Porter-subset
pairs, dual-dialect (Spark vs DuckDB) identity from the shared rule table,
and the analyzer surface."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.search.stemmer import (
    STAGES,
    analyze_text_en,
    stem_chain_ctes,
    stem_tokens,
)

# (token, expected stem) under THIS rule chain — Porter steps 1a/1b(+fixups)/
# 1c, the step-2 subset, and guarded final-E deletion.  Divergences from
# full Porter (no step-4, no (m=1 ∧ *o)→E) are intentional and documented
# in the module docstring; expectations here follow the repo's rules.
GOLDEN = [
    # step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    # step 1b + fixups
    ("feed", "feed"),  # m=0: no VC before eed
    ("agreed", "agre"),  # 1b eed→ee, then guarded final-E deletion (= stem of 'agree')
    ("plastered", "plaster"),
    ("bled", "bled"),  # no vowel before ed
    ("motoring", "motor"),
    ("sing", "sing"),  # no vowel before ing
    ("hopping", "hop"),  # double-consonant undoubling
    ("sized", "siz"),  # iz → ize, then guarded final-E deletion (= stem of 'size')
    ("failing", "fail"),
    ("mitt", "mitt"),  # no strip → no undoubling
    # step 1c
    ("happy", "happi"),
    ("sky", "sky"),  # no vowel in stem
    # step 2 subset with the m>0 guard
    ("relational", "relat"),  # step2 ate, then final-E deletion (true Porter too)
    ("rational", "rational"),  # guard: no VC before suffix
    ("conditional", "condition"),
    ("goodness", "good"),
    # final-E deletion with the VC guard
    ("merge", "merg"),
    ("value", "valu"),
    ("blue", "blue"),
    ("the", "the"),
    ("agree", "agre"),
    # stemmed-search parity pairs (the catalog query's doctrine)
    ("merging", "merg"),
    ("queries", "queri"),
    ("query", "queri"),
    ("scanned", "scan"),
    ("scan", "scan"),
    ("windows", "window"),
    ("ordered", "order"),
]


def test_stemmer_golden_pairs(spark):
    df = spark.createDataFrame([(w,) for w, _ in GOLDEN], "tok string")
    got = {r.tok: r.stem for r in stem_tokens(df, "tok").collect()}
    for word, want in GOLDEN:
        assert got[word] == want, f"{word}: got {got[word]}, want {want}"


def test_stemmer_dialects_agree(spark):
    """The SAME rule table rendered to Spark SQL and DuckDB SQL must stem
    every golden token (plus edge shapes) identically — the property the
    catalog oracle rests on."""
    words = [w for w, _ in GOLDEN] + ["a", "i", "ss", "s", "ed", "ing", "eed", ""]
    words = [w for w in words if w]  # analyzer filters empty upstream
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    spark_stems = {r.tok: r.stem for r in stem_tokens(df, "tok").collect()}

    vals = ", ".join(f"('{w}')" for w in words)
    sql = (
        f"WITH q AS (SELECT tok AS word, tok FROM (VALUES {vals}) v(tok)), "
        + stem_chain_ctes("q", "tok", "out", "duckdb")
        + " SELECT word, stem FROM out"
    )
    duck_stems = dict(duckdb.sql(sql).fetchall())
    assert duck_stems == spark_stems


def test_stage_count_stable():
    # the oracle builder and the Spark chain share STAGES; a stage added to
    # one side only would silently fork the rules
    assert len(STAGES) == 6


def test_analyze_text_en_rows(spark):
    df = spark.createDataFrame(
        [(1, "Merging  the caresses"), (2, "happy Ponies")], "id long, text string"
    )
    out = analyze_text_en(df, "text")
    got = {(r.id, r.stem) for r in out.collect()}
    assert got == {(1, "merg"), (1, "the"), (1, "caress"), (2, "happi"), (2, "poni")}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# includes '+'/'-' (the step-1b marker chars — a raw token starting with
# them must never be mistaken for a marked strip) and digits
_token = st.text(alphabet="abcdefghijklmnopqrstuvwxyz+-0123456789", min_size=1, max_size=14)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(_token, min_size=1, max_size=30, unique=True))
def test_stemmer_dialects_agree_property(spark, words):
    """Property pin of the dual-dialect contract: for ARBITRARY lowercase
    ASCII tokens (not just the golden list), the Spark staged chain and the
    DuckDB CTE rendering of the same rule table produce identical stems."""
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    spark_stems = {r.tok: r.stem for r in stem_tokens(df, "tok").collect()}
    vals = ", ".join(f"('{w}')" for w in words)
    sql = (
        f"WITH q AS (SELECT tok AS word, tok FROM (VALUES {vals}) v(tok)), "
        + stem_chain_ctes("q", "tok", "out", "duckdb")
        + " SELECT word, stem FROM out"
    )
    duck_stems = dict(duckdb.sql(sql).fetchall())
    assert duck_stems == spark_stems
