"""Unit tests for the round-7 final batch (catalog/frontier4.py):
retrieval evaluation (exact AUC, NDCG/MRR), RRF hybrid fusion, CDC
payload near-dup, feature hashing, CUPED, and the survival risk table.

Each test checks the OPERATOR against an independent pure-python
reference on planted data — the sf0.01 DuckDB differential gate covers
the registered query itself; these pin the math so a refactor that
breaks a property fails here first with a readable diff.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog.frontier4 import (
    _NDCG_DISC_PPM,
    _NDCG_IDCG_PPM,
)
from cell_kn_mvp_etl_ontologies_spark.operators.cdc import (
    CDC_M as _CDC_M,
    CDC_MOD as _CDC_MOD,
    CDC_P as _CDC_P,
    CDC_W as _CDC_W,
)

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# NDCG constants
# --------------------------------------------------------------------------
def test_ndcg_discount_table_matches_log2():
    for r, d in enumerate(_NDCG_DISC_PPM, start=1):
        assert d == int(1_000_000 / math.log2(r + 1))


def test_ndcg_idcg_is_prefix_sum_of_discounts():
    acc = 0
    for d, pre in zip(_NDCG_DISC_PPM, _NDCG_IDCG_PPM):
        acc += d
        assert pre == acc


# --------------------------------------------------------------------------
# exact AUC (Mann-Whitney with midranks)
# --------------------------------------------------------------------------
def _auc_reference(pairs):
    """Naive O(n^2) AUC: P(score_pos > score_neg) + 0.5 P(tie)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return num / (len(pos) * len(neg))


def _auc_rank_sum(spark, pairs):
    """Replay the catalog query's integer rank-sum math on planted rows."""
    df = spark.createDataFrame(
        [("g", s, y) for s, y in pairs], ["source", "s", "pos"]
    )
    from pyspark.sql import Window

    per = df.groupBy("source", "s").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p")
    )
    w = Window.partitionBy("source").orderBy("s")
    ranked = per.withColumn(
        "r2", 2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1
    )
    row = (
        ranked.groupBy("source")
        .agg(
            F.sum("p").alias("n_pos"),
            (F.sum("c") - F.sum("p")).alias("n_neg"),
            F.sum(F.col("p") * F.col("r2")).alias("rsum2"),
        )
        .collect()[0]
    )
    num2 = row.rsum2 - row.n_pos * (row.n_pos + 1)
    den2 = 2 * row.n_pos * row.n_neg
    return num2, den2


@pytest.mark.parametrize(
    "pairs",
    [
        # perfect separation -> AUC 1
        [(1, 0), (2, 0), (3, 1), (4, 1)],
        # inverted -> AUC 0
        [(9, 0), (8, 0), (1, 1), (2, 1)],
        # all tied -> AUC 0.5 exactly via midranks
        [(5, 0), (5, 1), (5, 0), (5, 1)],
        # mixed with tie clusters
        [(1, 0), (2, 1), (2, 0), (2, 0), (3, 1), (3, 0), (7, 1)],
    ],
)
def test_auc_rank_sum_equals_naive_reference(spark, pairs):
    num2, den2 = _auc_rank_sum(spark, pairs)
    assert num2 >= 0, "doubled numerator must be non-negative (DIV safety)"
    assert num2 / den2 == pytest.approx(_auc_reference(pairs))


# --------------------------------------------------------------------------
# RRF fusion
# --------------------------------------------------------------------------
def test_rrf_fusion_matches_python_reference(spark, tmp_path):
    # planted runs: lexical ranks docs a,b,c; dense ranks b,d
    lex = {"a": 1, "b": 2, "c": 3}
    dense = {"b": 1, "d": 2}

    def rrf(doc):
        s = 0
        if doc in lex:
            s += 1_000_000_000 // (60 + lex[doc])
        if doc in dense:
            s += 1_000_000_000 // (60 + dense[doc])
        return s

    expect = sorted({*lex, *dense}, key=lambda d: (-rrf(d), d))
    # b appears in both runs -> must fuse to the top despite rank-2 lexical
    assert expect[0] == "b"

    ldf = spark.createDataFrame(list(lex.items()), ["doc_key", "lex_rnk"])
    ddf = spark.createDataFrame(list(dense.items()), ["doc_key", "dense_rnk"])
    fused = (
        ldf.join(ddf, on="doc_key", how="full_outer")
        .select(
            "doc_key",
            (
                F.coalesce(
                    F.expr("CAST(1000000000 DIV (60 + lex_rnk) AS BIGINT)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr("CAST(1000000000 DIV (60 + dense_rnk) AS BIGINT)"),
                    F.lit(0),
                )
            ).alias("rrf_units"),
        )
        .orderBy(F.col("rrf_units").desc(), F.col("doc_key"))
        .collect()
    )
    assert [r.doc_key for r in fused] == expect
    for r in fused:
        assert r.rrf_units == rrf(r.doc_key)


# --------------------------------------------------------------------------
# CDC chunking
# --------------------------------------------------------------------------
def _cdc_chunks_py(s: str) -> list[str]:
    """Pure-python replica of the relational chunking: trailing-window
    rolling hash marks a boundary at the window's last char; a char
    belongs to chunk = #boundaries strictly before it."""
    n = len(s)
    codes = [ord(c) for c in s]
    bends = set()
    for p in range(_CDC_W - 1, n):  # 0-based window end
        h = sum(codes[p - (_CDC_W - 1) + k] * _CDC_P[k] for k in range(_CDC_W))
        if h % _CDC_M % _CDC_MOD == 0:
            bends.add(p)
    chunks, cur = [], []
    for p in range(n):
        cur.append(s[p])
        if p in bends:
            chunks.append("".join(cur))
            cur = []
    if cur:
        chunks.append("".join(cur))
    return chunks


def _cdc_chunks_spark(spark, s: str) -> list[str]:
    from pyspark.sql import Window

    df = spark.createDataFrame([(1, s)], ["doc_id", "text"])
    chars = df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        F.expr("CAST(ascii(substring(text, i, 1)) AS BIGINT)").alias("code"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    rolling = None
    for k in range(_CDC_W):
        lag_n = _CDC_W - 1 - k
        term = (
            F.lag("code", lag_n).over(w) if lag_n else F.col("code")
        ) * F.lit(_CDC_P[k])
        rolling = term if rolling is None else rolling + term
    bends = chars.withColumn(
        "bend",
        F.when((rolling % _CDC_M % _CDC_MOD) == 0, F.lit(1)).otherwise(F.lit(0)),
    )
    from pyspark.sql import Window as W2

    segs = bends.withColumn(
        "seg",
        F.coalesce(
            F.sum("bend").over(w.rowsBetween(W2.unboundedPreceding, -1)), F.lit(0)
        ),
    )
    spans = (
        segs.groupBy("seg")
        .agg(F.min("i").alias("a"), F.max("i").alias("b"))
        .orderBy("seg")
        .collect()
    )
    return [s[r.a - 1 : r.b] for r in spans]


def test_cdc_spark_chunking_matches_python_reference(spark):
    text = (
        "key agg row scan slow fast table value part hash value table part "
        "a row fast merge batch part value fast spark a a the lazy dog ran"
    )
    assert _cdc_chunks_spark(spark, text) == _cdc_chunks_py(text)


def test_cdc_chunks_reassemble_and_local_edit_is_contained():
    text = "the quick brown fox jumps over the lazy dog " * 8
    chunks = _cdc_chunks_py(text)
    assert "".join(chunks) == text
    # a middle edit must leave a majority of chunk hashes intact
    edited = text[:100] + "XXEDITXX" + text[110:]
    a, b = set(chunks), set(_cdc_chunks_py(edited))
    jacc = len(a & b) / len(a | b)
    assert jacc >= 0.5, f"CDC lost edit locality: jaccard {jacc:.2f}"


# --------------------------------------------------------------------------
# feature hashing
# --------------------------------------------------------------------------
def test_feature_hashing_buckets_and_signs(spark):
    toks = spark.createDataFrame(
        [(1, t) for t in ["alpha", "beta", "gamma", "alpha", "alpha"]],
        ["doc_id", "token"],
    )
    h = F.expr(
        "CAST(conv(substring(md5(concat('feat', token)), 1, 8), 16, 10) AS BIGINT)"
    )
    hashed = toks.select(
        "doc_id",
        ((h / 2).cast("long") % 64).alias("bucket"),
        F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    ).collect()
    import hashlib

    for r_spark, tok in zip(hashed, ["alpha", "beta", "gamma", "alpha", "alpha"]):
        h32 = int(hashlib.md5(f"feat{tok}".encode()).hexdigest()[:8], 16)
        assert r_spark.bucket == (h32 // 2) % 64
        assert r_spark.sgn == (1 if h32 % 2 == 0 else -1)
        assert 0 <= r_spark.bucket < 64


# --------------------------------------------------------------------------
# CUPED
# --------------------------------------------------------------------------
def test_cuped_theta_matches_float_reference(spark):
    # planted per-user (x, y) with known positive covariance
    data = [(u, 10 * u, 20 * u + (u % 3)) for u in range(1, 21)]
    df = spark.createDataFrame(data, ["user_id", "x", "y"])
    row = (
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_num"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("var_num"),
        )
        .withColumn(
            "theta_ppm",
            F.expr(
                "CAST(CASE WHEN cov_num < 0 THEN -1 ELSE 1 END"
                " * ((CAST(1000000 AS DECIMAL(38,0)) * abs(cov_num))"
                "    DIV CAST(var_num AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .collect()[0]
    )
    xs = [x for _, x, _ in data]
    ys = [y for _, _, y in data]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    var = sum((x - mx) ** 2 for x in xs)
    assert row.theta_ppm == pytest.approx(1_000_000 * cov / var, abs=1)
    assert row.theta_ppm > 0


def test_cuped_sign_decomposed_division_handles_negatives(spark):
    # anti-correlated covariate: theta must come out negative and agree
    # with floor-free truncation toward zero
    df = spark.createDataFrame(
        [(u, float(u), float(100 - 3 * u)) for u in range(1, 11)],
        ["user_id", "x", "y"],
    )
    row = (
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("long")
            .alias("cov_num"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("long")
            .alias("var_num"),
        )
        .withColumn(
            "theta_ppm",
            F.expr(
                "CAST(CASE WHEN cov_num < 0 THEN -1 ELSE 1 END"
                " * ((CAST(1000000 AS DECIMAL(38,0)) * abs(cov_num))"
                "    DIV CAST(var_num AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .collect()[0]
    )
    assert row.cov_num < 0
    # sign-decomposed truncation: -( (1e6*|cov|) // var ) exactly
    assert row.theta_ppm == -((1_000_000 * abs(row.cov_num)) // row.var_num)


# --------------------------------------------------------------------------
# survival risk table
# --------------------------------------------------------------------------
def test_survival_risk_table_properties(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["temporal_survival_hazard"](spark, SF_DIR).orderBy("dur_days").collect()
    assert rows, "risk table must not be empty"
    n_users = sum(r.n_at for r in rows)
    # n_risk at the smallest duration covers everyone; strictly decreasing
    assert rows[0].n_risk == n_users
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_risk == prev.n_risk - prev.n_at
    for r in rows:
        assert r.n_events + r.n_censored == r.n_at
        assert 0 <= r.hazard_ppm <= 1_000_000


# --------------------------------------------------------------------------
# CDC dedup-vs-corpus operator
# --------------------------------------------------------------------------
def test_cdc_dedup_vs_corpus_verdicts(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.cdc import (
        cdc_chunk_hashes,
        cdc_dedup_vs_corpus,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely unrelated payload content " * 10)],
        ["doc_id", "text"],
    )
    cset = cdc_chunk_hashes(corpus, "doc_id", "text")
    counts = cset.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    batch = spark.createDataFrame(
        [
            (10, base[:100] + "XXEDITXX" + base[110:]),  # near-dup of 1
            (11, "zzz entirely novel payload qqq " * 12),  # no match
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in cdc_dedup_vs_corpus(batch, cset, counts).collect()
    }
    assert rows[10].is_dup and rows[10].matched == 1
    assert rows[10].jaccard_ppm >= 250_000
    assert not rows[11].is_dup and rows[11].matched is None
    assert rows[11].n_shared == 0 and rows[11].jaccard_ppm == 0


# --------------------------------------------------------------------------
# personalized PageRank
# --------------------------------------------------------------------------
def test_ppr_mass_concentrates_near_seeds(spark):
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        pagerank_integer,
        personalized_pagerank_integer,
    )

    # two disjoint 3-cycles; seed only in the first
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    ranks = {
        r.node: r.rank_units
        for r in personalized_pagerank_integer(edges, seeds, n_iter=4).collect()
    }
    # the unseeded component gets EXACTLY zero mass
    assert ranks[10] == 0 and ranks[11] == 0 and ranks[12] == 0
    # seeded component carries all the (truncation-leaked) mass
    assert ranks[1] > 0 and ranks[2] > 0 and ranks[3] > 0
    assert 0 < ranks[1] + ranks[2] + ranks[3] <= 10**12
    # global PageRank on the same graph gives the far component mass —
    # the two operators measure different things
    globals_ = {
        r.node: r.rank_units for r in pagerank_integer(edges, n_iter=4).collect()
    }
    assert globals_[10] > 0


def test_ppr_rejects_empty_seeds(spark):
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        personalized_pagerank_integer,
    )

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    empty = spark.createDataFrame([], "node LONG")
    with pytest.raises(ValueError, match="seeds must be non-empty"):
        personalized_pagerank_integer(edges, empty)


def test_ppr_isolated_seed_keeps_base_mass(spark):
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        personalized_pagerank_integer,
    )

    # seed 99 has no edges at all: it must still appear with base mass
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["node"])
    ranks = {
        r.node: r.rank_units
        for r in personalized_pagerank_integer(edges, seeds, n_iter=2).collect()
    }
    assert ranks[99] > 0 and ranks[1] == 0 and ranks[2] == 0


# --------------------------------------------------------------------------
# packing efficiency audit
# --------------------------------------------------------------------------
def test_pack_efficiency_audit_properties(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["pack_efficiency_audit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # greedy never opens more bins than quotient closes late
        assert r.greedy_bins >= 1 and r.quotient_bins >= 1
        assert r.greedy_cap == 512 * r.greedy_bins
        # strict greedy: capacity covers the tokens (no doc exceeds 512
        # in this corpus), so waste is the exact padding fraction
        assert r.greedy_cap >= r.total_tokens
        assert r.waste_ppm == 1_000_000 * (r.greedy_cap - r.total_tokens) // r.greedy_cap
        assert 0 <= r.waste_ppm < 1_000_000


# --------------------------------------------------------------------------
# lexicon screen / JL projection / PCA power iteration
# --------------------------------------------------------------------------
def test_lexicon_screen_flag_logic(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["quality_lexicon_screen"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expect = (1_000_000 * r.n_hits // r.n_tokens >= 100_000) or (
            r.n_distinct_hits >= 3
        )
        assert r.flagged == expect
        assert r.hit_ppm == 1_000_000 * r.n_hits // r.n_tokens
        assert 0 <= r.n_distinct_hits <= 4  # lexicon has 4 terms


def test_jl_projection_is_linear_and_sign_exact(spark):
    import hashlib

    # replicate one sign cell from the md5 ring and check a known identity:
    # proj(v + w) == proj(v) + proj(w) holds trivially for a linear sign
    # fold — verify the SIGN derivation matches python md5
    for j, d in [(1, 1), (7, 33), (16, 64)]:
        h32 = int(hashlib.md5(f"jl{j}_{d}".encode()).hexdigest()[:8], 16)
        s_py = 1 if h32 % 2 == 0 else -1
        s_spark = spark.sql(
            f"SELECT CASE WHEN CAST(conv(substring(md5(concat('jl', '{j}', '_',"
            f" '{d}')), 1, 8), 16, 10) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s"
        ).collect()[0].s
        assert s_spark == s_py


def test_jl_recall_audit_pins_the_negative_result(spark):
    """The JL audit's measured value IS the finding: on this
    near-isotropic corpus a data-oblivious ±1 projection to 16 dims
    destroys top-5 neighborhoods (distance concentration) — the measured
    case for trained quantizers.  Pin the result so a silent change to
    the projection (or corpus) that flips the conclusion fails loudly."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["embedding_jl_recall"](spark, SF_DIR).collect()
    assert len(rows) == 10
    total_exact = sum(r.n_exact for r in rows)
    total_overlap = sum(r.n_overlap for r in rows)
    assert total_exact == 50  # 10 queries x top-5
    # the documented negative result: well under half survives
    assert total_overlap < 25, (
        f"JL@16 recall unexpectedly high ({total_overlap}/50) — the "
        "negative-result framing in the docstring no longer holds"
    )
    for r in rows:
        assert 0 <= r.n_overlap <= min(r.n_exact, r.n_proj)


def test_isotropy_probe_output_invariants(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["embedding_isotropy_probe"](spark, SF_DIR).collect()
    assert len(rows) == 64
    vmax = max(abs(r.v_units) for r in rows)
    assert vmax == 1_000_000, "L-inf normalization must peg the max at 1e6"
    lam = {r.lambda_units for r in rows}
    evr = {r.evr_ppm for r in rows}
    assert len(lam) == 1 and len(evr) == 1
    assert 0 < evr.pop() <= 1_000_000
    assert lam.pop() > 0


def test_isotropy_probe_rayleigh_bound_and_flat_spectrum(spark):
    """The probe's claims, verified against numpy: (1) the Rayleigh value
    is a valid LOWER bound on the true top eigenvalue at any iteration
    count; (2) it exceeds the mean eigenvalue (the iterate is biased
    toward the top of the spectrum); (3) the corpus spectrum is in fact
    FLAT (λ2/λ1 > 0.9) — the measured premise of the isotropy framing
    and of the JL negative result."""
    import numpy as np

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import quantize_np

    em = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("embedding")
        .collect()
    )
    X = np.stack([quantize_np(np.array(r.embedding, dtype=np.float64)) for r in em])
    G = X.T @ X
    w, _ = np.linalg.eigh(G)
    rows = QUERIES["embedding_isotropy_probe"](spark, SF_DIR).collect()
    lam = rows[0].lambda_units
    mean_eig = float(np.trace(G)) / 64
    assert lam <= w[-1] * (1 + 1e-9), "Rayleigh must lower-bound the top eigenvalue"
    assert lam > mean_eig, "the iterate must beat the mean eigenvalue"
    assert w[-2] / w[-1] > 0.9, (
        "spectrum no longer flat — revisit the isotropy framing "
        f"(l2/l1 = {w[-2] / w[-1]:.3f})"
    )


# --------------------------------------------------------------------------
# Markov stationary / manifest skipping / Welch t²
# --------------------------------------------------------------------------
def test_markov_stationary_converged_and_normalized(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["agg_markov_stationary"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    total_ppm = sum(r.p_ppm for r in rows)
    # ppm shares sum to ~1e6 (truncation may shed a few ppm)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    for r in rows:
        assert r.p_units > 0 and r.p_ppm > 0


def test_markov_stationary_is_a_fixed_point(spark):
    """One more distribution step from the reported p must land within a
    few units per state — the convergence claim, checked directly."""
    from pyspark.sql import Window

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, SF_DIR, "events")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    trans = {
        (r.from_type, r.to_type): r.n
        for r in seq.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    row_tot = {}
    for (f, _), n in trans.items():
        row_tot[f] = row_tot.get(f, 0) + n
    p = {r.state: r.p_units for r in QUERIES["agg_markov_stationary"](spark, SF_DIR).collect()}
    nxt = dict.fromkeys(p, 0)
    for (f, t), n in trans.items():
        if f in p and t in nxt:
            nxt[t] += (p[f] * n) // row_tot[f]
    for s in p:
        # fixed point to within truncation noise, relative to ~2e8 units
        assert abs(nxt[s] - p[s]) <= max(5, p[s] // 1000), (s, p[s], nxt[s])


def test_markov_stationary_sink_state_matches_oracle(spark, tmp_path):
    """A chain with a SINK event_type (appears only as to_type) must give
    the same rows from the driver mirror and the DuckDB oracle: the sink
    receives inflow each step, sheds it the next, and appears in the
    final p8 rows with its step-8 inflow — the divergence the r7 ADVICE
    flagged when the old matrix loop dropped sink transitions."""
    import datetime

    import duckdb

    from cell_kn_mvp_etl_ontologies_spark.catalog import ORACLES, QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1 cycles a<->b with occasional hops into sink state 'z'
    for u, seq in [
        (1, ["a", "b", "a", "b", "z"]),
        (2, ["b", "a", "b", "a", "a", "z"]),
        (3, ["a", "a", "b", "b", "a"]),
    ]:
        for k, et in enumerate(seq):
            eid += 1
            rows.append((eid, base + datetime.timedelta(minutes=k), u, et, 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        (r.state, r.p_units, r.p_ppm)
        for r in QUERIES["agg_markov_stationary"](spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    want = {tuple(r) for r in con.sql(ORACLES["agg_markov_stationary"]).fetchall()}
    assert got == want
    assert any(s == "z" for s, _, _ in got), "sink state must appear in p8"


def test_manifest_skipping_prunes_and_matches(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    r = QUERIES["sink_manifest_skipping"](spark, SF_DIR).collect()[0]
    assert r.n_files_selected < r.n_files_total, "no pruning happened"
    assert r.n_rows_match <= r.n_rows_scanned
    # every doc in [100,150] exists in the sf0.001 table (doc_ids 0..499)
    assert r.n_rows_match == 51


def test_welch_t2_matches_float_reference(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    r = QUERIES["eval_welch_ttest"](spark, SF_DIR).collect()[0]
    n0, n1 = r.n0, r.n1
    m0, m1 = r.s0_cents / n0, r.s1_cents / n1
    v0 = (r.q0 - n0 * m0 * m0) / (n0 - 1)
    v1 = (r.q1 - n1 * m1 * m1) / (n1 - 1)
    t2 = (m1 - m0) ** 2 / (v0 / n0 + v1 / n1)
    assert r.t2_ppm == pytest.approx(t2 * 1_000_000, rel=1e-6, abs=2)
    assert r.var0_num >= 0 and r.var1_num >= 0


# --------------------------------------------------------------------------
# Bayes shrinkage / dup-flow matrix / reco diversity
# --------------------------------------------------------------------------
def test_bayes_shrinkage_pulls_toward_prior(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["agg_bayes_shrunk_rate"](spark, SF_DIR).collect()
    assert rows
    prior_ppm = 1_000_000 * 1 // 20  # Beta(1,19) prior mean = 5%
    for r in rows:
        assert r.shrunk_ppm == 1_000_000 * (r.n_buy + 1) // (r.n_view + 20)
        if r.raw_ppm is not None and r.n_view > 0:
            # shrunk estimate lies between the raw rate and the prior
            lo, hi = sorted((r.raw_ppm, prior_ppm))
            assert lo - 1 <= r.shrunk_ppm <= hi + 1, (r.raw_ppm, r.shrunk_ppm)


def test_cross_source_dup_matrix_is_planted_mirror_only(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["quality_cross_source_dup"](spark, SF_DIR).collect()
    assert rows, "planted mirror pairs must surface"
    # this corpus has no natural exact dups: every pair involves 'mirror'
    for r in rows:
        assert "mirror" in (r.source_a, r.source_b)
        assert r.source_a <= r.source_b  # canonicalized unordered pair
        assert r.n_pairs >= 1
    assert sum(r.n_pairs for r in rows) == 20  # 20 planted copies


def test_reco_diversity_bounds(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["eval_reco_diversity"](spark, SF_DIR).collect()
    assert len(rows) == 10
    cov = {r.coverage_ppm for r in rows}
    assert len(cov) == 1  # coverage is global, repeated per row
    for r in rows:
        assert 1 <= r.n_labels <= r.k == 5
        assert r.label_diversity_ppm == 1_000_000 * r.n_labels // r.k
        assert 0 < r.n_distinct_items <= 50  # at most |Q|*k distinct


# --------------------------------------------------------------------------
# spatial grid join / weighted SSSP / regression metrics
# --------------------------------------------------------------------------
def test_spatial_grid_join_matches_brute_force(spark):
    import hashlib

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    # sf0.01: 150 users -> a meaningful pair set (sf0.001's ~15 users
    # yield ZERO radius-50 pairs in the 1000x1000 space — an empty==empty
    # comparison would vacuously pass)
    sf = "/root/testdata/sf0.01"
    users = [
        r.user_id
        for r in load_table(spark, sf, "events").select("user_id").distinct().collect()
    ]

    def coord(salt, u):
        return int(hashlib.md5(f"{salt}{u}".encode()).hexdigest()[:8], 16) % 1000

    pts = {u: (coord("x", u), coord("y", u)) for u in users}
    brute = {
        (a, b, (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2)
        for i, a in enumerate(users)
        for b in users[i + 1 :]
        if a < b
        and (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2 <= 2500
    } | {
        (b, a, (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2)
        for i, a in enumerate(users)
        for b in users[i + 1 :]
        if a > b
        and (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2 <= 2500
    }
    brute = {(min(a, b), max(a, b), d) for a, b, d in brute}
    got = {
        (r.a, r.b, r.d2)
        for r in QUERIES["join_spatial_grid"](spark, sf).collect()
    }
    assert got and got == brute, "grid+neighbor probe must be exactly the brute-force set"


def test_sssp_weighted_matches_dijkstra(spark):
    import heapq

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_orderkey") % 11 == 0)
        .select(
            (F.col("l_orderkey") % 300).alias("src"),
            (F.col("l_partkey") % 300).alias("dst"),
            (1 + F.col("l_linenumber") % 5).alias("w"),
        )
        .distinct()
        .collect()
    )
    adj = {}
    for r in li:
        adj.setdefault(r.src, []).append((r.dst, r.w))
    # Dijkstra restricted to paths of <= 6 edges == Bellman-Ford(6)
    INF = float("inf")
    best = {(0, 0): 0}
    dist6 = {0: 0}
    frontier = {0: 0}
    for _ in range(6):
        nxt = {}
        for node, d in frontier.items():
            for t, w in adj.get(node, []):
                nd = d + w
                if nd < dist6.get(t, INF):
                    dist6[t] = nd
                    nxt[t] = nd
                elif nd < nxt.get(t, INF) and nd == dist6.get(t):
                    nxt[t] = nd
        # frontier = nodes improved this round
        frontier = {t: dist6[t] for t in nxt}
        if not frontier:
            break
    got = {r.node: r.dist for r in QUERIES["graph_sssp_weighted"](spark, SF_DIR).collect()}
    for node, d in dist6.items():
        assert got.get(node) == d, (node, d, got.get(node))
    # nodes never reached within 6 relaxations must be absent
    assert set(got) == set(dist6)


def test_regression_metrics_identities(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["eval_regression_metrics"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.sse >= 0 and r.sst >= 0 and r.sae >= 0
        if r.r2_ppm is not None:
            assert r.r2_ppm == 1_000_000 - 1_000_000 * r.sse // r.sst
            assert r.r2_ppm <= 1_000_000


def test_cdc_arrow_twin_matches_relational(spark):
    """The production mapInPandas chunker and the relational gate form
    must emit the IDENTICAL (id, chunk_hash) set — same boundary rule,
    same md5 — including payloads shorter than the hash window, EMPTY
    payloads (zero chunks in both forms, no filter sidestep), and
    non-ASCII text where codepoint codes (Spark ascii() semantics) and
    UTF-8 byte codes would diverge."""
    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.cdc import (
        cdc_chunk_hashes,
        cdc_chunk_hashes_arrow,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    short = spark.createDataFrame(
        [
            (900001, "tiny"),
            (900002, "exactly8"),
            (900003, ""),
            # non-ASCII: accents (BMP), currency, CJK, and an astral
            # emoji — ascii()/ord() give full codepoints in all engines
            (900004, "héllo wörld détecteur — çà et là, naïveté garantie. " * 8),
            (900005, "価格は€1,234です。データ重複排除のテスト文字列。" * 10),
            (900006, "mixed ascii and 😀 emoji 🚀 payload with astral chars " * 6),
        ],
        ["doc_id", "text"],
    )
    corpus = docs.unionByName(short)
    rel = {(r.doc_id, r.ch) for r in cdc_chunk_hashes(corpus, "doc_id", "text").collect()}
    arw = {
        (r.doc_id, r.ch)
        for r in cdc_chunk_hashes_arrow(corpus, "doc_id", "text").collect()
    }
    assert rel == arw and len(rel) > 100
    # empty payload emits no chunks in either form
    assert not any(i == 900003 for i, _ in rel)
    # the non-ASCII payloads actually chunked (boundary rule fired)
    assert any(i == 900004 for i, _ in rel) and any(i == 900005 for i, _ in rel)


# --------------------------------------------------------------------------
# token budget mix / parity audit / decontamination filter
# --------------------------------------------------------------------------
def test_token_budget_mix_rates_and_membership(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["sample_token_budget_mix"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.rate_ppm <= 1_000_000
        assert 0 <= r.n_kept <= r.n_docs
        if r.rate_ppm == 1_000_000:
            assert r.n_kept == r.n_docs, "under-budget source must keep all"


def test_parity_audit_flags_below_80pct(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["quality_parity_audit"](spark, SF_DIR).collect()
    assert rows
    max_rate = max(r.rate_ppm for r in rows)
    for r in rows:
        assert r.parity_ppm == 1_000_000 * r.rate_ppm // max_rate
        assert r.flagged_80pct == (r.parity_ppm < 800_000)
    # the max-rate group itself can never be flagged
    top = [r for r in rows if r.rate_ppm == max_rate]
    assert all(not r.flagged_80pct for r in top)


def test_decontamination_census_is_consistent(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["contamination_filter_train"](spark, SF_DIR).collect()
    assert rows
    total_dropped = sum(r.n_dropped for r in rows)
    assert total_dropped > 0, "planted every-7th overlap must drop docs"
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_train
        assert r.drop_ppm == 1_000_000 * r.n_dropped // r.n_train


# --------------------------------------------------------------------------
# bootstrap CI / two-sample KS
# --------------------------------------------------------------------------
def test_bootstrap_ci_brackets_the_point_estimate(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    r = QUERIES["eval_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert r.lo_cents <= r.p05_cents <= r.p50_cents <= r.p95_cents <= r.hi_cents
    # the resampled median should be near the true mean (resamples of the
    # same population) — within the bootstrap envelope by construction
    per_user = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("y"))
        .agg(F.expr("CAST(SUM(y) DIV COUNT(*) AS BIGINT)").alias("m"))
        .collect()[0]
        .m
    )
    assert r.lo_cents <= per_user <= r.hi_cents


def test_bootstrap_is_rerun_identical(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    a = QUERIES["eval_bootstrap_ci"](spark, SF_DIR).collect()[0]
    b = QUERIES["eval_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert a == b, "deterministic bootstrap must reproduce exactly"


def test_ks_two_sample_matches_python_reference(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("y"))
        .collect()
    )
    a = sorted(r.y for r in rows if r.user_id % 2 == 0)
    b = sorted(r.y for r in rows if r.user_id % 2 == 1)
    support = sorted(set(a) | set(b))
    import bisect

    d_num = max(
        abs(len(b) * bisect.bisect_right(a, v) - len(a) * bisect.bisect_right(b, v))
        for v in support
    )
    r = QUERIES["eval_ks_two_sample"](spark, SF_DIR).collect()[0]
    assert (r.n0, r.n1) == (len(a), len(b))
    assert r.d_num == d_num
    assert r.d_ppm == 1_000_000 * d_num // (len(a) * len(b))


# --------------------------------------------------------------------------
# Mann-Kendall / winsorized mean
# --------------------------------------------------------------------------
def test_mann_kendall_matches_python_reference(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            "event_type",
            F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 86400").alias("day"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.cents))
    got = {r.event_type: r for r in QUERIES["temporal_mann_kendall"](spark, SF_DIR).collect()}
    for et, pts in series.items():
        pts.sort()
        s = sum(
            (1 if pts[j][1] > pts[i][1] else -1 if pts[j][1] < pts[i][1] else 0)
            for i in range(len(pts))
            for j in range(i + 1, len(pts))
        )
        n_pairs = len(pts) * (len(pts) - 1) // 2
        r = got[et]
        assert (r.n_days, r.s, r.n_pairs) == (len(pts), s, n_pairs)
        sign = -1 if s < 0 else 1
        assert r.tau_ppm == sign * (1_000_000 * abs(s) // n_pairs)


def test_winsorized_mean_bounds_and_identity(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["agg_winsorized_mean"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.lo_cut <= r.hi_cut
        # winsorized mean must sit inside the cutoffs
        assert r.lo_cut <= r.wmean <= r.hi_cut
        assert r.wsum // r.n == r.wmean


def test_calibration_ece_summarizes_the_bins(spark):
    from cell_kn_mvp_etl_ontologies_spark import catalog

    catalog.load_all()  # the bins query lives in frontier3
    QUERIES = catalog.QUERIES
    bins = QUERIES["eval_calibration_bins"](spark, SF_DIR).collect()
    r = QUERIES["eval_calibration_ece"](spark, SF_DIR).collect()[0]
    n_total = sum(b.n for b in bins)
    ece_num = sum(b.n * abs(b.observed_ppm - b.mean_score_ppm) for b in bins)
    mce = max(abs(b.observed_ppm - b.mean_score_ppm) for b in bins)
    assert (r.n_total, r.n_bins) == (n_total, len(bins))
    assert r.ece_num == ece_num
    assert r.ece_ppm == ece_num // n_total
    assert r.mce_ppm == mce >= r.ece_ppm


def test_knn_probe_census_properties(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = QUERIES["eval_knn_probe"](spark, SF_DIR).collect()
    n_vecs = (
        load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 200).count()
    )
    # every vector gets exactly one 1-NN verdict
    assert sum(r.n for r in rows) == n_vecs
    acc = sum(r.n for r in rows if r.true_label == r.predicted_label)
    assert 0 <= acc <= n_vecs


def test_theil_sen_matches_python_reference(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            "event_type",
            F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 86400").alias("day"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.cents))
    got = {r.event_type: r for r in QUERIES["temporal_theil_sen"](spark, SF_DIR).collect()}
    for et, pts in series.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                d = pts[j][1] - pts[i][1]
                sign = -1 if d < 0 else 1
                slopes.append(sign * (100 * abs(d) // (pts[j][0] - pts[i][0])))
        slopes.sort()
        r = got[et]
        assert r.n_pairs == len(slopes)
        assert r.slope_cc_median == slopes[(len(slopes) + 1) // 2 - 1]
        assert r.slope_cc_min == slopes[0] and r.slope_cc_max == slopes[-1]


def test_cohens_kappa_matches_float_reference(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    r = QUERIES["eval_cohens_kappa"](spark, SF_DIR).collect()[0]
    n = r.n
    assert r.n11 + r.n10 + r.n01 + r.n00 == n
    po = (r.n11 + r.n00) / n
    pe = ((r.n11 + r.n10) * (r.n11 + r.n01) + (r.n01 + r.n00) * (r.n10 + r.n00)) / (
        n * n
    )
    kappa = (po - pe) / (1 - pe)
    assert r.kappa_ppm == pytest.approx(kappa * 1_000_000, abs=2)
    assert r.po_ppm == 1_000_000 * (r.n11 + r.n00) // n


def test_cdc_cap_preserves_planted_recall_and_cuts_candidates(spark):
    """The hot-chunk cap (cdc_census_cap, VERDICT r10 #5) must (a) drop the
    planted boilerplate-footer chunks from the census, collapsing the
    candidate-pair volume, and (b) preserve every planted middle-edit
    near-dup pair — template mass changes VOLUME, not recall."""
    from pyspark.sql import functions as F

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier4 import (
        _CDC_FOOTER,
        cdc_chunks_capped_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.operators.cdc import (
        cdc_census_cap,
        cdc_chunk_hashes,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = {(r.a, r.b) for r in cdc_chunks_capped_q(spark, sf_dir).collect()}
    # every planted (doc, doc+10000) middle-edit pair is recovered
    planted = {(i, i + 10000) for i in range(15)}
    assert planted <= out

    # the cap itself: footer chunks are hot and vanish; pair volume drops
    docs = spark.createDataFrame(
        [(i, f"payload body {i} with distinct content {i*7}") for i in range(30)],
        "doc_id long, text string",
    ).withColumn("text", F.concat(F.col("text"), F.lit(_CDC_FOOTER)))
    cset = cdc_chunk_hashes(docs, "doc_id", "text")
    freq = cset.groupBy("ch").agg(F.count(F.lit(1)).alias("f"))
    assert freq.filter(F.col("f") > 8).count() > 0  # hot chunks exist
    capped = cdc_census_cap(cset, "doc_id", max_freq=8)
    n_unc = (
        cset.alias("x")
        .join(cset.alias("y"), on="ch")
        .filter(F.col("y.doc_id") > F.col("x.doc_id"))
        .count()
    )
    n_cap = (
        capped.alias("x")
        .join(capped.alias("y"), on="ch")
        .filter(F.col("y.doc_id") > F.col("x.doc_id"))
        .count()
    )
    assert n_cap < n_unc / 4  # the footer's M^2/2 mass is gone
