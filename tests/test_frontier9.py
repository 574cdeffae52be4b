"""Round-12 extension batch (catalog/frontier9.py): property pins beyond
the DuckDB hash gate — the semantic claims each docstring makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
    _WEIGHTED_DF_CAP,
    dedup_minhash_weighted_capped_q,
    similarity_range_search_routed_q,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_weighted_capped_keeps_planted_dups_and_audits(spark):
    """The df-capped weighted refine still recovers every planted
    full-prefix duplicate at jw = 1e6 (distinctive shingles survive any
    cap ≥ their df), the audit row reports a non-degenerate cap (some
    hot shingles dropped, not all), and every pair row's jw stays in
    (300000, 1e6]."""
    rows = dedup_minhash_weighted_capped_q(spark, SF01).collect()
    audit = [r for r in rows if r.a == -1 and r.b == -1]
    pairs = [r for r in rows if r.a >= 0]
    assert len(audit) == 1
    n_hot, hot_ppm = audit[0].min_sum, audit[0].jw_ppm
    assert 0 < n_hot, "cap must drop SOMETHING at gate scale or it's vacuous"
    assert 0 < hot_ppm < 500_000, "cap must not drop most of the census"
    planted = {(r.a, r.a + 10000) for r in pairs if r.b == r.a + 10000}
    assert planted == {(i, i + 10000) for i in range(10)}
    for r in pairs:
        if r.b == r.a + 10000 and r.a < 10:
            assert r.jw_ppm == 1_000_000
        assert 300_000 <= r.jw_ppm <= 1_000_000


def test_weighted_cap_reduces_candidates(spark):
    """The df cap measurably shrinks the shared-shingle join's candidate
    volume on the gate corpus (the quadratic guard is live, not
    decorative): count pairs sharing >= 1 shingle with and without the
    cap."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import weighted_corpus

    corpus = weighted_corpus(spark, SF01)
    sh = corpus.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 4, 0)),"
                " i -> substring(text, i, 5))"
            )
        ).alias("sh"),
    ).distinct()
    dfc = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))

    def n_pairs(census):
        x = census.select(F.col("id").alias("a"), "sh")
        y = census.select(F.col("id").alias("b"), "sh")
        return (
            x.join(y, on="sh")
            .filter(F.col("b") > F.col("a"))
            .select("a", "b")
            .distinct()
            .count()
        )

    uncapped = n_pairs(sh)
    capped = n_pairs(
        sh.join(dfc.filter(F.col("df") <= _WEIGHTED_DF_CAP).select("sh"), on="sh")
    )
    assert capped < uncapped, (capped, uncapped)


def test_range_routed_identity_at_full_probe(spark):
    """At nprobe = n_cells the routed radius search is bit-identical to
    the brute gate tier — the routed-identity proof backing the shared
    oracle constant."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import (
        similarity_range_search_q,
    )

    brute = {tuple(r) for r in similarity_range_search_q(spark, SF).collect()}
    routed = {tuple(r) for r in similarity_range_search_routed_q(spark, SF).collect()}
    assert routed == brute and len(brute) > 0


def test_range_routed_pruned_is_subset_with_structural_recall(spark):
    """At nprobe = 1 the routed output is a SUBSET of brute (routing can
    only prune, never invent) and every planted exact copy is still
    recovered: an identical vector quantizes identically, hence assigns
    to its source's cell."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import (
        range_search_em,
        similarity_range_search_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        range_search_routed,
    )

    em = range_search_em(spark, SF)
    q = em.filter(F.col("vec_id") < 8)
    pruned = {
        (r.q_id, r.t_id)
        for r in range_search_routed(em, q, n_cells=4, nprobe=1).collect()
    }
    brute = {
        (r.q_id, r.t_id) for r in similarity_range_search_q(spark, SF).collect()
    }
    assert pruned <= brute
    # planted copies: vec_id < 5 duplicated at vec_id + 10000, cos = 1
    for i in range(5):
        assert (i, i + 10000) in pruned, i


def test_pettitt_matches_brute_force(spark):
    """U_t from the pair-frame identity equals the textbook O(n²)
    definition U_t = Σ_{i≤t} Σ_{j>t} sgn(y_j − y_i) recomputed in Python
    on the collected daily series, and is_peak marks exactly the rows
    with |U| = max|U|."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        temporal_changepoint_pettitt_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = {r.day: r for r in temporal_changepoint_pettitt_q(spark, SF01).collect()}
    daily = sorted(
        load_table(spark, SF01, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .count()
        .collect(),
        key=lambda r: r.day,
    )
    ys = [r["count"] for r in daily]
    days = [r.day.strftime("%Y-%m-%d") for r in daily]
    n = len(ys)
    us = {}
    for t in range(n):
        u = 0
        for i in range(t + 1):
            for j in range(t + 1, n):
                u += (ys[j] > ys[i]) - (ys[j] < ys[i])
        us[days[t]] = u
    assert {d: r.u_t for d, r in rows.items()} == us
    kmax = max(abs(u) for u in us.values())
    for d, r in rows.items():
        assert r.is_peak == (abs(us[d]) == kmax), d


def test_drawdown_invariants_and_stream_bundling(spark, tmp_path, monkeypatch):
    """Drawdown is non-negative and bounded by the peak-minus-minimum
    envelope, and the IVM twin equals the batch row over a REAL 3-batch
    id-interleaved split (events of one user arrive across batches in
    non-chronological bundles — the daily census must fold regardless)."""
    import glob as _glob
    import shutil

    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in QUERIES["temporal_max_drawdown"](spark, sf).collect()}
    for r in batch:
        _, n_days, peak_c, dd = r
        assert dd >= 0 and n_days >= 1

    d = tmp_path / "split_sf"
    d.mkdir()
    events = spark.read.parquet(f"{sf}/events.parquet")
    names = {0: "", 1: "_1", 2: "_2"}
    for i in range(3):
        tmp_out = str(d / f"__tmp_events_{i}")
        events.filter(F.col("event_id") % 3 == i).repartition(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        part = _glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.move(part, str(d / f"events{names[i]}.parquet"))
        shutil.rmtree(tmp_out, ignore_errors=True)

    orig = streaming_mod.read_events_stream
    monkeypatch.setattr(
        streaming_mod,
        "read_events_stream",
        lambda sp, sd: orig(sp, sd, max_files_per_trigger=1),
    )
    stream = {
        tuple(r) for r in QUERIES["stream_drawdown_maintain"](spark, str(d)).collect()
    }
    assert stream == batch and len(batch) > 0


def test_bleu_matches_python_recompute(spark):
    """Corpus-level clipped matches/totals equal a plain Python recompute
    over the same candidate/reference pairs."""
    from collections import Counter

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        eval_bleu_ngram_precision_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    got = {r.n: r for r in eval_bleu_ngram_precision_q(spark, SF01).collect()}
    docs = (
        load_table(spark, SF01, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .collect()
    )
    want = {1: [0, 0], 2: [0, 0]}
    for r in docs:
        cand = r.text[:200].lower().split()
        ref = r.text[10:210].lower().split()
        for n in (1, 2):
            cg = Counter(tuple(cand[i : i + n]) for i in range(len(cand) - n + 1))
            rg = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
            want[n][0] += sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            want[n][1] += sum(cg.values())
    for n in (1, 2):
        assert got[n].clipped_matches == want[n][0], n
        assert got[n].total_ngrams == want[n][1], n
        assert 0 < got[n].precision_ppm < 1_000_000


def test_functional_dependency_control_rows(spark):
    """The PK control FD holds (0 violations) and the spurious FD fails
    (violations > 0, max fanout > 1)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        quality_functional_dependency_q,
    )

    rows = {r.fd: r for r in quality_functional_dependency_q(spark, SF01).collect()}
    ok = rows["o_orderkey->o_custkey"]
    assert ok.n_violating_lhs == 0 and ok.violation_ppm == 0 and ok.max_rhs_per_lhs == 1
    bad = rows["o_custkey->o_orderpriority"]
    assert bad.n_violating_lhs > 0 and bad.max_rhs_per_lhs > 1


def test_uniqueness_profile_ends(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        quality_uniqueness_profile_q,
    )

    rows = {r.column_name: r for r in quality_uniqueness_profile_q(spark, SF01).collect()}
    assert rows["o_orderkey"].is_unique and rows["o_orderkey"].duplication_ppm == 0
    assert not rows["o_orderstatus"].is_unique
    assert rows["o_orderstatus"].n_distinct <= 3


def test_lpt_python_replay_and_balance(spark):
    """The Arrow LPT assignment replays exactly in Python, uses at most
    K bins, and satisfies the greedy balance property: no bin could give
    its LAST-ASSIGNED item to a lighter bin and reduce the makespan
    (equivalently max_load − min_load ≤ max item size assigned)."""
    from collections import defaultdict

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        _LPT_BINS,
        shard_assign_lpt_q,
    )

    rows = shard_assign_lpt_q(spark, SF01).collect()
    by_grp = defaultdict(list)
    for r in rows:
        by_grp[r.grp].append(r)
    for grp, items in by_grp.items():
        items.sort(key=lambda r: (-r.tokens, r.doc_id))
        loads = [0] * _LPT_BINS
        for r in items:
            k = min(range(_LPT_BINS), key=lambda i: (loads[i], i))
            assert r.bin == k + 1, (grp, r.doc_id)
            loads[k] += r.tokens
        assert max(loads) - min(loads) <= max(r.tokens for r in items)


def test_vocab_coverage_bounds(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        text_vocab_coverage_q,
    )

    r = text_vocab_coverage_q(spark, SF01).collect()[0]
    assert 0 < r.covered_tokens <= r.held_tokens
    assert 0 < r.coverage_ppm < 1_000_000
    assert r.oov_types > 0


def test_metadata_profile_mismatch_is_planted_drift(spark):
    """n_meta_mismatch equals exactly the planted stale-metadata set
    (every 7th doc re-encoded +1 2-byte char), recomputed directly."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        multimodal_metadata_profile_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    got = {r.source: r for r in multimodal_metadata_profile_q(spark, SF01).collect()}
    # the operator PLANTS the drift (every 7th payload re-encoded with one
    # appended 2-byte char, metadata stale) — recompute the same plant
    want = {
        r.source: r.m
        for r in load_table(spark, SF01, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0)
            ).alias("m")
        )
        .collect()
    }
    assert {s: r.n_meta_mismatch for s, r in got.items()} == want
    assert sum(want.values()) > 0, "the planted drift must be visible"


def test_boilerplate_census_matches_cap_semantics(spark):
    """Every reported gram really is shared by >= 50 documents (recomputed
    from the raw census) and df_ppm is exact integer DIV."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        text_boilerplate_census_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = text_boilerplate_census_q(spark, SF01).collect()
    assert rows, "gate corpus must surface some boilerplate"
    n_docs = load_table(spark, SF01, "documents").count()
    for r in rows:
        assert r.df >= 50
        assert r.df_ppm == 1_000_000 * r.df // n_docs
