"""Round-14 extension batch (catalog/frontier11.py): property pins beyond
the DuckDB hash gate — the semantic claims each docstring makes."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog.frontier11 import (
    _AUDIO_W,
    _SEG_W,
    dedup_segment_boundary_audit_q,
    eval_precision_recall_hits_q,
    eval_bleu_parts_q,
    eval_meteor_parts_q,
    multimodal_audio_energy_q,
    stream_bleu_maintain_q,
    stream_ks_maintain_q,
)
from cell_kn_mvp_etl_ontologies_spark.io import load_table

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _pairs_py(spark, sf_dir):
    """Python replay of the BLEU/METEOR pair fixture."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .collect()
    )
    out = []
    for r in docs:
        cand = [t for t in r.text[:200].lower().split() if t]
        ref = [t for t in r.text[10:210].lower().split() if t]
        out.append((r.doc_id, cand, ref))
    return out


def test_bleu_parts_match_python_recompute(spark):
    """Every gated BLEU part — per-n clipped matches, candidate totals,
    and the two corpus length sums — equals a Counter-based recompute."""
    pairs = _pairs_py(spark, SF)
    exp = {n: [0, 0] for n in range(1, 5)}
    clen = sum(len(c) for _, c, _ in pairs)
    rlen = sum(len(r) for _, _, r in pairs)
    for _, cand, ref in pairs:
        for n in range(1, 5):
            cg = Counter(
                " ".join(cand[i : i + n]) for i in range(len(cand) - n + 1)
            )
            rg = Counter(
                " ".join(ref[i : i + n]) for i in range(len(ref) - n + 1)
            )
            exp[n][0] += sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            exp[n][1] += sum(cg.values())
    rows = {r.n: r for r in eval_bleu_parts_q(spark, SF).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for n in range(1, 5):
        assert rows[n].clipped_matches == exp[n][0]
        assert rows[n].total_cand == exp[n][1]
        assert rows[n].cand_len_total == clen
        assert rows[n].ref_len_total == rlen
        assert rows[n].bp_applies == (clen < rlen)
        # clipping can never exceed the candidate total
        assert rows[n].clipped_matches <= rows[n].total_cand


def test_bleu_precisions_decrease_in_n(spark):
    """Higher-order precisions are (weakly) below unigram precision on
    any real corpus — the reason BLEU geometric-means them."""
    rows = {r.n: r for r in eval_bleu_parts_q(spark, SF01).collect()}
    assert rows[1].precision_ppm >= rows[2].precision_ppm >= rows[4].precision_ppm


def test_stream_bleu_equals_batch(spark):
    batch = {tuple(r) for r in eval_bleu_parts_q(spark, SF).collect()}
    stream = {tuple(r) for r in stream_bleu_maintain_q(spark, SF).collect()}
    assert batch == stream


def test_meteor_parts_match_python_recompute(spark):
    """m, chunks, and the two rational faces against a per-doc replay of
    the occurrence-index alignment and candidate-run chunking."""
    pairs = _pairs_py(spark, SF)
    rows = {r.doc_id: r for r in eval_meteor_parts_q(spark, SF).collect()}
    assert len(rows) == len(pairs)
    for doc_id, cand, ref in pairs:
        rc = Counter(ref)
        seen: Counter = Counter()
        matched = []
        for tok in cand:
            seen[tok] += 1
            matched.append(seen[tok] <= rc.get(tok, 0))
        m = sum(matched)
        chunks = sum(
            1
            for i, mt in enumerate(matched)
            if mt and (i == 0 or not matched[i - 1])
        )
        r = rows[doc_id]
        assert (r.m, r.chunks, r.n_cand, r.n_ref) == (
            m,
            chunks,
            len(cand),
            len(ref),
        )
        assert r.chunks <= r.m  # runs can't outnumber their members
        if m:
            assert r.f_mean_ppm == 10000000 * m // (len(cand) + 9 * len(ref))
            assert r.frag_penalty_ppm == 1000000 * chunks**3 // (2 * m**3)
        else:
            assert r.frag_penalty_ppm is None


def test_precision_recall_hit_rows_consistent(spark):
    """Hit rows are positives only, cum_hits counts hits in rank order,
    and the last hit's recall is exactly 10⁶ (all positives found)."""
    rows = eval_precision_recall_hits_q(spark, SF).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src, "fixture must contain positives"
    for src, hits in by_src.items():
        hits.sort(key=lambda r: r.k)
        for i, h in enumerate(hits):
            assert h.cum_hits == i + 1  # i-th hit in rank order
            assert h.prec_at_k_ppm == 1000000 * h.cum_hits // h.k
            assert h.prec_at_k_ppm <= 1000000
        assert hits[-1].recall_ppm == 1000000


def test_stream_ks_equals_batch(spark):
    """The IVM twin reproduces frontier4's eval_ks_two_sample exactly
    from per-user state folded over the event stream."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier4 import (
        eval_ks_two_sample_q,
    )

    batch = {tuple(r) for r in eval_ks_two_sample_q(spark, SF).collect()}
    stream = {tuple(r) for r in stream_ks_maintain_q(spark, SF).collect()}
    assert batch == stream


def test_boundary_audit_tells_the_straddle_story(spark):
    """The VERDICT r13 #5 claim, pinned: the aligned-segment pass fully
    detects aligned plants, detects ZERO straddling or sub-window plants;
    the stride-1 pass closes exactly the straddle class."""
    rows = {
        r.plant_class: r
        for r in dedup_segment_boundary_audit_q(spark, SF).collect()
    }
    assert set(rows) == {"aligned", "straddle", "short"}
    al, st, sh = rows["aligned"], rows["straddle"], rows["short"]
    assert al.n_docs > 0 and st.n_docs > 0 and sh.n_docs > 0
    # aligned plants: both detectors at full doc recall
    assert al.seg_doc_recall_ppm == 1000000
    assert al.win_doc_recall_ppm == 1000000
    # straddling plants: the PLANTED span is invisible to the aligned
    # pass (the tiny synthetic vocabulary admits the odd NATURAL repeated
    # 10-token run, so allow ≤10% accidental doc hits) while the stride-1
    # sweep recovers every planted doc — the quantified miss class and
    # its fix
    assert st.seg_doc_recall_ppm <= 100000
    assert st.n_seg_dup * 10 <= st.n_win_dup
    assert st.win_doc_recall_ppm == 1000000
    # sub-window plants: invisible to both width-10 detectors (the
    # junk-bracketed single segment is structurally unique per doc)
    assert sh.n_seg_dup == 0 and sh.n_win_dup == 0
    # short plants (junk + 6 tokens + junk = 8 tokens) have no width-10
    # windows at all; their single aligned segment exists but is unique
    assert sh.n_win_total == 0 and sh.n_seg_total == sh.n_docs
    assert _SEG_W == 10  # the contract the plants are built against


def test_audio_energy_windows_partition_payload(spark):
    """Windows tile each payload exactly (Σ n_samples = length), indices
    are contiguous from 0, at least one window is the peak, and a spot
    recompute of window 0's energy matches."""
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
        .collect()
    }
    rows = multimodal_audio_energy_q(spark, SF).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, wins in by_doc.items():
        wins.sort(key=lambda r: r.win_idx)
        assert [w.win_idx for w in wins] == list(range(len(wins)))
        assert sum(w.n_samples for w in wins) == len(docs[doc_id])
        assert all(w.n_samples == _AUDIO_W for w in wins[:-1])
        peak = max(w.energy for w in wins)
        assert any(w.is_peak for w in wins)
        for w in wins:
            assert w.is_peak == (w.energy == peak)
            assert w.mean_power_floor == w.energy // w.n_samples
        e0 = sum((ord(ch) - 96) ** 2 for ch in docs[doc_id][:_AUDIO_W])
        assert wins[0].energy == e0


def test_stream_spearman_equals_batch(spark):
    """The IVM twin reproduces frontier5's eval_spearman_rank exactly
    from per-customer count/cents state folded over the order stream."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier5 import (
        eval_spearman_rank_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier11 import (
        stream_spearman_maintain_q,
    )

    batch = {tuple(r) for r in eval_spearman_rank_q(spark, SF).collect()}
    stream = {
        tuple(r) for r in stream_spearman_maintain_q(spark, SF).collect()
    }
    assert batch == stream


def test_acf_profile_matches_python_recompute(spark):
    """Per-lag moments equal a dict-based replay over the daily series,
    including the calendar-gap pair-drop semantics."""
    from datetime import timedelta

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier11 import (
        temporal_acf_profile_q,
    )

    daily = {
        r.day: r.y
        for r in load_table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    }
    rows = {r.lag: r for r in temporal_acf_profile_q(spark, SF).collect()}
    assert set(rows) == set(range(1, 8))
    for lag in range(1, 8):
        pairs = [
            (y, daily[d - timedelta(days=lag)])
            for d, y in daily.items()
            if d - timedelta(days=lag) in daily
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        spx = sum(p for _, p in pairs)
        cov = n * sum(x * p for x, p in pairs) - sx * spx
        r = rows[lag]
        assert (r.n, r.sx, r.spx, r.cov_num) == (n, sx, spx, cov)
        assert r.corr_sign == (1 if cov > 0 else -1 if cov < 0 else 0)
        vx = n * sum(x * x for x, _ in pairs) - sx * sx
        vp = n * sum(p * p for _, p in pairs) - spx * spx
        if vx and vp:
            assert r.corr_sq_e6 == (cov * cov // vx) * 1000000 // vp
            assert 0 <= r.corr_sq_e6 <= 1000000


def test_kneser_ney_counts_match_python(spark):
    """Continuation/fanout censuses and both ppm faces equal a
    Counter-based bigram replay."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier11 import (
        text_kneser_ney_counts_q,
    )

    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < 500)
        .select("text")
        .collect()
    )
    big: Counter = Counter()
    for r in docs:
        ws = [t for t in r.text.lower().split() if t]
        for i in range(len(ws) - 1):
            big[(ws[i], ws[i + 1])] += 1
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    n_types = len(big)
    n_tokens = sum(big.values())
    cont: Counter = Counter()
    right_toks: Counter = Counter()
    fan: Counter = Counter()
    for (w1, w2), c in big.items():
        cont[w2] += 1
        right_toks[w2] += c
        fan[w1] += 1
    rows = {r.word: r for r in text_kneser_ney_counts_q(spark, SF).collect()}
    exp_words = {w for w, c in cont.items() if c >= 5}
    assert set(rows) == exp_words and exp_words
    for w in exp_words:
        r = rows[w]
        assert (r.continuation_types, r.fanout_types, r.right_tokens) == (
            cont[w],
            fan.get(w, 0),
            right_toks[w],
        )
        assert (r.n1, r.n2, r.n_bigram_types, r.n_bigram_tokens) == (
            n1,
            n2,
            n_types,
            n_tokens,
        )
        assert r.p_cont_ppm == 1000000 * cont[w] // n_types
        assert r.discount_ppm == 1000000 * n1 // (n1 + 2 * n2)
