"""Tests for catalog/frontier6.py — Brier/skill, AUUC, directed SCC."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark import catalog

catalog.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_brier_identities(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    [r] = QUERIES["eval_brier_score"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("text", "lang").collect()
    stop = {"the", "a", "of", "and", "to", "in", "is"}
    import re

    n = pos = sse = 0
    for d in docs:
        toks = re.split(r"\s+", d.text)
        p = 1_000_000 * sum(1 for t in toks if t in stop) // len(toks)
        y = 1 if d.lang == "en" else 0
        n += 1
        pos += y
        sse += (p - 1_000_000 * y) ** 2
    assert (r.n, r.pos) == (n, pos)
    assert r.brier_e12 == sse // n
    ref = (1_000_000 * pos // n) * (1_000_000 * (n - pos) // n)
    assert r.brier_ref_e12 == ref
    num = ref - sse // n
    expect = (
        0
        if ref == 0
        else (1000 * num // ref if num >= 0 else -(1000 * (-num) // ref))
    )
    assert r.bss_milli == expect
    # brier bounded by its e12 scale
    assert 0 <= r.brier_e12 <= 10**12


def test_auuc_consistent_with_qini_table(spark):
    """AUUC recomputed driver-side from the registered qini table must
    match exactly — the two contracts share one source of truth."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    qini = sorted(
        QUERIES["eval_uplift_qini"](spark, SF_DIR).collect(), key=lambda x: x.decile
    )
    [r] = QUERIES["eval_uplift_auuc"](spark, SF_DIR).collect()
    assert r.n_deciles == 10
    prev_q = prev_n = 0
    auuc2 = 0
    for x in qini:
        cum_n = x.cum_n_t + x.cum_n_c
        auuc2 += (x.qini_milli + prev_q) * (cum_n - prev_n)
        prev_q, prev_n = x.qini_milli, cum_n
    assert r.auuc2_milli_rows == auuc2
    assert r.n_units == prev_n
    assert r.auuc2_rand_milli_rows == prev_q * prev_n


def test_scc_matches_tarjan(spark):
    """Exact structural check: python Tarjan over the same thinned edge
    slice must produce the identical (node -> min-label component)
    partition and sizes."""
    import hashlib

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = QUERIES["graph_scc"](spark, SF_DIR).collect()
    got = {r.node: (r.scc_id, r.scc_size) for r in rows}

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect()
    edges = set()
    for r in li:
        s, d = r.l_orderkey % 60, r.l_partkey % 60
        if s == d:
            continue
        h = int(hashlib.md5(f"scc|{s}|{d}".encode()).hexdigest()[:8], 16)
        if h % 100 < 4:
            edges.add((s, d))
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    adj: dict[int, list[int]] = {v: [] for v in nodes}
    for s, d in edges:
        adj[s].append(d)

    # iterative Tarjan
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comps = []
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                comps.append(comp)
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)

    expect = {}
    for comp in comps:
        cid = min(comp)
        for v in comp:
            expect[v] = (cid, len(comp))
    assert got == expect


def test_scc_partition_properties(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["graph_scc"](spark, SF_DIR).collect()
    by_comp: dict[int, list[int]] = {}
    for r in rows:
        assert r.scc_id <= r.node  # min-label contract
        by_comp.setdefault(r.scc_id, []).append(r.node)
    for cid, members in by_comp.items():
        assert cid == min(members)
        sizes = {r.scc_size for r in rows if r.scc_id == cid}
        assert sizes == {len(members)}


def test_dag_depth_matches_python_longest_path(spark):
    """Exact structural check: python longest-path over the same thinned
    DAG slice (memoized DFS — the slice is acyclic by construction) must
    match depth, ancestor count, and root flags."""
    import hashlib
    from functools import lru_cache

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = QUERIES["graph_dag_depth"](spark, SF_DIR).collect()
    got = {r.node: (r.depth, r.n_ancestors, r.is_root) for r in rows}

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect()
    edges = set()
    for r in li:
        a, b = r.l_orderkey % 60, r.l_partkey % 60
        if a == b:
            continue
        c, p = max(a, b), min(a, b)
        h = int(hashlib.md5(f"dag|{c}|{p}".encode()).hexdigest()[:8], 16)
        if h % 100 < 6:
            edges.add((c, p))
    parents: dict[int, set[int]] = {}
    nodes = set()
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
        nodes.update((c, p))

    @lru_cache(maxsize=None)
    def depth(v: int) -> int:
        ps = parents.get(v, ())
        return 0 if not ps else 1 + max(depth(p) for p in ps)

    @lru_cache(maxsize=None)
    def ancestors(v: int) -> frozenset:
        out = set()
        for p in parents.get(v, ()):
            out.add(p)
            out |= ancestors(p)
        return frozenset(out)

    expect = {
        v: (depth(v), len(ancestors(v)), 1 if depth(v) == 0 else 0) for v in nodes
    }
    assert got == expect
    # DAG slice must have real structure: roots exist and depth > 1 exists
    assert any(d == 0 for d, _, _ in got.values())
    assert max(d for d, _, _ in got.values()) >= 2


def test_kendall_full_matches_quadratic_census(spark):
    """The dominance-count production path must equal the O(n^2) census
    computed in python over ALL customers — strict concordant, strict
    discordant, and ties (which the operator derives by subtraction)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    [r] = QUERIES["eval_kendall_tau_full"](spark, SF_DIR).collect()
    per = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("y"),
        )
        .collect()
    )
    pts = [(p.x, p.y) for p in per]
    n = len(pts)
    conc = disc = tied = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
            else:
                tied += 1
    assert (r.n_pairs, r.n_conc, r.n_disc, r.n_tied) == (
        n * (n - 1) // 2, conc, disc, tied,
    )
    # the gate slice had x,y strongly positive-associated; full corpus too
    assert r.n_conc > r.n_disc


def test_kendall_full_plan_has_no_allpairs_join(spark):
    """The whole point: no CartesianProduct, and at most ONE
    BroadcastNestedLoopJoin — the sanctioned |x-values|-wide grid fanout
    (a second BNLJ would mean the census tier's all-pairs shape crept
    back in; 'CartesianProduct absent' alone cannot catch that since an
    inequality-conditioned all-pairs join plans as a BNLJ)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    plan = (
        QUERIES["eval_kendall_tau_full"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_spearman_rescaled_close_to_exact(spark):
    """The rescaled rho must sit within 6e6/(n^2-1) ppm of the exact tier
    (the documented truncation residual) and share its n."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    [exact] = QUERIES["eval_spearman_rank"](spark, SF_DIR).collect()
    [resc] = QUERIES["eval_spearman_rescaled"](spark, SF_DIR).collect()
    assert resc.n == exact.n
    bound = 6_000_000 // (resc.n * resc.n - 1) + 1
    assert abs(resc.rho_ppm_rescaled - exact.rho_ppm) <= bound, (
        resc.rho_ppm_rescaled, exact.rho_ppm, bound,
    )


def test_condensation_is_acyclic_and_consistent_with_scc(spark):
    """The quotient graph must reference only SCC ids, contain no
    self-loops, and be a DAG (python cycle check over the tiny slice)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    scc = QUERIES["graph_scc"](spark, SF_DIR).collect()
    ids = {r.scc_id for r in scc}
    cedges = [(r.from_scc, r.to_scc) for r in QUERIES["graph_condensation"](spark, SF_DIR).collect()]
    assert cedges, "condensation unexpectedly empty"
    for a, b in cedges:
        assert a in ids and b in ids and a != b
    # DAG check: iterative DFS 3-coloring
    adj: dict[int, list[int]] = {}
    for a, b in cedges:
        adj.setdefault(a, []).append(b)
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {v: WHITE for v in ids}
    for start in ids:
        if color[start] != WHITE:
            continue
        stack = [(start, iter(adj.get(start, ())))]
        color[start] = GRAY
        while stack:
            v, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                color[v] = BLACK
                stack.pop()
                continue
            assert color[nxt] != GRAY, f"cycle through {nxt} — not a DAG"
            if color[nxt] == WHITE:
                color[nxt] = GRAY
                stack.append((nxt, iter(adj.get(nxt, ()))))


def test_stream_uplift_maintain_equals_batch(spark):
    """The maintained state must equal the one-shot batch computation of
    the same bucket table — SUM merges make the fold bundling-independent."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    got = {
        r.bucket: (r.n_t, r.n_c, r.pos_t, r.pos_c, r.qini_milli)
        for r in QUERIES["stream_uplift_maintain"](spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang").collect()
    import hashlib
    import re as _re

    stop = {"the", "a", "of", "and", "to", "in", "is"}
    per: dict[int, list[int]] = {}
    for d in docs:
        toks = _re.split(r"\s+", d.text)
        b = (1_000_000 * sum(1 for t in toks if t in stop) // len(toks)) // 20000
        t = int(hashlib.md5(f"uplift{d.doc_id}".encode()).hexdigest()[:8], 16) % 2
        y = 1 if d.lang == "en" else 0
        cell = per.setdefault(b, [0, 0, 0, 0])
        cell[0] += t
        cell[1] += 1 - t
        cell[2] += t * y
        cell[3] += (1 - t) * y
    assert set(got) == set(per)
    # cumulative qini from the top bucket down, sign-decomposed
    cum = [0, 0, 0, 0]
    for b in sorted(per, reverse=True):
        for i in range(4):
            cum[i] += per[b][i]
        num = cum[2] * cum[1] - cum[3] * cum[0]
        if cum[1] == 0:
            q = 0
        elif num >= 0:
            q = 1000 * num // cum[1]
        else:
            q = -(1000 * (-num) // cum[1])
        assert got[b] == (per[b][0], per[b][1], per[b][2], per[b][3], q), b


def test_sft_render_spans_exact(spark):
    """Loss-mask spans recomputed in python by actually rendering each
    conversation must match char-for-char — and slicing the rendered
    string at the spans must recover exactly the assistant payloads."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = QUERIES["fn_sft_render_spans"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    convs: dict[int, list[tuple[int, str, str]]] = {}
    for d in docs:
        role = "user" if d.doc_id % 2 == 0 else "assistant"
        convs.setdefault(d.doc_id // 4, []).append((d.doc_id % 4, role, d.text))
    expect = {}
    renders = {}
    for cid, turns in convs.items():
        turns.sort()
        s = ""
        for idx, role, text in turns:
            start = len(s) + len(f"<|{role}|>")
            s += f"<|{role}|>{text}"
            if role == "assistant":
                expect[(cid, idx)] = (start, len(s), len(turns))
        renders[cid] = s
    got = {(r.conv_id, r.turn_idx): (r.start_char, r.end_char, r.n_turns) for r in rows}
    assert got == expect
    for r in rows:
        assert r.conv_len == len(renders[r.conv_id])
        # slicing the render at the span recovers the assistant payload
        payload = renders[r.conv_id][r.start_char : r.end_char]
        src = dict((t[0], t[2]) for t in convs[r.conv_id])
        assert payload == src[r.turn_idx]


def test_scc_fb_identical_to_gate_tier(spark):
    """The FW-BW coloring production path must produce the EXACT partition
    the path-doubling gate tier produces on the same slice."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    gate = {
        r.node: (r.scc_id, r.scc_size)
        for r in QUERIES["graph_scc"](spark, SF_DIR).collect()
    }
    fb = {
        r.node: (r.scc_id, r.scc_size)
        for r in QUERIES["graph_scc_fb"](spark, SF_DIR).collect()
    }
    assert fb == gate


def test_scc_fb_operator_on_handbuilt_graph(spark):
    """Hand-built digraph with two cycles, a bridge, and DAG tails — the
    FW-BW operator must recover the exact SCC partition."""
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        strongly_connected_components_fb,
    )

    # cycles {1,2,3} and {5,6}; bridge 3->5; tails 0->1, 6->7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (5, 6), (6, 5), (3, 5), (0, 1), (6, 7)],
        "src long, dst long",
    )
    got = {
        r.node: r.scc_id
        for r in strongly_connected_components_fb(edges).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7}


def test_pr_curve_and_ap_against_python(spark):
    """PR curve points and AP must match a direct python sweep."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "n_chars", "lang"
    ).collect()
    by_src: dict = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(
            (d.n_chars, 1 if d.lang == "en" else 0)
        )
    want_curve, want_ap = {}, {}
    for src, rows in by_src.items():
        per_s: dict = {}
        for s, y in rows:
            c, p = per_s.get(s, (0, 0))
            per_s[s] = (c + 1, p + y)
        tot_p = sum(p for _, p in per_s.values())
        cum_tp = cum_n = ap_num = 0
        for s in sorted(per_s, reverse=True):
            c, p = per_s[s]
            cum_tp += p
            cum_n += c
            prec = 1_000_000 * cum_tp // cum_n
            want_curve[(src, s)] = (
                cum_tp,
                cum_n - cum_tp,
                prec,
                1_000_000 * cum_tp // tot_p if tot_p else None,
            )
            ap_num += p * prec
        want_ap[src] = (
            len(rows),
            tot_p,
            ap_num // tot_p if tot_p else None,
        )
    got_curve = {
        (r.source, r.threshold): (r.cum_tp, r.cum_fp, r.precision_ppm, r.recall_ppm)
        for r in QUERIES["eval_pr_curve"](spark, SF_DIR).collect()
    }
    assert got_curve == want_curve
    got_ap = {
        r.source: (r.n, r.n_pos, r.ap_ppm)
        for r in QUERIES["eval_average_precision"](spark, SF_DIR).collect()
    }
    assert got_ap == want_ap


def test_pairwise_winrate_cells_sum(spark):
    """wins + losses + ties = n per group, and the tie-split score is the
    exact census statistic."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["eval_pairwise_winrate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.a_wins + r.b_wins + r.ties == r.n
        assert r.a_score_ppm == (1_000_000 * r.a_wins + 500_000 * r.ties) // r.n
        if r.a_wins + r.b_wins:
            assert r.a_winrate_ppm == 1_000_000 * r.a_wins // (r.a_wins + r.b_wins)


def test_dpo_pairs_disjoint_nonneg_margin(spark):
    """Chosen/rejected sets are disjoint, margins non-negative, ≤8 pairs
    per group, and pairing is exactly outside-in under the total order."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["pairs_dpo_dataset"](spark, SF_DIR).collect()
    assert rows
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, prs in by_src.items():
        assert len(prs) <= 8
        chosen = {r.chosen_doc for r in prs}
        rejected = {r.rejected_doc for r in prs}
        assert not (chosen & rejected)
        assert all(r.margin_ppm >= 0 for r in prs)
        assert sorted(r.pair_idx for r in prs) == list(range(1, len(prs) + 1))


def test_attention_spans_tile_bins(spark):
    """Per (shard, bin): spans are contiguous from 0, non-overlapping, and
    their union length equals the bin's token total from pack_sequences."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    spans = QUERIES["pack_attention_spans"](spark, SF_DIR).collect()
    assert spans
    bins: dict = {}
    for r in spans:
        bins.setdefault((r.shard, r.bin), []).append(r)
    occ = {
        (r.shard, r.bin): r.bin_tokens
        for r in QUERIES["pack_sequences"](spark, SF_DIR).collect()
    }
    assert set(bins) == set(occ)
    for key, rs in bins.items():
        rs.sort(key=lambda r: r.seq_idx)
        pos = 0
        for i, r in enumerate(rs):
            assert r.seq_idx == i
            assert r.start_tok == pos
            assert r.end_tok > r.start_tok
            pos = r.end_tok
        assert pos == occ[key]


def test_chat_truncate_is_maximal_fitting_suffix(spark):
    """Kept set = turn 0 plus the maximal suffix of turns 1.. whose total
    length fits the 800-char budget; renumbering and audit columns exact."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    convs: dict = {}
    for d in docs:
        role = "user" if d.doc_id % 2 == 0 else "assistant"
        convs.setdefault(d.doc_id // 4, {})[d.doc_id % 4] = len(
            f"<|{role}|>{d.text}"
        )
    want: dict = {}
    for cid, turns in convs.items():
        later = sorted(t for t in turns if t >= 1)
        kept = [0] if 0 in turns else []
        # maximal fitting suffix of the later turns
        for start in range(len(later) + 1):
            if sum(turns[t] for t in later[start:]) <= 800:
                kept += later[start:]
                break
        want[cid] = kept
    got: dict = {}
    rows = QUERIES["fn_chat_truncate_budget"](spark, SF_DIR).collect()
    for r in rows:
        got.setdefault(r.conv_id, []).append(r)
    assert set(got) == set(want)
    for cid, rs in got.items():
        rs.sort(key=lambda r: r.turn_idx)
        assert [r.turn_idx for r in rs] == want[cid]
        assert [r.new_turn_idx for r in rs] == list(range(len(rs)))
        n_turns = len(convs[cid])
        for r in rs:
            assert r.n_dropped == n_turns - len(rs)
            assert r.kept_len == sum(convs[cid][t] for t in want[cid])


def test_profile_moments_match_python(spark):
    """Power sums and central-moment numerators must equal the exact
    python computation, and m2/m3 numerators the textbook identities."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).collect()
    groups: dict = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(int(r.l_quantity) - 25)
    for r in QUERIES["profile_moments"](spark, SF_DIR).collect():
        ds = groups[r.flag]
        n = len(ds)
        s1, s2, s3 = sum(ds), sum(d * d for d in ds), sum(d**3 for d in ds)
        assert (r.n, r.s1, r.s2, r.s3) == (n, s1, s2, s3)
        assert r.s4 == sum(d**4 for d in ds)
        assert r.m2_num == n * s2 - s1 * s1
        assert r.m3_num == n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3
        # shift-invariance: the numerators equal the directly centered sums
        # up to the exact integer identities (float check with tolerance 0)
        mu = s1 / n
        m2_direct = sum((d - mu) ** 2 for d in ds)
        assert abs(r.m2_num / n - m2_direct) < 1e-6 * max(1.0, m2_direct)


def test_dag_depth_frontier_identical_to_gate_tier(spark):
    """The layer-relaxation + bitmap production path must produce the
    EXACT (depth, n_ancestors) table the path-doubling gate tier does."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    gate = {
        r.node: (r.depth, r.n_ancestors, r.is_root)
        for r in QUERIES["graph_dag_depth"](spark, SF_DIR).collect()
    }
    fr = {
        r.node: (r.depth, r.n_ancestors, r.is_root)
        for r in QUERIES["graph_dag_depth_frontier"](spark, SF_DIR).collect()
    }
    assert fr == gate


def test_dag_depth_frontier_operator_handbuilt(spark):
    """Hand-built DAG: diamond 5->3->1, 5->4->1, 1->0 plus isolated-ish 2->0;
    longest-path depths and exact ancestor sets must come out."""
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        dag_depth_frontier,
    )

    edges = spark.createDataFrame(
        [(5, 3), (5, 4), (3, 1), (4, 1), (1, 0), (2, 0)],
        "child long, parent long",
    )
    got = {
        r.node: (r.depth, bin(r.anc_bm).count("1"))
        for r in dag_depth_frontier(edges).collect()
    }
    # depth = longest child->parent path to a root; ancestors = reachable set
    assert got == {
        0: (0, 0),
        1: (1, 1),
        2: (1, 1),
        3: (2, 2),
        4: (2, 2),
        5: (3, 4),
    }


def test_stream_pr_curve_equals_batch(spark):
    """The maintained state's read-time curve must equal the batch twin
    exactly (IVM discipline: (group, score) census is batch-additive)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    batch = {
        (r.source, r.threshold): (r.cum_tp, r.cum_fp, r.precision_ppm, r.recall_ppm)
        for r in QUERIES["eval_pr_curve"](spark, SF_DIR).collect()
    }
    stream = {
        (r.source, r.threshold): (r.cum_tp, r.cum_fp, r.precision_ppm, r.recall_ppm)
        for r in QUERIES["stream_pr_curve_maintain"](spark, SF_DIR).collect()
    }
    assert stream == batch


def test_dag_depth_frontier_bitmap_guard(spark):
    """Labels ≥ 63 must raise LOUDLY with ancestors on (shiftleft wraps
    mod 64 — silent bitmap corruption otherwise) and run depth-only
    with with_ancestors=False."""
    import pytest

    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        dag_depth_frontier,
    )

    edges = spark.createDataFrame(
        [(100, 70), (70, 5)], "child long, parent long"
    )
    with pytest.raises(ValueError, match="bitmap universe"):
        dag_depth_frontier(edges)
    got = {
        r.node: r.depth
        for r in dag_depth_frontier(edges, with_ancestors=False).collect()
    }
    assert got == {5: 0, 70: 1, 100: 2}


def test_dag_lca_against_python_closure(spark):
    """LCA node/depth and Wu-Palmer milli must match a direct python
    closure computation over the same slice."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier6 import _dag_edges

    edges = [(r.child, r.parent) for r in _dag_edges(spark, SF_DIR).collect()]
    parents: dict = {}
    nodes = set()
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
        nodes |= {c, p}

    import functools

    @functools.lru_cache(maxsize=None)
    def anc_or_self(v):
        out = {v}
        for p in parents.get(v, ()):
            out |= anc_or_self(p)
        return frozenset(out)

    @functools.lru_cache(maxsize=None)
    def depth(v):
        return max((1 + depth(p) for p in parents.get(v, ())), default=0)

    rows = QUERIES["graph_dag_lca_similarity"](spark, SF_DIR).collect()
    assert rows
    n_with_lca = 0
    for r in rows:
        assert (r.d1, r.d2) == (depth(r.n1), depth(r.n2))
        common = anc_or_self(r.n1) & anc_or_self(r.n2)
        if not common:
            assert r.lca_node is None and r.wup_milli is None
            continue
        n_with_lca += 1
        best = max(depth(a) for a in common)
        assert r.lca_depth == best
        assert r.lca_node == min(a for a in common if depth(a) == best)
        if r.d1 + r.d2 > 0:
            assert r.wup_milli == 2000 * best // (r.d1 + r.d2)
    assert n_with_lca > 0  # both branches exercised


def test_kendall_bucketed_matches_quadratic_census(spark):
    """The bucketed-x + strip decomposition must reproduce the exact
    O(n²) pair census on both near-continuous metrics."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    per = (
        load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("x"),
            F.max(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("y"),
        )
        .collect()
    )
    pts = [(r.x, r.y) for r in per]
    conc = disc = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            s = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            conc += s > 0
            disc += s < 0
    n = len(pts)
    [r] = QUERIES["eval_kendall_tau_bucketed"](spark, SF_DIR).collect()
    assert (r.n_pairs, r.n_conc, r.n_disc) == (n * (n - 1) // 2, conc, disc)
    assert r.n_tied == n * (n - 1) // 2 - conc - disc


def test_wilcoxon_matches_scipy_free_python(spark):
    """W+ (doubled) must equal the direct midrank computation, and the
    identities W+ + W- = n(n+1)/2 (doubled) and the centered numerator
    must hold."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    per = (
        load_table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("o_orderdate") >= F.lit("1998-07-01").cast("timestamp"),
                        F.floor(F.col("o_totalprice") * 100).cast("long"),
                    ).otherwise(F.lit(0))
                )
                - F.sum(
                    F.when(
                        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"),
                        F.floor(F.col("o_totalprice") * 100).cast("long"),
                    ).otherwise(F.lit(0))
                )
            ).alias("d")
        )
        .collect()
    )
    ds = [r.d for r in per if r.d != 0]
    srt = sorted(abs(d) for d in ds)
    # doubled midrank per |d| value
    from collections import Counter

    cnt = Counter(srt)
    r2 = {}
    cum = 0
    for v in sorted(cnt):
        r2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    w_plus2 = sum(r2[abs(d)] for d in ds if d > 0)
    n = len(ds)
    [r] = QUERIES["eval_wilcoxon_signed_rank"](spark, SF_DIR).collect()
    assert (r.n_eff, r.w_plus2) == (n, w_plus2)
    assert r.w_plus2 + r.w_minus2 == n * (n + 1)
    assert r.shift_num4 == 2 * w_plus2 - n * (n + 1)
    assert r.n_pos == sum(1 for d in ds if d > 0)


def test_largest_remainder_sums_to_budget(spark):
    """Σalloc = K exactly; every stratum within 1 of its real quota."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["sample_allocation_largest_remainder"](spark, SF_DIR).collect()
    assert rows
    K = 100_000
    total_tokens = sum(r.tokens for r in rows)
    assert sum(r.alloc for r in rows) == K
    for r in rows:
        exact = K * r.tokens / total_tokens
        assert r.base_alloc == K * r.tokens // total_tokens
        assert abs(r.alloc - exact) < 1
        assert r.extra in (0, 1)


def test_betweenness_bounded_against_python_bfs(spark):
    """Betweenness contributions must match a direct python BFS path-count
    computation (radius ≤ 6) on the same slice."""
    from collections import defaultdict, deque

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier6 import _scc_edges

    edges = [(r.src, r.dst) for r in _scc_edges(spark, SF_DIR).collect()]
    adj = defaultdict(list)
    nodes = set()
    for s, d in edges:
        adj[s].append(d)
        nodes |= {s, d}

    # BFS path counts per source, radius 6
    sigma = {}  # (s,t) -> (d, count)
    for s in nodes:
        dist = {s: 0}
        cnt = defaultdict(int)
        cnt[s] = 1
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= 6:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    cnt[w] += cnt[u]
        for t, d in dist.items():
            if t != s:
                sigma[(s, t)] = (d, cnt[t])

    want = {n: [0, 0] for n in nodes}
    for (s, t), (d, sg) in sigma.items():
        for v in nodes:
            if v in (s, t):
                continue
            if (s, v) in sigma and (v, t) in sigma:
                d1, g1 = sigma[(s, v)]
                d2, g2 = sigma[(v, t)]
                if d1 + d2 == d:
                    want[v][0] += 1_000_000 * g1 * g2 // sg
                    want[v][1] += 1
    got = {
        r.node: (r.betweenness_ppm, r.n_contribs)
        for r in QUERIES["graph_betweenness_bounded"](spark, SF_DIR).collect()
    }
    assert got == {n: tuple(w) for n, w in want.items()}


def test_rbo_against_python(spark):
    """RBO@10 terms must match a direct python prefix-overlap computation
    with the hardcoded weight table."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table
    import re

    stop = {"the", "a", "of", "and", "to", "in", "is"}
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "doc_id", "n_chars", "text"
    ).collect()
    by_src: dict = {}
    for d in docs:
        toks = re.split(r"\s+", d.text)
        q = 1_000_000 * sum(1 for t in toks if t in stop) // len(toks)
        by_src.setdefault(d.source, []).append((d.doc_id, d.n_chars, q))
    W = [100000, 90000, 81000, 72900, 65610, 59049, 53144, 47829, 43046, 38742]
    want = {}
    for src, rows in by_src.items():
        ra = {doc: i + 1 for i, (doc, a, b) in enumerate(
            sorted(rows, key=lambda r: (-r[1], r[0])))}
        rb = {doc: i + 1 for i, (doc, a, b) in enumerate(
            sorted(rows, key=lambda r: (-r[2], r[0])))}
        rbo = 0
        ov10 = 0
        for d in range(1, 11):
            top_a = {doc for doc, r in ra.items() if r <= d}
            top_b = {doc for doc, r in rb.items() if r <= d}
            ov = len(top_a & top_b)
            rbo += W[d - 1] * ov // d
            if d == 10:
                ov10 = ov
        want[src] = (rbo, ov10)
    got = {
        r.source: (r.rbo_ppm_trunc, r.overlap_at_10)
        for r in QUERIES["eval_rank_biased_overlap"](spark, SF_DIR).collect()
    }
    assert got == want


def test_eccentricity_consistent_with_betweenness_distances(spark):
    """The eccentricity table's distance stats must agree with an
    independent python BFS (radius 6) on the same slice."""
    from collections import defaultdict, deque

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier6 import _scc_edges

    edges = [(r.src, r.dst) for r in _scc_edges(spark, SF_DIR).collect()]
    adj = defaultdict(list)
    nodes = set()
    for s, d in edges:
        adj[s].append(d)
        nodes |= {s, d}
    want = {}
    for s in nodes:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= 6:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        ds = [d for t, d in dist.items() if t != s]
        want[s] = (len(ds), max(ds, default=0), sum(ds))
    got = {
        r.node: (r.n_reach, r.ecc, r.sum_dist)
        for r in QUERIES["graph_eccentricity_bounded"](spark, SF_DIR).collect()
    }
    assert got == want


def test_stream_allocation_equals_batch(spark):
    """The maintained state's read-time apportionment must equal the
    batch twin exactly."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    batch = {
        r.source: (r.tokens, r.base_alloc, r.extra, r.alloc)
        for r in QUERIES["sample_allocation_largest_remainder"](
            spark, SF_DIR
        ).collect()
    }
    stream = {
        r.source: (r.tokens, r.base_alloc, r.extra, r.alloc)
        for r in QUERIES["stream_allocation_maintain"](spark, SF_DIR).collect()
    }
    assert stream == batch


def test_holt_linear_matches_python_recursion(spark):
    """The two-state integer fold must equal a direct python recursion
    with truncating halving (trunc toward zero, both signs)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in ev:
        import math

        series.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, math.floor(r.value * 1_000_000))
        )

    def trunc_half(x):
        return int(x / 2) if x >= 0 else -((-x) // 2)

    want = {}
    for uid, rows in series.items():
        rows.sort()
        lvl, trd = rows[0][2], 0
        for _, _, v in rows[1:]:
            new_l = trunc_half(lvl + trd + v)
            trd = trunc_half(trd + new_l - lvl)
            lvl = new_l
        want[uid] = (len(rows), lvl, trd, lvl + trd)
    got = {
        r.user_id: (r.n_events, r.level_units, r.trend_units, r.forecast_units)
        for r in QUERIES["temporal_holt_linear"](spark, SF_DIR).collect()
    }
    assert got == want


def test_holt_tracks_trend_where_ema_lags(spark):
    """On a clean linear ramp the Holt forecast converges to the next
    value while EMA stays behind — the operator's reason to exist."""
    from cell_kn_mvp_etl_ontologies_spark.operators.temporal import (
        ema_integer,
        holt_linear_integer,
    )

    ramp = [(1, i, 1000 * i) for i in range(1, 41)]
    df = spark.createDataFrame(ramp, "k long, t long, v long")
    [h] = holt_linear_integer(df, ["k"], ["t"], "v").collect()
    [e] = ema_integer(df, ["k"], ["t"], "v").collect()
    nxt = 1000 * 41
    assert abs(h.forecast_units - nxt) < abs(e.ema_units - nxt)
    assert h.trend_units > 0


def test_systematic_sample_covers_every_window(spark):
    """Every consecutive window of k=10 ranks contributes exactly one
    sampled row — the implicit-stratification property."""
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    n = load_table(spark, SF_DIR, "documents").count()
    rows = QUERIES["sample_systematic_interval"](spark, SF_DIR).collect()
    ranks = sorted(r.rnk for r in rows)
    assert ranks == list(range(4, n + 1, 10))
    # the sampled doc_ids are the (rank)th smallest ids
    ids = sorted(
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents").select("doc_id").collect()
    )
    assert sorted(r.doc_id for r in rows) == [ids[k - 1] for k in ranks]


def test_friedman_ranks_identities_and_python(spark):
    """Σ doubled rank sums = 12n exactly; ranks match a python midrank
    computation per row."""
    import re

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    stop = {"the", "a", "of", "and", "to", "in", "is"}
    docs = load_table(spark, SF_DIR, "documents").select("n_chars", "text").collect()
    sums = [0, 0, 0]
    for d in docs:
        toks = re.split(r"\s+", d.text)
        scores = [
            d.n_chars,
            6 * len(toks),
            30 * sum(1 for t in toks if t in stop),
        ]
        for j, v in enumerate(scores):
            less = sum(1 for u in scores if u < v)
            eq = sum(1 for u in scores if u == v) - 1
            sums[j] += 2 * less + eq + 2
    n = len(docs)
    [r] = QUERIES["eval_friedman_ranks"](spark, SF_DIR).collect()
    assert (r.n, r.r2_a, r.r2_b, r.r2_c) == (n, sums[0], sums[1], sums[2])
    assert r.r2_a + r.r2_b + r.r2_c == 12 * n
    assert r.friedman_num4 == sum((s - 4 * n) ** 2 for s in sums)


def test_cochran_q_matches_python_and_reduces_to_mcnemar_shape(spark):
    """Q's integer core must match python; identities ΣC_j = ΣR_i and the
    non-negativity of num/den must hold."""
    import re

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    stop = {"the", "a", "of", "and", "to", "in", "is"}
    docs = load_table(spark, SF_DIR, "documents").select(
        "lang", "n_chars", "text"
    ).collect()
    ca = cb = cc = sr = sr2 = 0
    for d in docs:
        toks = re.split(r"\s+", d.text)
        va = 1 if d.lang == "en" else 0
        vb = 1 if d.n_chars > 300 else 0
        vc = 1 if 1_000_000 * sum(1 for t in toks if t in stop) // len(toks) > 40_000 else 0
        ca += va
        cb += vb
        cc += vc
        sr += va + vb + vc
        sr2 += (va + vb + vc) ** 2
    [r] = QUERIES["eval_cochran_q"](spark, SF_DIR).collect()
    assert (r.n, r.c_a, r.c_b, r.c_c, r.sum_r, r.sum_r2) == (
        len(docs), ca, cb, cc, sr, sr2,
    )
    assert r.c_a + r.c_b + r.c_c == r.sum_r
    num = 2 * (3 * (ca * ca + cb * cb + cc * cc) - sr * sr)
    den = 3 * sr - sr2
    assert (r.q_num, r.q_den) == (num, den)
    assert num >= 0 and den >= 0
    if den:
        assert r.q_milli == 1000 * num // den
