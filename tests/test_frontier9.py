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


def test_seasonality_strength_identity(spark):
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        temporal_seasonality_strength_q,
    )

    r = temporal_seasonality_strength_q(spark, SF01).collect()[0]
    assert 0 <= r.seasonal_strength_ppm <= 1_000_000
    want = max(0, 1_000_000 - 1_000_000 * r.var_num_rem // r.var_num_detr)
    assert r.seasonal_strength_ppm == want
    assert r.var_num_detr > 0


def test_snips_matches_python_recompute(spark):
    """IPS/SNIPS values equal an exact integer recompute from the same
    md5-derived propensities."""
    import hashlib

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        eval_snips_offpolicy_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    got = eval_snips_offpolicy_q(spark, SF01).collect()[0]
    rows = load_table(spark, SF01, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    import math

    num = 0
    den = 0
    n_logged = len(rows)
    n_matched = 0
    for r in rows:
        if r.event_type != "click":
            continue
        n_matched += 1
        p_ppm = (
            100000
            + int(hashlib.md5(f"prop|{r.event_id}".encode()).hexdigest()[:8], 16)
            % 900001
        )
        w = 10**12 // p_ppm
        r_c = math.floor(r.value * 100)
        num += r_c * w
        den += w
    assert got.n_logged == n_logged and got.n_matched == n_matched
    assert got.ips_value_c == num // (n_logged * 10**6)
    assert got.snips_value_c == num // den


def test_bipartite_projection_cap_and_support(spark):
    """Every emitted pair is supported by >= 3 kept baskets; the cap is
    live at gate scale (some baskets exceed it); capped pairs are a
    subset of uncapped pairs."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        _BIPARTITE_BASKET_CAP,
        graph_bipartite_projection_capped_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    rows = graph_bipartite_projection_capped_q(spark, SF01).collect()
    assert rows and all(r.n_shared_baskets >= 3 for r in rows)

    events = load_table(spark, SF01, "events")
    item = F.get_json_object(F.col("props"), "$.k").cast("long")
    ui = (
        events.select(
            F.concat_ws(
                "|",
                F.col("user_id").cast("string"),
                F.col("ts").cast("date").cast("string"),
            ).alias("basket"),
            item.alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    deg = ui.groupBy("basket").count()
    n_hot = deg.filter(F.col("count") > _BIPARTITE_BASKET_CAP).count()
    assert n_hot > 0, "cap must be observable at gate scale"
    uncapped = {
        (r.item_a, r.item_b)
        for r in ui.alias("x")
        .join(ui.alias("y"), on="basket")
        .filter(F.col("y.item") > F.col("x.item"))
        .select(F.col("x.item").alias("item_a"), F.col("y.item").alias("item_b"))
        .groupBy("item_a", "item_b")
        .count()
        .filter(F.col("count") >= 3)
        .collect()
    }
    assert {(r.item_a, r.item_b) for r in rows} <= uncapped


def test_vocab_coverage_ivm_bundling(spark, tmp_path, monkeypatch):
    """The vocab-coverage maintainer equals its batch twin over a 3-batch
    id-interleaved split (train and held tokens arrive mixed across
    batches — both censuses must fold regardless)."""
    import glob as _glob
    import shutil

    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "split_sf"
    d.mkdir()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    names = {0: "", 1: "_1", 2: "_2"}
    for i in range(3):
        tmp_out = str(d / f"__tmp_documents_{i}")
        docs.filter(F.col("doc_id") % 3 == i).repartition(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        part = _glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.move(part, str(d / f"documents{names[i]}.parquet"))
        shutil.rmtree(tmp_out, ignore_errors=True)

    orig = streaming_mod.read_documents_stream
    monkeypatch.setattr(
        streaming_mod,
        "read_documents_stream",
        lambda sp, sd: orig(sp, sd, max_files_per_trigger=1),
    )
    batch = {tuple(r) for r in QUERIES["text_vocab_coverage"](spark, sf).collect()}
    stream = {
        tuple(r)
        for r in QUERIES["stream_vocab_coverage_maintain"](spark, str(d)).collect()
    }
    assert stream == batch and len(batch) == 1


def test_krippendorff_matches_fraction_recompute(spark):
    """alpha_ppm_floor equals an exact Fraction recompute from the same
    md5-derived rating matrix."""
    import hashlib
    from collections import Counter
    from fractions import Fraction

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        _KRIPP_RATERS,
        eval_krippendorff_alpha_q,
    )

    got = eval_krippendorff_alpha_q(spark, SF01).collect()[0]
    m = _KRIPP_RATERS
    units = {}
    for doc_id in range(200):
        base = int(hashlib.md5(f"base|{doc_id}".encode()).hexdigest()[:8], 16)
        labs = []
        for r in range(m):
            noise = int(
                hashlib.md5(f"noise|{r}|{doc_id}".encode()).hexdigest()[:8], 16
            )
            labs.append((base + 1 + r) % 4 if noise % 10 == 0 else base % 4)
        units[doc_id] = Counter(labs)
    n = len(units)
    do_num = sum(c * (m - c) for cnt in units.values() for c in cnt.values())
    pooled = Counter()
    for cnt in units.values():
        pooled.update(cnt)
    N = n * m
    de_num = sum(c * (N - c) for c in pooled.values())
    alpha = 1 - Fraction(do_num, n * m * (m - 1)) / Fraction(de_num, N * (N - 1))
    import math

    want_ppm = 1_000_000 - math.floor(1_000_000 * do_num * N * (N - 1)
                                      / (de_num * n * m * (m - 1)))
    # exact integer floor, not float: recompute with integer //
    want_ppm = 1_000_000 - (1_000_000 * do_num * N * (N - 1)) // (
        de_num * n * m * (m - 1)
    )
    assert got.do_num == do_num and got.de_num == de_num
    assert got.n_units == n and got.n_ratings == N
    assert got.alpha_ppm_floor == want_ppm
    assert 0 < alpha < 1


def test_louvain_move_improves_modularity(spark):
    """Every emitted positive-gain move, applied ALONE to the singleton
    partition, increases modularity by exactly gain_units/2m² (the
    single-move exactness the contract claims), and the per-node argmax
    replays in Python."""
    from collections import Counter, defaultdict

    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        graph_louvain_move_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    assign = {r.node: r for r in graph_louvain_move_q(spark, SF01).collect()}
    li = load_table(spark, SF01, "lineitem").filter(F.col("l_orderkey") % 3 == 0)
    edges = {
        (r.a, r.b)
        for r in li.select(
            F.col("l_suppkey").cast("long").alias("a"),
            (F.lit(100000) + F.col("l_partkey") % 1500).cast("long").alias("b"),
        )
        .distinct()
        .collect()
    }
    m = len(edges)
    deg = Counter()
    nbr_mult = defaultdict(Counter)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        nbr_mult[a][b] += 1
        nbr_mult[b][a] += 1

    # python replay of the synchronous argmax
    for i, cnt in nbr_mult.items():
        best = max(cnt, key=lambda c: (2 * m * cnt[c] - deg[i] * deg[c], -c))
        gain = 2 * m * cnt[best] - deg[i] * deg[best]
        want = best if gain > 0 else i
        assert assign[i].community == want, i
        assert assign[i].gain_units == (gain if gain > 0 else 0), i

    # 4m^2-scaled modularity: Q*4m^2 = sum_c (4m*e_c - tot_c^2)
    def q_scaled(part):
        e = Counter()
        tot = Counter()
        for a, b in edges:
            if part[a] == part[b]:
                e[part[a]] += 1
        for v, k in deg.items():
            tot[part[v]] += k
        comms = set(e) | set(tot)
        return sum(4 * m * e[c] - tot[c] ** 2 for c in comms)

    singleton = {v: v for v in deg}
    q0 = q_scaled(singleton)
    movers = [v for v in deg if assign[v].gain_units > 0]
    assert movers, "gate graph must admit some positive move"
    # single-move exactness: ΔQ·4m² == 2·gain_units for each move alone
    for v in movers[:25]:
        alone = dict(singleton)
        alone[v] = assign[v].community
        assert q_scaled(alone) - q0 == 2 * assign[v].gain_units, v


def test_kmv_difference_consistency(spark):
    """Sketch difference estimates are within the k=64 band of the exact
    one-sided counts, and inclusion-exclusion closes: a_only + b_only +
    both = k_eff on the union sketch."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier8 import (
        sketch_kmv_intersection_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        sketch_kmv_difference_q,
    )

    d = sketch_kmv_difference_q(spark, SF01).collect()[0]
    i = sketch_kmv_intersection_q(spark, SF01).collect()[0]
    assert d.k_eff == i.k_eff
    assert d.k_a_only + d.k_b_only + i.k_both == d.k_eff
    for est, exact in [
        (d.a_minus_b_est, d.exact_a_only),
        (d.b_minus_a_est, d.exact_b_only),
    ]:
        assert abs(est - exact) <= 0.5 * max(exact, 1), (est, exact)


def test_iqr_fences_match_sorted_elements(spark):
    """Quartiles equal the sorted-element contract positions and the
    outlier counts replay in Python."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        filter_outlier_iqr_q,
    )
    from cell_kn_mvp_etl_ontologies_spark.io import load_table

    import math

    got = {r.event_type: r for r in filter_outlier_iqr_q(spark, SF01).collect()}
    rows = load_table(spark, SF01, "events").select("event_type", "value").collect()
    from collections import defaultdict

    vals = defaultdict(list)
    for r in rows:
        vals[r.event_type].append(math.floor(r.value * 100))
    for et, vs in vals.items():
        vs.sort()
        n = len(vs)
        q1 = vs[max(1, (n + 1) // 4) - 1]
        q3 = vs[max(1, (3 * (n + 1)) // 4) - 1]
        r = got[et]
        assert (r.n, r.q1_c, r.q3_c) == (n, q1, q3), et
        lo = sum(1 for v in vs if 2 * v < 2 * q1 - 3 * (q3 - q1))
        hi = sum(1 for v in vs if 2 * v > 2 * q3 + 3 * (q3 - q1))
        assert (r.n_low_outliers, r.n_high_outliers) == (lo, hi), et


def test_snaive_backtest_identities(spark):
    """WAPE/MAE/bias close against each other: mae_floor == Σ|e| DIV n,
    and a perfectly periodic series would read 0 — the gate series is
    not, so errors are nonzero."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        temporal_snaive_backtest_q,
    )

    rows = temporal_snaive_backtest_q(spark, SF01).collect()
    assert rows
    for r in rows:
        assert r.n_days_scored > 0
        assert r.mae_floor >= 0 and 0 <= r.wape_ppm
        assert r.wape_ppm > 0, "gate series should not be perfectly periodic"


def test_mcc_parts_reconcile_with_scorecard(spark):
    """MCC cells equal the binary scorecard's; the signed square is
    monotone-consistent with a float MCC recompute."""
    import math

    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES, load_all
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        eval_mcc_parts_q,
    )

    load_all()  # frontier3 is not standalone-importable (oracle chain)
    got = eval_mcc_parts_q(spark, SF01).collect()[0]
    card = QUERIES["eval_binary_detector_metrics"](spark, SF01).collect()[0]
    assert (got.tp, got.fp, got.fn, got.tn) == (card.tp, card.fp, card.fn, card.tn)
    assert got.mcc_num == got.tp * got.tn - got.fp * got.fn
    denom = (
        (got.tp + got.fp) * (got.tp + got.fn) * (got.tn + got.fp) * (got.tn + got.fn)
    )
    mcc = got.mcc_num / math.sqrt(denom)
    assert abs(got.mcc_sq_e12_signed / 1e12 - math.copysign(mcc * mcc, mcc)) < 1e-6


def test_correlation_pairs_sign_and_bounds(spark):
    """corr_sq_e6 stays in [0, 1e6] (Cauchy-Schwarz), the sign column
    matches the covariance numerator, and the price~custkey pair is
    near-independent by construction (rho^2 tiny)."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import (
        profile_correlation_pairs_q,
    )

    rows = {r.pair: r for r in profile_correlation_pairs_q(spark, SF01).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert 0 <= r.corr_sq_e6 <= 1_000_000, r
        assert r.corr_sign == (r.cov_num > 0) - (r.cov_num < 0)
    assert rows["o_totalprice~o_custkey"].corr_sq_e6 < 50_000


def test_snips_ivm_bundling(spark, tmp_path, monkeypatch):
    """The SNIPS maintainer (1-row pure-SUM state) equals the batch row
    over a 3-batch split."""
    import glob as _glob
    import shutil

    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
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
    batch = {tuple(r) for r in QUERIES["eval_snips_offpolicy"](spark, sf).collect()}
    stream = {
        tuple(r) for r in QUERIES["stream_snips_maintain"](spark, str(d)).collect()
    }
    assert stream == batch and len(batch) == 1


def test_iqr_ivm_bundling(spark, tmp_path, monkeypatch):
    """The IQR maintainer (value-census state, census-ranked quartile
    face) equals the batch row over a 3-batch split."""
    import glob as _glob
    import shutil

    import cell_kn_mvp_etl_ontologies_spark.streaming as streaming_mod
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
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
    batch = {tuple(r) for r in QUERIES["filter_outlier_iqr"](spark, sf).collect()}
    stream = {
        tuple(r) for r in QUERIES["stream_iqr_maintain"](spark, str(d)).collect()
    }
    assert stream == batch and len(batch) > 0
