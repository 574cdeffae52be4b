"""Round-4 analytics additions: gap-fill interpolation, unpivot, fuzzy
levenshtein dedup, bounded BFS, and substring-span dedup — golden semantics
plus the plan-shape claims their docstrings make."""

from __future__ import annotations

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.dedup import (
    duplicated_span_hashes,
    fuzzy_pairs_levenshtein,
)
from cell_kn_mvp_etl_ontologies_spark.operators.temporal import gap_fill_interpolate
from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import bfs_distances


# --------------------------------------------------------------------------
# gap_fill_interpolate
# --------------------------------------------------------------------------
def test_gap_fill_interpolates_interior_gaps(spark):
    obs = spark.createDataFrame(
        [(1, 10, 100), (1, 13, 400), (1, 14, 1000), (2, 5, 50)],
        "k long, b long, v long",
    )
    out = gap_fill_interpolate(obs, "k", "b", "v")
    got = {(r.k, r.b): (r.value_units, r.interpolated) for r in out.collect()}
    # key 1 spans 10..14; buckets 11, 12 interpolate 100 -> 400 over gap 3
    assert got[(1, 10)] == (100, False)
    assert got[(1, 11)] == (200, True)
    assert got[(1, 12)] == (300, True)
    assert got[(1, 13)] == (400, False)
    assert got[(1, 14)] == (1000, False)
    # single-observation key has a 1-bucket span, nothing to fill
    assert got[(2, 5)] == (50, False)
    assert len(got) == 6


def test_gap_fill_floor_semantics_on_uneven_gap(spark):
    # 0 -> 10 over a 3-bucket gap: exact thirds floor to 3 and 6
    obs = spark.createDataFrame([(1, 0, 0), (1, 3, 10)], "k long, b long, v long")
    out = gap_fill_interpolate(obs, "k", "b", "v")
    got = {r.b: r.value_units for r in out.collect()}
    assert got == {0: 0, 1: 3, 2: 6, 3: 10}


def test_gap_fill_single_shuffle_plan(spark):
    obs = spark.createDataFrame([(1, 0, 0), (1, 5, 10)], "k long, b long, v long")
    plan = (
        gap_fill_interpolate(obs, "k", "b", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the two window frames share one partitioning+sort; the span agg and
    # grid join add exchanges over the same key, but no bucket-level shuffle
    assert plan.count("Window") >= 1
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


# --------------------------------------------------------------------------
# fuzzy_pairs_levenshtein
# --------------------------------------------------------------------------
def test_fuzzy_pairs_finds_suffix_edits_only_within_bucket(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumped"),  # dist 2 from doc 1, same prefix
            (3, "a completely different text"),
            (4, "THE QUICK brown fox jumps"),  # same after lower() -> dist 0
            (5, "xhe quick brown fox jumps"),  # first-char edit: other bucket
        ],
        "doc_id long, text string",
    )
    out = fuzzy_pairs_levenshtein(docs, "text", "doc_id", prefix_len=12, max_dist=4)
    pairs = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    assert pairs[(1, 2)] == 2
    assert pairs[(1, 4)] == 0
    assert pairs[(2, 4)] == 2
    # doc 5 differs in the bucketing prefix -> not a candidate (recall contract)
    assert not any(5 in p for p in pairs)
    assert not any(3 in p for p in pairs)


def test_fuzzy_pairs_plan_is_equijoin_not_cartesian(spark):
    docs = spark.createDataFrame(
        [(i, f"prefix shared {i}") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        fuzzy_pairs_levenshtein(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# bfs_distances
# --------------------------------------------------------------------------
def test_bfs_distances_shortest_paths_on_path_graph(spark):
    # path 1-2-3-4-5 plus shortcut 1-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src long, dst long"
    )
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([(1,)], "v long")
    out = bfs_distances(sym, seeds, max_hops=3)
    got = {r.v: r.dist for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}


def test_bfs_distances_multi_source_min(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    seeds = spark.createDataFrame([(1,), (4,)], "v long")
    out = bfs_distances(edges, seeds, max_hops=2)
    got = {r.v: r.dist for r in out.collect()}
    # directed: 4 reaches nothing; 1 reaches 2 and 3
    assert got == {1: 0, 2: 1, 3: 2, 4: 0}


def test_bfs_distances_hop_bound_excludes_far_vertices(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "v long")
    out = bfs_distances(edges, seeds, max_hops=2)
    got = {r.v: r.dist for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2}


# --------------------------------------------------------------------------
# duplicated_span_hashes
# --------------------------------------------------------------------------
def test_duplicated_spans_detects_shared_window(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, f"intro {shared} outro"),
            (2, f"different opening here {shared}"),
            (3, "no overlap with anything else at all whatsoever truly"),
        ],
        "doc_id long, text string",
    )
    out = duplicated_span_hashes(docs, "text", "doc_id", window_tokens=8)
    rows = out.collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.n_docs == 2 and r.n_occurrences == 2 and r.first_doc == 1


def test_duplicated_spans_short_docs_and_within_doc_repeats_excluded(spark):
    rep = "a b c d e f g h " * 2  # window repeats WITHIN one doc only
    docs = spark.createDataFrame(
        [(1, "too short"), (2, rep)], "doc_id long, text string"
    )
    out = duplicated_span_hashes(docs, "text", "doc_id", window_tokens=8)
    assert out.count() == 0  # n_docs > 1 required


def test_duplicated_spans_explodes_hashes_not_token_arrays(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g h i j")], "doc_id long, text string")
    out = duplicated_span_hashes(docs, "text", "doc_id", window_tokens=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # single Generate over the transform()'d hash array; one aggregate exchange
    assert plan.count("Generate") == 1
    assert "md5" not in plan.split("Generate")[0], (
        "md5 must be computed before the explode, not per exploded row"
    )


# --------------------------------------------------------------------------
# documented-risk robustness
# --------------------------------------------------------------------------
def test_gap_fill_long_span_boundaries(spark):
    # one key spanning 10k buckets with only the endpoints observed: the
    # dense grid is the span-skew case the docstring names — interior fills
    # must interpolate exactly and the grid must not duplicate buckets
    obs = spark.createDataFrame([(1, 0, 0), (1, 10000, 10000000)], "k long, b long, v long")
    out = gap_fill_interpolate(obs, "k", "b", "v")
    assert out.count() == 10001
    assert out.filter(F.col("interpolated")).count() == 9999
    mid = out.filter(F.col("b") == 5000).first()
    assert mid.value_units == 5000000  # exact linear midpoint
    # monotone series stays monotone under floor interpolation
    vals = [r.value_units for r in out.orderBy("b").collect()]
    assert all(a <= b for a, b in zip(vals, vals[1:]))


def test_duplicated_spans_hot_span_counts(spark):
    # one boilerplate window shared by 200 docs (the stop-phrase skew case):
    # counts must stay exact through the map-side-combining aggregate
    shared = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = spark.createDataFrame(
        [(i, f"unique{i} tail{i} {shared}") for i in range(200)],
        "doc_id long, text string",
    )
    out = duplicated_span_hashes(docs, "text", "doc_id", window_tokens=8)
    rows = {r.span: r for r in out.collect()}
    hot = [r for r in rows.values() if r.n_docs == 200]
    assert len(hot) == 1
    assert hot[0].n_occurrences == 200 and hot[0].first_doc == 0


def test_new_ops_empty_inputs(spark):
    # all five operators must return empty frames (not raise) on empty input
    empty_obs = spark.createDataFrame([], "k long, b long, v long")
    assert gap_fill_interpolate(empty_obs, "k", "b", "v").count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert fuzzy_pairs_levenshtein(empty_docs, "text", "doc_id").count() == 0
    assert duplicated_span_hashes(empty_docs, "text", "doc_id").count() == 0
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    no_seeds = spark.createDataFrame([], "v long")
    assert bfs_distances(edges, no_seeds, max_hops=2).count() == 0
    no_edges = spark.createDataFrame([], "src long, dst long")
    seeds = spark.createDataFrame([(7,)], "v long")
    got = {r.v: r.dist for r in bfs_distances(no_edges, seeds, max_hops=2).collect()}
    assert got == {7: 0}  # seeds survive with distance 0


def test_gap_fill_null_text_and_fuzzy_null_safety(spark):
    # null text rows must not poison the prefix bucket join
    docs = spark.createDataFrame(
        [(1, "same prefix here a"), (2, "same prefix here b"), (3, None)],
        "doc_id long, text string",
    )
    out = fuzzy_pairs_levenshtein(docs, "text", "doc_id")
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert pairs == {(1, 2)}
    spans = duplicated_span_hashes(docs, "text", "doc_id", window_tokens=3)
    assert not any(r.first_doc == 3 for r in spans.collect())


def test_kcore_matches_python_reference_and_converges(spark):
    """kcore_vertices equals a plain python peeling reference on a small
    random graph, and one extra round past convergence changes nothing
    (the property the fixed-round catalog gate leans on)."""
    import random

    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import kcore_vertices

    rnd = random.Random(7)
    raw = {(rnd.randrange(30), rnd.randrange(30)) for _ in range(160)}
    raw = [(a, b) for a, b in raw if a != b]
    edges = spark.createDataFrame(raw, "src long, dst long")

    # python reference: peel to fixpoint, then report in-core degrees
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in raw:
        adj[a].add(b)
        adj[b].add(a)
    k = 4
    live = set(adj)
    rounds = 0
    while True:
        drop = {v for v in live if sum(1 for n in adj[v] if n in live) < k}
        if not drop:
            break
        live -= drop
        rounds += 1
    want = {
        v: sum(1 for n in adj[v] if n in live) for v in live
    }

    n_rounds = rounds + 1  # one spare round => exact fixpoint
    got = {r.v: r.deg for r in kcore_vertices(edges, k=k, n_rounds=n_rounds).collect()}
    assert got == want
    # stability: a further round is a no-op
    again = {r.v: r.deg for r in kcore_vertices(edges, k=k, n_rounds=n_rounds + 1).collect()}
    assert again == got
    # and every survivor meets the core condition
    assert all(d >= k for d in got.values()) or got == {}


def test_bigram_lm_scores_python_reference_and_ordering_signal(spark):
    """bigram_lm_scores matches a plain python reference, and a shuffled-
    word doc (same unigram profile, implausible transitions) scores below
    its natural twin — the signal unigram scoring cannot see."""
    import math
    from collections import Counter

    from cell_kn_mvp_etl_ontologies_spark.operators.text_analysis import (
        bigram_lm_scores,
        unigram_lm_scores,
    )

    natural = "the cat sat on the mat and the cat ran to the mat"
    shuffled = "the the the cat cat mat on sat and ran to mat the"  # same bag of words
    docs = [
        (1, natural), (2, natural), (3, natural),  # plausible transitions dominate
        (4, shuffled),
        (5, "solo"),  # < 2 tokens: zero row, not a crash
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.id: r.asDict() for r in bigram_lm_scores(df, "text", "doc_id").collect()}

    # python reference (same tokenization + counts-as-context conditional)
    toks = {i: [t for t in text.lower().split() if t] for i, text in docs}
    bis = {i: list(zip(ws, ws[1:])) for i, ws in toks.items()}
    c2 = Counter(p for ps in bis.values() for p in ps)
    c1 = Counter(p[0] for ps in bis.values() for p in ps)
    for i, ps in bis.items():
        want_pair = sum(math.floor(math.log2(c2[p])) for p in ps)
        want_cond = sum(
            math.floor(math.log2(c2[p])) - math.floor(math.log2(c1[p[0]])) for p in ps
        )
        assert got[i]["n_bigrams"] == len(ps)
        assert got[i]["oov_bigrams"] == 0
        assert got[i]["pair_bits"] == want_pair, i
        assert got[i]["cond_bits"] == want_cond, i
    assert got[5] == {
        "id": 5, "n_bigrams": 0, "oov_bigrams": 0, "pair_bits": 0,
        "cond_bits": 0, "mean_cond_millibits": 0,
    }
    # the ordering signal: shuffled doc scores below its natural twin...
    assert got[4]["mean_cond_millibits"] < got[1]["mean_cond_millibits"]
    # ...while the unigram score cannot tell them apart (same token bag,
    # modulo one token count difference from identical length)
    uni = {r.id: r.score_bits for r in unigram_lm_scores(df, "text", "doc_id").collect()}
    assert uni[4] == uni[1]


def test_bigram_lm_scores_frozen_vocab_oov(spark):
    from cell_kn_mvp_etl_ontologies_spark.operators.text_analysis import (
        bigram_lm_scores,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma zzz")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [("alpha", "beta", 4), ("beta", "gamma", 2)], "w1 string, w2 string, freq long"
    )
    b1 = spark.createDataFrame(
        [("alpha", 8), ("beta", 2)], "tok string, freq long"
    )
    row = bigram_lm_scores(df, "text", "doc_id", b2, b1).collect()[0]
    # (alpha,beta): pair 2, cond 2-3=-1; (beta,gamma): pair 1, cond 1-1=0;
    # (gamma,zzz): OOV
    assert row.n_bigrams == 3 and row.oov_bigrams == 1
    assert row.pair_bits == 3 and row.cond_bits == -1


def test_label_propagation_python_reference_and_two_cliques(spark):
    """label_propagation matches a python reference of the same synchronous
    vote (self-loop damping, (count DESC, label ASC) ties) and separates
    two cliques joined by one bridge edge."""
    from collections import Counter, defaultdict

    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import label_propagation

    cl1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    cl2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    raw = cl1 + cl2 + [(4, 10)]  # bridge
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r.v: r.lab for r in label_propagation(edges, n_rounds=4).collect()}

    adj = defaultdict(set)
    for a, b in raw:
        adj[a].add(b)
        adj[b].add(a)
    for v in list(adj):
        adj[v].add(v)  # the unit self-loop
    lab = {v: v for v in adj}
    for _ in range(4):
        nxt = {}
        for v in adj:
            c = Counter(lab[n] for n in adj[v])
            nxt[v] = min(c, key=lambda L: (-c[L], L))
        lab = nxt
    assert got == lab
    # the two cliques carry distinct labels
    l1 = {got[v] for v in range(5)}
    l2 = {got[v] for v in range(10, 15)}
    assert len(l1) == 1 and len(l2) == 1 and l1 != l2
