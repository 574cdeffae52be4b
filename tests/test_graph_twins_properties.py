"""Property-based tests for the round-9 iterative graph twins
(plans/graph_query.py) on GENERATED graphs.

The catalog gates pin one slice and tests/test_frontier6.py pins
hand-built cases; these pin the algorithms against python references
(iterative Tarjan, memoized longest-path + reachability) on random
digraphs/DAGs.  Fixpoint runs cost several Spark jobs each, so example
counts are small (the test_properties.py budget doctrine).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
    dag_depth_frontier,
    strongly_connected_components_fb,
)

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _tarjan_scc(nodes, adj):
    """Iterative Tarjan; returns node -> min-member-of-its-SCC."""
    index = {}
    low = {}
    on_stack = set()
    stack = []
    label = {}
    counter = [0]
    for root in nodes:
        if root in index:
            continue
        work = [(root, iter(adj.get(root, ())))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj.get(w, ()))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
    return label


@SETTINGS
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_scc_fb_matches_tarjan_on_random_digraphs(spark, edges):
    """FW-BW coloring must recover Tarjan's exact SCC partition on any
    random digraph."""
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    adj: dict = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        nodes |= {a, b}
    want = _tarjan_scc(sorted(nodes), adj)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.scc_id
        for r in strongly_connected_components_fb(df).collect()
    }
    assert got == want


@SETTINGS
@given(
    raw=st.sets(
        st.tuples(
            st.integers(min_value=1, max_value=12),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dag_depth_frontier_matches_python_on_random_dags(spark, raw):
    """Depth (longest path to a root) and exact ancestor sets must match
    memoized python on any random DAG (edges oriented larger->smaller
    node, acyclic by construction)."""
    edges = [(c, p) for c, p in raw if p < c]
    if not edges:
        return
    parents: dict = {}
    nodes = set()
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
        nodes |= {c, p}

    import functools

    @functools.lru_cache(maxsize=None)
    def depth(v):
        return max((1 + depth(p) for p in parents.get(v, ())), default=0)

    @functools.lru_cache(maxsize=None)
    def anc(v):
        out = set()
        for p in parents.get(v, ()):
            out |= {p} | anc(p)
        return frozenset(out)

    df = spark.createDataFrame(edges, "child long, parent long")
    got = {
        r.node: (r.depth, r.anc_bm)
        for r in dag_depth_frontier(df).collect()
    }
    want = {
        v: (depth(v), sum(1 << a for a in anc(v))) for v in nodes
    }
    assert got == want


@SETTINGS
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_betweenness_bounded_matches_python_on_random_digraphs(spark, edges):
    """bounded betweenness (radius 6) must match a python BFS path-count
    computation on any random digraph."""
    from collections import defaultdict, deque

    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        betweenness_bounded,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    adj = defaultdict(list)
    nodes = set()
    for a, b in edges:
        adj[a].append(b)
        nodes |= {a, b}
    sigma = {}
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
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.betweenness_ppm, r.n_contribs)
        for r in betweenness_bounded(df).collect()
    }
    assert got == {n: tuple(w) for n, w in want.items()}


@SETTINGS
@given(
    raw=st.sets(
        st.tuples(
            # labels up to 180 — deliberately BEYOND the single-BIGINT
            # bitmap universe (< 63) that dag_depth_frontier guards, because
            # the bucketed widening existing for exactly this regime is the
            # property under test
            st.integers(min_value=0, max_value=180),
            st.integers(min_value=0, max_value=180),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dag_ancestors_bucketed_matches_python_beyond_bitmap_universe(spark, raw):
    """The bucketed (node, bucket, bm) ancestor rows must decode to the
    exact python ancestor sets on random DAGs whose labels exceed 63."""
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        dag_ancestors_bucketed,
    )

    edges = [(c, p) for c, p in raw if p < c]
    if not edges:
        return
    parents: dict = {}
    nodes = set()
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
        nodes |= {c, p}

    import functools

    @functools.lru_cache(maxsize=None)
    def anc(v):
        out = set()
        for p in parents.get(v, ()):
            out |= {p} | anc(p)
        return frozenset(out)

    df = spark.createDataFrame(edges, "child long, parent long")
    got: dict = {}
    for r in dag_ancestors_bucketed(df).collect():
        for i in range(62):
            if r.bm & (1 << i):
                got.setdefault(r.node, set()).add(r.bucket * 62 + i)
    want = {v: set(anc(v)) for v in nodes if anc(v)}
    assert got == want


@SETTINGS
@given(
    raw=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=180),
            st.integers(min_value=0, max_value=180),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lca_wu_palmer_bucketed_matches_python_beyond_bitmap_universe(spark, raw):
    """LCA node/depth and Wu-Palmer milli from the bucketed-bitmap
    production path must match brute-force python (deepest common
    ancestor-or-self, MIN-id tie-break) on >63-label random DAGs, for
    ALL ordered pairs of nodes."""
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        lca_wu_palmer_bucketed,
    )

    edges = [(c, p) for c, p in raw if p < c]
    if not edges:
        return
    parents: dict = {}
    nodes = set()
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
        nodes |= {c, p}

    import functools

    @functools.lru_cache(maxsize=None)
    def depth(v):
        return max((1 + depth(p) for p in parents.get(v, ())), default=0)

    @functools.lru_cache(maxsize=None)
    def anc_self(v):
        out = {v}
        for p in parents.get(v, ()):
            out |= anc_self(p)
        return frozenset(out)

    pairs = [(a, b) for a in nodes for b in nodes if a < b]
    want = {}
    for a, b in pairs:
        common = anc_self(a) & anc_self(b)
        if common:
            ld = max(depth(x) for x in common)
            ln = min(x for x in common if depth(x) == ld)
            wup = (
                2000 * ld // (depth(a) + depth(b))
                if depth(a) + depth(b) > 0
                else None
            )
            want[(a, b)] = (depth(a), depth(b), ln, ld, wup)
        else:
            want[(a, b)] = (depth(a), depth(b), None, None, None)

    df = spark.createDataFrame(edges, "child long, parent long")
    pdf = spark.createDataFrame(pairs, "n1 long, n2 long")
    got = {
        (r.n1, r.n2): (r.d1, r.d2, r.lca_node, r.lca_depth, r.wup_milli)
        for r in lca_wu_palmer_bucketed(df, pdf).collect()
    }
    assert got == want


def test_dag_ancestors_bucketed_exact_past_double_precision(spark):
    """ADVICE r10: the bucket used to be computed with DOUBLE division
    ((p / 62).cast('long')), which is lossy for ids >= 2^53.  Pin the
    integer floor-decomposition on a chain whose labels sit just past
    2^53, where the old float path misbuckets (2^53 + 1 is not
    representable as a double)."""
    from cell_kn_mvp_etl_ontologies_spark.plans.graph_query import (
        dag_ancestors_bucketed,
    )

    base = 2**53 + 1  # first integer double cannot represent
    # chain: base+124 -> base+62 -> base  (distinct buckets, huge labels)
    edges = [(base + 124, base + 62), (base + 62, base)]
    df = spark.createDataFrame(edges, "child long, parent long")
    got: dict = {}
    for r in dag_ancestors_bucketed(df).collect():
        for i in range(62):
            if r.bm & (1 << i):
                got.setdefault(r.node, set()).add(r.bucket * 62 + i)
    assert got == {
        base + 124: {base + 62, base},
        base + 62: {base},
    }
