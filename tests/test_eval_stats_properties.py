"""Property-based tests (hypothesis) for operators/eval_stats.py.

Each property checks the DataFrame operator against an independent pure-
python reimplementation on GENERATED inputs — the catalog gate pins one
dataset; these pin the algebra.  Examples are kept small (each costs one
Spark job) per the test_properties.py budget doctrine.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cell_kn_mvp_etl_ontologies_spark.operators.eval_stats import (
    RBO_WEIGHTS_PPM,
    largest_remainder_allocation,
    rank_biased_overlap_topk,
    wilcoxon_signed_rank,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@SETTINGS
@given(
    weights=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=10**6),
)
def test_largest_remainder_properties(spark, weights, budget):
    """Σalloc = budget exactly; every row within 1 of its real quota;
    extras go to the largest remainders."""
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "k long, w long"
    )
    rows = largest_remainder_allocation(df, "k", "w", budget).collect()
    total = sum(weights)
    assert sum(r.alloc for r in rows) == budget
    for r in rows:
        w = weights[r.k]
        assert r.base_alloc == budget * w // total
        assert abs(r.alloc - budget * w / total) < 1
        assert r.extra in (0, 1)
    # the chosen extras are exactly the top-(n_extra) remainders under
    # the (rem desc, key asc) order
    n_extra = budget - sum(r.base_alloc for r in rows)
    order = sorted(rows, key=lambda r: (-r.rem_num, r.k))
    assert [r.extra for r in order] == [1] * n_extra + [0] * (len(rows) - n_extra)


@SETTINGS
@given(
    diffs=st.lists(
        st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=40
    )
)
def test_wilcoxon_properties(spark, diffs):
    """W⁺₂ matches the direct midrank computation; W⁺₂ + W⁻₂ = n(n+1)."""
    df = spark.createDataFrame([(d,) for d in diffs], "d long")
    out = wilcoxon_signed_rank(df, "d").collect()
    ds = [d for d in diffs if d != 0]
    if not ds:
        assert out == [] or out[0].n_eff in (0, None)
        return
    [r] = out
    cnt = Counter(abs(d) for d in ds)
    r2, cum = {}, 0
    for v in sorted(cnt):
        r2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    w_plus2 = sum(r2[abs(d)] for d in ds if d > 0)
    n = len(ds)
    assert (r.n_eff, r.w_plus2) == (n, w_plus2)
    assert r.w_plus2 + r.w_minus2 == n * (n + 1)
    assert r.shift_num4 == 2 * w_plus2 - n * (n + 1)


@SETTINGS
@given(
    scores=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_rbo_properties(spark, scores):
    """RBO matches the direct prefix-overlap computation; bounded by the
    truncated cap; identical rankers ⇒ exactly the cap (when n ≥ 10)."""
    rows = [(0, i, a, b) for i, (a, b) in enumerate(scores)]
    df = spark.createDataFrame(rows, "g long, item long, a long, b long")
    [r] = rank_biased_overlap_topk(df, "g", "item", "a", "b").collect()
    ra = {item: i + 1 for i, (_, item, a, b) in enumerate(
        sorted(rows, key=lambda t: (-t[2], t[1])))}
    rb = {item: i + 1 for i, (_, item, a, b) in enumerate(
        sorted(rows, key=lambda t: (-t[3], t[1])))}
    want = 0
    for d, w in RBO_WEIGHTS_PPM:
        top_a = {i for i, rk in ra.items() if rk <= d}
        top_b = {i for i, rk in rb.items() if rk <= d}
        want += w * len(top_a & top_b) // d
    assert r.rbo_ppm_trunc == want
    assert 0 <= r.rbo_ppm_trunc <= 651320
    # self-agreement hits the truncated cap once both prefixes saturate
    [same] = rank_biased_overlap_topk(df, "g", "item", "a", "a").collect()
    assert same.rbo_ppm_trunc == sum(
        w * min(d, len(rows)) // d for d, w in RBO_WEIGHTS_PPM
    )
    if len(rows) >= 10:
        assert same.rbo_ppm_trunc == 651320


@SETTINGS
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=-500, max_value=500),
        ),
        min_size=2,
        max_size=40,
    ),
    width=st.integers(min_value=1, max_value=200),
)
def test_kendall_bucketed_census_matches_brute_force(spark, pts, width):
    """The bucketed-x + strip decomposition must reproduce the exact O(n²)
    census for ANY point set and ANY bucket width (incl. width=1 —
    all-strip — and width > max(x) — all-cross)."""
    from cell_kn_mvp_etl_ontologies_spark.operators.eval_stats import (
        kendall_tau_census_bucketed,
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pts)], "rid long, x long, y long"
    )
    [r] = kendall_tau_census_bucketed(df, "rid", "x", "y", width).collect()
    conc = disc = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            s = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            conc += s > 0
            disc += s < 0
    n = len(pts)
    assert (r.n_pairs, r.n_conc, r.n_disc) == (n * (n - 1) // 2, conc, disc)
    assert r.n_tied == n * (n - 1) // 2 - conc - disc


def test_kendall_bucketed_degenerate_n_explicit_null(spark):
    """ADVICE r9: on an empty or 1-row input tau_a_ppm must be an EXPLICIT
    NULL (the eval_cochran_q guard pattern), never an engine-divergent
    division by zero; the census columns stay well-defined zeros."""
    from cell_kn_mvp_etl_ontologies_spark.operators.eval_stats import (
        kendall_tau_census_bucketed,
    )

    for rows in ([], [(0, 3, 7)]):
        df = spark.createDataFrame(rows, "rid long, x long, y long")
        [r] = kendall_tau_census_bucketed(df, "rid", "x", "y", 10).collect()
        assert r.tau_a_ppm is None
        assert (r.n_pairs, r.n_conc, r.n_disc, r.n_tied) == (0, 0, 0, 0)


def test_largest_remainder_rejects_nonpositive_weight_total(spark):
    """ADVICE r9: apportioning over an empty or all-zero weight column must
    raise LOUDLY (assert_true) instead of Spark silently emitting NULL
    quotas while DuckDB errors."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    for rows in ([], [(0, 0), (1, 0)]):
        df = spark.createDataFrame(rows, "k long, w long")
        out = largest_remainder_allocation(df, "k", "w", 100)
        with pytest.raises(
            (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException),
            match="weight total must be",
        ):
            out.collect()
