"""Property-based pins for the round-11 frontier8 operators: random inputs
vs exact Python replays — the adversarial layer the fixed-corpus gates and
unit pins can't reach (hypothesis hunts the tie/boundary cases)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # group
            st.integers(min_value=-50, max_value=50),  # value
            st.integers(min_value=1, max_value=1000),  # weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_property(spark, rows):
    """The engine's 2·cw ≥ tw weighted median equals the Python definition
    (smallest value whose cumulative weight reaches half the total) on
    random groups with negative values, duplicate values, and heavy-tail
    weights."""
    from collections import defaultdict

    df = spark.createDataFrame(rows, "flag string, q long, w long")
    wq = df.groupBy("flag", "q").agg(F.sum("w").cast("long").alias("w"))
    w_cum = Window.partitionBy("flag").orderBy("q")
    cum = wq.select(
        "flag",
        "q",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(Window.partitionBy("flag")).alias("tw"),
    )
    got = {
        r.flag: r.m
        for r in cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("q").alias("m"))
        .collect()
    }
    acc: dict = defaultdict(lambda: defaultdict(int))
    for g, q, w in rows:
        acc[g][q] += w
    for g, wqd in acc.items():
        tw = sum(wqd.values())
        cw = 0
        for q in sorted(wqd):
            cw += wqd[q]
            if 2 * cw >= tw:
                assert got[g] == q
                break


@SETTINGS
@given(
    scored=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),  # score (narrow → many ties)
            st.integers(min_value=0, max_value=1),  # label
        ),
        min_size=4,
        max_size=60,
    ).filter(
        lambda xs: 2 <= sum(y for _, y in xs) and 2 <= sum(1 - y for _, y in xs)
    )
)
def test_delong_components_property(spark, scored):
    """The dominance-counted DeLong components equal the exact Fraction
    per-pair replay on random tie-heavy score/label sets."""
    df = spark.createDataFrame(scored, "score long, y long")
    grid = df.groupBy("score").agg(
        F.sum("y").cast("long").alias("kp"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("kn"),
    )
    w_up = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    w_dn = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = grid.select(
        "kp",
        "kn",
        F.coalesce(F.sum("kn").over(w_up), F.lit(0)).alias("nb"),
        F.coalesce(F.sum("kp").over(w_dn), F.lit(0)).alias("pa"),
    )
    row = cum.agg(
        F.sum(F.col("kp") * (2 * F.col("nb") + F.col("kn"))).alias("sum_d"),
        F.sum(
            F.col("kp") * (2 * F.col("nb") + F.col("kn")) * (2 * F.col("nb") + F.col("kn"))
        ).alias("sum_d2"),
        F.sum(F.col("kn") * (2 * F.col("pa") + F.col("kp"))).alias("sum_e"),
        F.sum(
            F.col("kn") * (2 * F.col("pa") + F.col("kp")) * (2 * F.col("pa") + F.col("kp"))
        ).alias("sum_e2"),
    ).collect()[0]
    pos = [s for s, y in scored if y == 1]
    neg = [s for s, y in scored if y == 0]
    d = [sum(2 for x in neg if x < p) + sum(1 for x in neg if x == p) for p in pos]
    e = [sum(2 for x in pos if x > q) + sum(1 for x in pos if x == q) for q in neg]
    assert row.sum_d == sum(d) and row.sum_d2 == sum(x * x for x in d)
    assert row.sum_e == sum(e) and row.sum_e2 == sum(x * x for x in e)
    # the Mann-Whitney identity the two sides must share
    assert Fraction(sum(d), 2 * len(neg) * len(pos)) == Fraction(
        sum(e), 2 * len(pos) * len(neg)
    )


@SETTINGS
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=40),
    budget=st.integers(min_value=300, max_value=600),
)
def test_ffd_property_never_worse_than_greedy_and_valid(spark, sizes, budget):
    """FFD (python reference shared with the operator) produces a VALID
    packing (no bin over budget unless a single item alone is) using no
    more bins than arrival-order next-fit, on random size mixes."""
    # python FFD (the applyInPandas kernel's exact logic)
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    fills: list[int] = []
    assign = {}
    for i in order:
        t = sizes[i]
        for b, f in enumerate(fills):
            if f + t <= budget:
                fills[b] += t
                assign[i] = b
                break
        else:
            fills.append(t)
            assign[i] = len(fills) - 1
    for b, f in enumerate(fills):
        members = [sizes[i] for i, bb in assign.items() if bb == b]
        assert f == sum(members)
        assert f <= budget or (len(members) == 1 and members[0] > budget)
    # next-fit in arrival order (pack_sequences_greedy semantics)
    nf_bins, fill = 1, 0
    for t in sizes:
        if fill > 0 and fill + t > budget:
            nf_bins += 1
            fill = 0
        fill += t
    assert len(fills) <= nf_bins


@SETTINGS
@given(
    hashes_a=st.sets(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=200),
    hashes_b=st.sets(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=200),
)
def test_kmv_merge_semilattice_property(spark, hashes_a, hashes_b):
    """KMV merge is a semilattice: merge(A, B) == merge(B, A) ==
    merge(merge(A, B), B) (commutative + idempotent), and equals the
    one-shot k-min of the union — the algebra behind the IVM twin's
    bundling-independence."""
    k = 16

    def kmin(s):
        return tuple(sorted(s)[:k])

    ab = kmin(set(kmin(hashes_a)) | set(kmin(hashes_b)))
    ba = kmin(set(kmin(hashes_b)) | set(kmin(hashes_a)))
    again = kmin(set(ab) | set(kmin(hashes_b)))
    oneshot = kmin(hashes_a | hashes_b)
    assert ab == ba == again == oneshot
