"""Property-based pins for the round-12 frontier9 operators: random inputs
vs exact Python replays — the adversarial layer the fixed-corpus gates and
unit pins can't reach (hypothesis hunts the tie/boundary cases)."""

from __future__ import annotations

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
            st.sampled_from(["u1", "u2"]),  # user
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=-500, max_value=500),  # daily cents delta
        ),
        min_size=1,
        max_size=40,
    )
)
def test_max_drawdown_property(spark, rows):
    """Cumsum/running-peak drawdown equals the Python path replay on random
    per-day deltas with negatives, duplicate days (which must FOLD — the
    IVM census contract), and single-day users."""
    from collections import defaultdict

    df = spark.createDataFrame(rows, "user_id string, day long, v_c long")
    daily = df.groupBy("user_id", "day").agg(F.sum("v_c").cast("long").alias("v_c"))
    w = Window.partitionBy("user_id").orderBy("day")
    curve = daily.select("user_id", "day", F.sum("v_c").over(w).alias("equity"))
    peaks = curve.select(
        "user_id",
        "equity",
        F.max("equity").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("peak"),
    )
    got = {
        r.user_id: (r.n_days, r.peak_c, r.dd)
        for r in peaks.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max("peak").alias("peak_c"),
            F.max(F.col("peak") - F.col("equity")).alias("dd"),
        )
        .collect()
    }
    acc: dict = defaultdict(lambda: defaultdict(int))
    for u, d, v in rows:
        acc[u][d] += v
    for u, days in acc.items():
        eq, peak, best_peak, dd = 0, None, None, 0
        for d in sorted(days):
            eq += days[d]
            peak = eq if peak is None else max(peak, eq)
            dd = max(dd, peak - eq)
            best_peak = peak if best_peak is None else max(best_peak, peak)
        assert got[u] == (len(days), best_peak, dd), u


@SETTINGS
@given(
    ys=st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=25)
)
def test_pettitt_identity_property(spark, ys):
    """The A_t − B_t pair-frame recursion equals the O(n²) textbook U_t on
    random series with heavy ties (values 0..30 over ≤25 points)."""
    rows = [(i, y) for i, y in enumerate(ys)]
    daily = spark.createDataFrame(rows, "day long, y long")
    a_side = daily.select(F.col("day").alias("d1"), F.col("y").alias("y1"))
    b_side = daily.select(F.col("day").alias("d2"), F.col("y").alias("y2"))
    pairs = a_side.join(b_side, F.col("d2") > F.col("d1")).select(
        "d1",
        "d2",
        F.when(F.col("y2") > F.col("y1"), 1)
        .when(F.col("y2") < F.col("y1"), -1)
        .otherwise(0)
        .alias("s"),
    )
    a_t = pairs.groupBy(F.col("d1").alias("day")).agg(F.sum("s").alias("a"))
    b_t = pairs.groupBy(F.col("d2").alias("day")).agg(F.sum("s").alias("b"))
    u = (
        daily.join(a_t, on="day", how="left")
        .join(b_t, on="day", how="left")
        .select(
            "day",
            F.sum(F.coalesce(F.col("a"), F.lit(0)) - F.coalesce(F.col("b"), F.lit(0)))
            .over(Window.orderBy("day"))
            .alias("u_t"),
        )
    )
    got = {r.day: r.u_t for r in u.collect()}
    n = len(ys)
    for t in range(n):
        want = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        assert got[t] == want, t


@SETTINGS
@given(
    toks=st.lists(
        st.tuples(
            st.sampled_from(["d1", "d2"]),
            st.lists(st.sampled_from("abc"), min_size=0, max_size=12),
            st.lists(st.sampled_from("abc"), min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    )
)
def test_bleu_clipping_property(spark, toks):
    """Clipped unigram/bigram matches equal the Counter replay on random
    tiny vocab sequences (maximal clipping pressure: 3 letters force
    repeated grams)."""
    from collections import Counter

    rows = [(d, " ".join(c), " ".join(r)) for d, c, r in toks]
    docs = spark.createDataFrame(rows, "doc_id string, cand string, ref string")

    def tok_frame(col):
        return docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(col), r"\s+")).alias("i", "tok"),
        ).filter(F.col("tok") != "")

    def gram_census(col):
        t = tok_frame(col)
        uni = t.select(F.lit(1).alias("n"), "doc_id", F.col("tok").alias("g"))
        nxt = t.select(
            F.col("doc_id").alias("doc_id2"),
            F.col("i").alias("i2"),
            F.col("tok").alias("tok2"),
        )
        bi = t.join(
            nxt, (F.col("doc_id") == F.col("doc_id2")) & (F.col("i2") == F.col("i") + 1)
        ).select(F.lit(2).alias("n"), "doc_id", F.concat_ws(" ", "tok", "tok2").alias("g"))
        return (
            uni.unionByName(bi)
            .groupBy("n", "doc_id", "g")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )

    cg = gram_census("cand")
    rg = gram_census("ref").select("n", "doc_id", "g", F.col("c").alias("rc"))
    got = {
        r.n: (r.m, r.t)
        for r in cg.join(rg, on=["n", "doc_id", "g"], how="left")
        .groupBy("n")
        .agg(
            F.sum(F.least("c", F.coalesce("rc", F.lit(0)))).alias("m"),
            F.sum("c").alias("t"),
        )
        .collect()
    }
    want = {1: [0, 0], 2: [0, 0]}
    for _, cand, ref in toks:
        for n in (1, 2):
            cgp = Counter(tuple(cand[i : i + n]) for i in range(len(cand) - n + 1))
            rgp = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
            want[n][0] += sum(min(c, rgp.get(g, 0)) for g, c in cgp.items())
            want[n][1] += sum(cgp.values())
    for n in (1, 2):
        if want[n][1] == 0:
            assert n not in got
        else:
            assert got[n] == tuple(want[n]), n


@SETTINGS
@given(
    items=st.lists(st.integers(min_value=1, max_value=600), min_size=1, max_size=30)
)
def test_lpt_beats_or_ties_roundrobin_makespan(spark, items):
    """LPT's makespan (max bin load) is <= round-robin's on random items —
    the 'balanced' in balanced sharding, checked against the dumbest
    correct alternative; plus the Python replay of the assignment."""
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier9 import _LPT_BINS

    rows = [(0, i, t) for i, t in enumerate(items)]
    docs = spark.createDataFrame(rows, "grp long, doc_id long, tokens long")
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tokens", "doc_id"], ascending=[False, True]).reset_index(
            drop=True
        )
        loads = [0] * _LPT_BINS
        bins = []
        for t in pdf["tokens"].astype("int64"):
            k = min(range(_LPT_BINS), key=lambda i: (loads[i], i))
            loads[k] += int(t)
            bins.append(k + 1)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["grp", "doc_id", "tokens", "bin"]]

    schema = StructType(
        [
            StructField("grp", LongType()),
            StructField("doc_id", LongType()),
            StructField("tokens", LongType()),
            StructField("bin", LongType()),
        ]
    )
    out = docs.groupBy("grp").applyInPandas(assign, schema=schema).collect()
    loads = [0] * _LPT_BINS
    srt = sorted(items, reverse=True)
    order = sorted(range(len(items)), key=lambda i: (-items[i], i))
    expect = {}
    for i in order:
        k = min(range(_LPT_BINS), key=lambda j: (loads[j], j))
        loads[k] += items[i]
        expect[i] = k + 1
    for r in out:
        assert r.bin == expect[r.doc_id], r
    rr = [0] * _LPT_BINS
    for i, t in enumerate(srt):
        rr[i % _LPT_BINS] += t
    assert max(loads) <= max(rr)


@SETTINGS
@given(
    vals=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=60)
)
def test_iqr_census_face_equals_row_rank(spark, vals):
    """The census-ranked quartile face (cumulative counts) equals the
    row_number-over-exploded-rows quartile on random value multisets —
    the identity the stream_iqr_maintain read face relies on."""
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "event_type string, v_c long")
    # row-rank quartile (the batch operator's shape)
    w = Window.partitionBy("event_type").orderBy("v_c")
    ranked = df.select(
        "event_type",
        "v_c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    q_row = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.greatest(F.lit(1), F.expr("(n + 1) DIV 4")), F.col("v_c"))
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.expr("(3 * (n + 1)) DIV 4")),
                F.col("v_c"),
            )
        ).alias("q3"),
    ).collect()[0]
    # census-rank quartile (the IVM read face's shape)
    census = df.groupBy("event_type", "v_c").agg(F.count(F.lit(1)).alias("cnt"))
    cum = census.select(
        "event_type",
        "v_c",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    q_cen = cum.groupBy("event_type").agg(
        F.max(
            F.when(
                (F.col("cum") - F.col("cnt") < F.greatest(F.lit(1), F.expr("(n + 1) DIV 4")))
                & (F.greatest(F.lit(1), F.expr("(n + 1) DIV 4")) <= F.col("cum")),
                F.col("v_c"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                (
                    F.col("cum") - F.col("cnt")
                    < F.greatest(F.lit(1), F.expr("(3 * (n + 1)) DIV 4"))
                )
                & (F.greatest(F.lit(1), F.expr("(3 * (n + 1)) DIV 4")) <= F.col("cum")),
                F.col("v_c"),
            )
        ).alias("q3"),
    ).collect()[0]
    assert (q_row.q1, q_row.q3) == (q_cen.q1, q_cen.q3)
    # and both equal the sorted-list definition
    s = sorted(vals)
    n = len(s)
    assert q_row.q1 == s[max(1, (n + 1) // 4) - 1]
    assert q_row.q3 == s[max(1, (3 * (n + 1)) // 4) - 1]
