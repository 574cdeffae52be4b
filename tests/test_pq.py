"""Product-quantization operators (operators/pq.py): codebook training,
encoding, asymmetric-distance scoring, and the IVF-PQ serving composition."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
    ivf_pq_topk,
    pq_adc_lut,
    pq_adc_topk,
    pq_encode,
    pq_subvector_rows,
    pq_train_codebooks,
)


def _vecs(spark, n, d=8, seed=5):
    rnd = random.Random(seed)
    rows = [(i, [rnd.randrange(-16, 17) / 16.0 for _ in range(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def _fixed_codebooks(spark, corpus, m, ksub):
    """Codewords = quantized subvectors of the first ksub corpus vectors —
    the deterministic no-training codebook the catalog oracle replays."""
    subs = pq_subvector_rows(corpus.filter(F.col("vec_id") < ksub), m)
    return subs.select(
        "sub", F.col("id").cast("int").alias("cell"), F.col("sv").alias("cv")
    )


def test_pq_encode_exact_codes_when_vectors_are_codewords(spark):
    """With ksub >= |corpus| and codewords = the corpus subvectors, every
    vector must encode to its own id in every subspace (dist 0 beats all,
    ties impossible across distinct subvectors; equal subvectors tie-break
    to the smallest cell — both cases asserted)."""
    corpus = _vecs(spark, 6)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=6)
    codes = {r.t_id: list(r.codes) for r in pq_encode(corpus, books, m=2).collect()}
    subs = {
        (r.id, r.sub): list(r.sv) for r in pq_subvector_rows(corpus, 2).collect()
    }
    for t_id, cs in codes.items():
        for sub, code in enumerate(cs):
            # the chosen codeword's subvector must equal the vector's own
            assert subs[(code, sub)] == subs[(t_id, sub)]


def test_pq_adc_equals_exact_distance_at_full_codebook(spark):
    """When every corpus vector is its own codeword, ADC distance IS the
    exact quantized squared-L2 — so PQ top-k must equal brute-force
    quantized L2 top-k exactly."""
    corpus = _vecs(spark, 10)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=10)
    codes = pq_encode(corpus, books, m=2)
    q = corpus.filter(F.col("vec_id") < 3)
    got = {
        (r.q_id, r.rnk): (r.t_id, r.adc_dist)
        for r in pq_adc_topk(q, codes, books, k=4, m=2).collect()
    }
    # brute-force reference in python over the quantized vectors
    subs = {(r.id, r.sub): list(r.sv) for r in pq_subvector_rows(corpus, 2).collect()}
    n = corpus.count()
    qv = {i: subs[(i, 0)] + subs[(i, 1)] for i in range(n)}
    for qid in range(3):
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv[qid], qv[t])), t)
            for t in qv
            if t != qid
        )[:4]
        for rnk, (d, t) in enumerate(dists, start=1):
            assert got[(qid, rnk)] == (t, d)


def test_pq_trained_codebooks_reduce_quantization_error(spark):
    """Trained per-subspace k-means codebooks must not quantize worse than
    the naive first-k fixed codebooks (global encode distance sum)."""
    corpus = _vecs(spark, 40)
    fixed = _fixed_codebooks(spark, corpus, m=2, ksub=4)
    trained = pq_train_codebooks(corpus, m=2, ksub=4, n_iter=2)

    def total_err(books):
        subs = pq_subvector_rows(corpus, 2)
        scored = subs.join(F.broadcast(books), on="sub").select(
            "id", "sub",
            F.aggregate(
                F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"), lambda a, x: a + x,
            ).alias("d"),
        )
        return (
            scored.groupBy("id", "sub").agg(F.min("d").alias("d"))
            .agg(F.sum("d")).collect()[0][0]
        )

    assert total_err(trained) <= total_err(fixed)


def test_ivf_pq_full_probe_equals_plain_adc(spark):
    """With nprobe = n_cells the IVF routing prunes nothing, so ivf_pq_topk
    must equal pq_adc_topk exactly (same codes, same LUT, same order)."""
    corpus = _vecs(spark, 30)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=5)
    cents = corpus.filter(F.col("vec_id") < 3)  # 3 IVF cells
    codes = pq_encode(corpus, books, m=2)
    q = corpus.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, pq_adc_topk(q, codes, books, k=3, m=2).collect()))
    b = sorted(map(tuple, ivf_pq_topk(q, corpus, cents, books, k=3, nprobe=3, m=2).collect()))
    assert a == b


def test_ivf_pq_prebuilt_corpus_cells_equals_inline(spark):
    """ADVICE r5: serving with the OFFLINE corpus-cells artifact (the
    ivf_assign output persisted next to the codes) must be bit-identical
    to the inline re-assignment it replaces."""
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import ivf_assign

    corpus = _vecs(spark, 30)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=5)
    cents = corpus.filter(F.col("vec_id") < 3)
    codes = pq_encode(corpus, books, m=2)
    cells = ivf_assign(corpus, cents, nprobe=1).select(
        F.col("vec_id").alias("t_id"), "cell"
    )
    q = corpus.filter(F.col("vec_id") < 4)
    inline = sorted(map(tuple, ivf_pq_topk(
        q, corpus, cents, books, k=3, nprobe=2, m=2, codes=codes
    ).collect()))
    prebuilt = sorted(map(tuple, ivf_pq_topk(
        q, corpus, cents, books, k=3, nprobe=2, m=2, codes=codes, corpus_cells=cells
    ).collect()))
    assert inline == prebuilt and len(inline) > 0


def test_pq_dimension_validation(spark):
    import pytest as _pytest

    corpus = _vecs(spark, 4, d=6)
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train_codebooks(corpus, m=4, ksub=2)


def test_pq_encode_explicit_subdim_raises_on_wrong_dim(spark):
    """ADVICE r5: the explicit-subdim path (streaming, where empty batches
    forbid the driver-side probe) must raise loudly on a wrong-dimension
    vector instead of emitting short F.slice subvectors whose NULL
    distances turn into arbitrary min_by codes."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    corpus = _vecs(spark, 4, d=8)
    books = _fixed_codebooks(spark, corpus, m=4, ksub=2)
    # correct explicit subdim: identical to the inferred path
    ok = pq_encode(corpus, books, m=4, subdim=2).orderBy("t_id").collect()
    inferred = pq_encode(corpus, books, m=4).orderBy("t_id").collect()
    assert [tuple(r.codes) for r in ok] == [tuple(r.codes) for r in inferred]
    # wrong subdim: per-row guard fires at execution time
    with _pytest.raises(SparkRuntimeException, match="pq_subvector_rows"):
        pq_encode(corpus, books, m=4, subdim=3).collect()


def test_pq_rerank_recovers_exact_topk_when_shortlist_covers(spark):
    """With shortlist >= |corpus| the re-rank stage sees every candidate,
    so the output must equal brute-force exact quantized-L2 top-k even
    with a terrible (2-codeword) codebook."""
    from cell_kn_mvp_etl_ontologies_spark.operators.pq import pq_adc_rerank_topk

    corpus = _vecs(spark, 15)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=2)  # deliberately bad
    codes = pq_encode(corpus, books, m=2)
    q = corpus.filter(F.col("vec_id") < 3)
    got = {
        (r.q_id, r.rnk): (r.t_id, r.d)
        for r in pq_adc_rerank_topk(q, corpus, codes, books, k=3, shortlist=14, m=2).collect()
    }
    subs = {(r.id, r.sub): list(r.sv) for r in pq_subvector_rows(corpus, 2).collect()}
    qv = {i: subs[(i, 0)] + subs[(i, 1)] for i in range(15)}
    for qid in range(3):
        ref = sorted(
            (sum((a - b) ** 2 for a, b in zip(qv[qid], qv[t])), t)
            for t in qv if t != qid
        )[:3]
        for rnk, (d, t) in enumerate(ref, start=1):
            assert got[(qid, rnk)] == (t, d)


def test_binarize_sign_and_hamming_match_python_reference(spark):
    """Word packing (32-bit, non-negative) and xor+bit_count distances
    pinned against a pure-python reference on float32-rounded inputs."""
    import struct

    from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
        binarize_sign,
        hamming_topk,
    )

    rnd = random.Random(2)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    bw = {r.id: list(r.words) for r in binarize_sign(df).collect()}

    def ref_words(v):
        out = []
        for w in range(2):
            acc = 0
            for i, x in enumerate(v[w * 32:(w + 1) * 32]):
                if struct.unpack("f", struct.pack("f", x))[0] > 0:
                    acc |= 1 << i
            out.append(acc)
        return out

    assert all(w >= 0 for ws in bw.values() for w in ws)
    assert all(bw[i] == ref_words(rows[i][1]) for i in range(20))

    got = {
        (r.q_id, r.rnk): (r.t_id, r.hamming)
        for r in hamming_topk(df.filter(F.col("vec_id") < 3), df, k=4).collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    for q in range(3):
        ref = sorted((ham(bw[q], bw[t]), t) for t in bw if t != q)[:4]
        for rnk, (d, t) in enumerate(ref, start=1):
            assert got[(q, rnk)] == (t, d)


# -- hypothesis properties -------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PQ_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@PQ_SETTINGS
@given(
    data=st.lists(
        st.lists(st.integers(-32, 32).map(lambda v: v / 16.0), min_size=8, max_size=8),
        min_size=4, max_size=12, unique_by=lambda v: tuple(v),
    ),
    m=st.sampled_from([1, 2, 4]),
)
def test_pq_encode_and_adc_match_python_reference(spark, data, m):
    """For ANY corpus and subspace count: codes are the (dist, cell)-argmin
    per subspace and ADC totals are the exact sums of subspace LUT
    distances — against an independent pure-Python PQ."""
    rows = [(i, v) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    ksub = min(3, len(rows))
    books = _fixed_codebooks(spark, df, m=m, ksub=ksub)
    codes = {r.t_id: list(r.codes) for r in pq_encode(df, books, m=m).collect()}

    import math

    subd = 8 // m
    # HALF_UP, not python round() (half-even) — the same divergence class
    # the r4 ADVICE caught in the numpy twin applies to test references too
    half_up = lambda x: int(math.copysign(math.floor(abs(x * 1000) + 0.5), x))
    qv = {i: [half_up(x) for x in v] for i, v in rows}

    def subvec(i, s):
        return qv[i][s * subd:(s + 1) * subd]

    def dist(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    for i in qv:
        for s in range(m):
            best = min((dist(subvec(i, s), subvec(c, s)), c) for c in range(ksub))
            assert codes[i][s] == best[1]

    adc = {
        (r.q_id, r.t_id): r.adc_dist
        for r in pq_adc_topk(
            df.filter(F.col("vec_id") < 2), pq_encode(df, books, m=m), books,
            k=len(rows), m=m,
        ).collect()
    }
    for (q, t), got in adc.items():
        ref = sum(dist(subvec(q, s), subvec(codes[t][s], s)) for s in range(m))
        assert got == ref


@PQ_SETTINGS
@given(
    data=st.lists(
        st.lists(
            st.floats(-1, 1, allow_nan=False, width=32),
            min_size=32, max_size=32,
        ),
        min_size=3, max_size=8,
    ),
)
def test_hamming_packing_property(spark, data):
    """For ANY float vectors: the packed words reproduce the sign bits and
    pairwise Hamming distances equal the python popcount reference."""
    import struct

    from cell_kn_mvp_etl_ontologies_spark.operators.pq import binarize_sign

    rows = [(i, v) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {r.id: list(r.words) for r in binarize_sign(df).collect()}
    for i, v in rows:
        acc = 0
        for b, x in enumerate(v):
            if struct.unpack("f", struct.pack("f", x))[0] > 0:
                acc |= 1 << b
        assert got[i] == [acc]


def test_hamming_handles_non_word_multiple_dims(spark):
    """40 dims -> two words (32 + 8 bits); the partial final word must pack
    only the remaining dims and distances stay exact."""
    from cell_kn_mvp_etl_ontologies_spark.operators.pq import binarize_sign

    rows = [
        (0, [1.0] * 40),
        (1, [1.0] * 32 + [-1.0] * 8),
        (2, [-1.0] * 40),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {r.id: list(r.words) for r in binarize_sign(df).collect()}
    assert got[0] == [(1 << 32) - 1, (1 << 8) - 1]
    assert got[1] == [(1 << 32) - 1, 0]
    assert got[2] == [0, 0]


def test_pq_encode_vectorized_bit_identical(spark):
    """The matmul encode twin must equal the expression encode exactly,
    including (dist, cell) tie-breaks (duplicate codewords planted)."""
    from cell_kn_mvp_etl_ontologies_spark.operators.pq import pq_encode_vectorized

    corpus = _vecs(spark, 40)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=5)
    # plant a duplicate codeword with a HIGHER cell id: ties must keep
    # the smaller cell in both paths
    dup = books.filter(F.col("cell") == 0).select(
        "sub", (F.col("cell") + 100).alias("cell"), "cv"
    )
    books = books.unionByName(dup)
    a = {r.t_id: list(r.codes) for r in pq_encode(corpus, books, m=2).collect()}
    b = {r.t_id: list(r.codes) for r in pq_encode_vectorized(corpus, books, m=2).collect()}
    assert a == b


def test_pq_empty_inputs_fail_loudly_or_yield_empty(spark):
    """Empty corpus: subvector/train/encode raise a clear error (the dim
    probe needs a row — silent empty output would hide an upstream bug);
    ADC over an EMPTY codes frame yields an empty result, not a crash."""
    import pytest as _pytest

    empty = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")
    with _pytest.raises(ValueError, match="empty input"):
        pq_subvector_rows(empty, m=2)
    with _pytest.raises(ValueError, match="empty input"):
        pq_train_codebooks(empty, m=2, ksub=2)
    with _pytest.raises(ValueError, match="empty input"):
        pq_encode(empty, _fixed_codebooks(spark, _vecs(spark, 5), m=2, ksub=3), m=2)
    corpus = _vecs(spark, 5)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=3)
    no_codes = pq_encode(corpus, books, m=2).filter(F.lit(False))
    q = corpus.filter(F.col("vec_id") < 2)
    assert pq_adc_topk(q, no_codes, books, k=3, m=2).count() == 0


def test_hamming_rerank_recovers_exact_topk_when_shortlist_covers(spark):
    """With shortlist >= |corpus|-1 the re-rank sees every candidate, so
    the output must equal similarity_topk(quantized=True) exactly."""
    from cell_kn_mvp_etl_ontologies_spark.operators.pq import hamming_rerank_topk
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import similarity_topk

    corpus = _vecs(spark, 20, d=32, seed=9)
    q = corpus.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, similarity_topk(q, corpus, k=4, quantized=True).collect()))
    b = sorted(map(tuple, hamming_rerank_topk(q, corpus, k=4, shortlist=19).collect()))
    assert a == b


def test_ivf_pq_routed_bit_identical_to_expression_path(spark):
    """Round 6: the cogrouped-ADC routed serving path must equal
    ivf_pq_topk exactly — same candidates, same int64 ADC distances, same
    (adc ASC, t_id ASC) order — at partial AND full probe coverage."""
    from cell_kn_mvp_etl_ontologies_spark.operators.pq import ivf_pq_topk_routed
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import ivf_assign

    corpus = _vecs(spark, 40)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=5)
    cents = corpus.filter(F.col("vec_id") < 3)
    codes = pq_encode(corpus, books, m=2)
    cells = ivf_assign(corpus, cents, nprobe=1).select(
        F.col("vec_id").alias("t_id"), "cell"
    )
    index_codes = cells.join(codes, on="t_id").select("cell", "t_id", "codes")
    q = corpus.filter(F.col("vec_id") < 5)
    for nprobe in (1, 2, 3):
        a = sorted(map(tuple, ivf_pq_topk(
            q, corpus, cents, books, k=3, nprobe=nprobe, m=2,
            codes=codes, corpus_cells=cells,
        ).collect()))
        b = sorted(map(tuple, ivf_pq_topk_routed(
            q, index_codes, cents, books, k=3, nprobe=nprobe, m=2,
        ).collect()))
        assert a == b and len(a) > 0, f"diverged at nprobe={nprobe}"


def test_pq_rerank_routed_bit_identical_to_expression_shortlist(spark):
    """Round 7 (VERDICT r6 #2): serving the ADC shortlist through the
    routed cogroup (nprobe = n_cells probes every cell, so the shortlist
    is the FULL-ADC shortlist) must reproduce pq_adc_rerank_topk exactly —
    shortlist selection, exact re-rank distances, and rank order."""
    from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
        pq_adc_rerank_topk,
        pq_adc_rerank_topk_routed,
    )
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import ivf_assign

    corpus = _vecs(spark, 40)
    books = _fixed_codebooks(spark, corpus, m=2, ksub=5)
    cents = corpus.filter(F.col("vec_id") < 3)
    codes = pq_encode(corpus, books, m=2)
    cells = ivf_assign(corpus, cents, nprobe=1).select(
        F.col("vec_id").alias("t_id"), "cell"
    )
    index_codes = cells.join(codes, on="t_id").select("cell", "t_id", "codes")
    q = corpus.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, pq_adc_rerank_topk(
        q, corpus, codes, books, k=3, shortlist=8, m=2,
    ).collect()))
    b = sorted(map(tuple, pq_adc_rerank_topk_routed(
        q, corpus, index_codes, cents, books, k=3, shortlist=8, m=2,
    ).collect()))
    assert a == b and len(a) > 0


def test_opq_variance_permutation_properties(spark):
    """The balanced-variance permutation is a true permutation, allocates
    the variance ranks round-robin across subspaces, and matches a plain
    python reference on the same quantized ints."""
    import numpy as np

    from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
        opq_variance_permutation,
        permute_vec,
    )
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import quantize_np

    corpus = _vecs(spark, 30, d=8, seed=11)
    m = 2
    perm = opq_variance_permutation(corpus, m=m)
    assert sorted(perm) == list(range(8))

    # python reference: integer variance numerator, (-var, dim) order,
    # rank r -> subspace r % m slot r // m
    rows = corpus.collect()
    V = np.stack([quantize_np(np.array(r.embedding, dtype=np.float64)) for r in rows])
    n = V.shape[0]
    var_num = n * (V.astype(object) ** 2).sum(axis=0) - (V.astype(object).sum(axis=0)) ** 2
    order = sorted(range(8), key=lambda i: (-var_num[i], i))
    subdim = 8 // m
    want = [order[(j % subdim) * m + (j // subdim)] for j in range(8)]
    assert perm == want

    # each contiguous block of the permuted vector holds ranks {s mod m}
    rank_of = {d: r for r, d in enumerate(order)}
    for j, d in enumerate(perm):
        assert rank_of[d] % m == j // subdim

    # permute_vec applies out[j] = in[perm[j]]
    got = corpus.select("vec_id", permute_vec(F.col("embedding"), perm).alias("p")).collect()
    by_id = {r.vec_id: r.embedding for r in rows}
    for r in got:
        src = by_id[r.vec_id]
        assert list(r.p) == [src[p] for p in perm]


def test_opq_exact_distances_invariant_under_permutation(spark):
    """Sanity of the A/B design: exact quantized L2 is permutation-
    invariant, so plain and OPQ recall audits share one ground truth."""
    import numpy as np

    from cell_kn_mvp_etl_ontologies_spark.operators.pq import (
        opq_variance_permutation,
        permute_vec,
    )
    from cell_kn_mvp_etl_ontologies_spark.operators.similarity import (
        quantize_vec,
        sq_dist_long,
    )

    corpus = _vecs(spark, 12, d=8, seed=3)
    perm = opq_variance_permutation(corpus, m=2)
    pm = corpus.select("vec_id", permute_vec(F.col("embedding"), perm).alias("embedding"))

    def dists(df):
        a = df.select(F.col("vec_id").alias("ai"), quantize_vec(F.col("embedding")).alias("va"))
        b = df.select(F.col("vec_id").alias("bi"), quantize_vec(F.col("embedding")).alias("vb"))
        out = a.join(b, F.col("ai") < F.col("bi")).select(
            "ai", "bi", sq_dist_long(F.col("va"), F.col("vb")).alias("d")
        )
        return {(r.ai, r.bi): r.d for r in out.collect()}

    assert dists(corpus) == dists(pm)
