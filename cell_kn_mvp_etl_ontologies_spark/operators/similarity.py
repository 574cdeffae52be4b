"""Embedding similarity operators (SURVEY.md §2.12).

Brute-force cosine is the correctness baseline; the LSH-bucketed variant is
the scale path (random-hyperplane signatures shrink the candidate set from
O(N·Q) to per-bucket joins).  All math stays JVM-side: ``zip_with`` +
``aggregate`` over array columns — no Python in the hot path.

Determinism note: cross-engine float reduction differs (DuckDB's
list_dot_product on FLOAT[] accumulates in single precision), so the
oracle-checked variant quantizes to integers (exact, associative) and only
then divides in double — bit-identical across engines.  The default double
path is used for benchmarking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .windows import window_rank_topk


# The round-14 optimization round A/B'd a size-guarded UNROLLED fast path
# here (``CASE WHEN size(a)=d THEN a[0]*b[0]+... ELSE <hof> END`` for the
# known widths) and REVERTED it: the unroll multiplies references to its
# input columns (64 GetArrayItems + size() guards), and when the input is
# itself a derived expression — exactly the serving paths, where
# ``quantize_vec`` output feeds ``_dot_long`` through CollapseProject —
# the planner duplicates that subtree per reference.  Interleaved same-
# session A/B at the bench rows (tools/probe_r14_regress_ab.py):
# ann_ivf_80k 1.59 s (HOF) vs 6.38 s (unroll), ann_hamming_80k 1.61 vs
# 5.75, cosine_topk_80k a wash.  The HOF fold stays: one reference per
# input array, specialized evaluation loop.


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _dot_long(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def quantize_vec(v: Column, scale: int = 1000) -> Column:
    """array<float> -> array<long> of round(x*scale), HALF_UP (round half
    away from zero).  Dyadic embedding values DO land exactly on .5 after
    scaling (0.0625 * 1000 = 62.5 exactly), so the rounding mode is part of
    the cross-engine contract: Spark ``round`` and DuckDB ``round`` both
    round half away from zero, and every numpy twin must replicate that via
    ``quantize_np`` below — ``np.rint`` (half-even) silently diverges at
    exactly those values."""
    return F.transform(v, lambda x: F.round(x.cast("double") * scale, 0).cast("long"))


def quantize_np(x, scale: int = 1000):
    """numpy twin of ``quantize_vec``: HALF_UP quantization matching Spark
    and DuckDB ``round`` (half away from zero).  ``np.rint`` is half-even
    and disagrees at dyadic values (0.0625*1000=62.5 -> rint 62, Spark 63),
    which would silently break the bit-identical contract of the vectorized
    ANN twins (ADVICE r4, high)."""
    import numpy as np

    y = np.asarray(x, dtype=np.float64) * scale
    # branch-free HALF_UP: |y| rounds up at .5, copysign restores the sign
    # (floor(|y| + 0.5) == round-half-away-from-zero for non-negative |y|)
    return np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)


def sq_dist_long(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 over quantized vectors — THE canonical copy
    of the exactness-doctrine expression (int64 arithmetic, left-fold
    order); clustering and PQ import it rather than re-deriving."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def with_norm_sq(df: DataFrame, vec_col: str, out_col: str = "norm_sq") -> Column:
    return df.withColumn(out_col, _dot_long(F.col(vec_col), F.col(vec_col)))


def cosine_join_quantized(
    queries: DataFrame, targets: DataFrame, scale: int = 1000
) -> DataFrame:
    """Exact-deterministic all-pairs cosine: (q_id, t_id, cos DOUBLE).

    Input frames need columns (vec_id, embedding).  Quantized integer dot
    products are exact and associative; the single double division
    ``dot / sqrt(double(nq) * double(nt))`` is IEEE-deterministic.
    """
    q = queries.select(
        F.col("vec_id").alias("q_id"), quantize_vec(F.col("embedding"), scale).alias("q_vec")
    )
    q = q.withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    t = targets.select(
        F.col("vec_id").alias("t_id"), quantize_vec(F.col("embedding"), scale).alias("t_vec")
    )
    t = t.withColumn("t_norm", _dot_long(F.col("t_vec"), F.col("t_vec")))
    # Broadcast the query side: top-k/near-dup workloads have |Q| << |T|.
    pairs = t.join(F.broadcast(q), on=F.lit(True), how="inner")
    dot = _dot_long(F.col("q_vec"), F.col("t_vec"))
    return pairs.select(
        "q_id",
        "t_id",
        (
            dot.cast("double")
            / F.sqrt(F.col("q_norm").cast("double") * F.col("t_norm").cast("double"))
        ).alias("cos"),
    )


def cosine_join(queries: DataFrame, targets: DataFrame) -> DataFrame:
    """Double-precision all-pairs cosine (bench path; same plan shape)."""
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("q_vec"),
    ).withColumn("q_norm", _dot(F.col("q_vec"), F.col("q_vec")))
    t = targets.select(
        F.col("vec_id").alias("t_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("t_vec"),
    ).withColumn("t_norm", _dot(F.col("t_vec"), F.col("t_vec")))
    pairs = t.join(F.broadcast(q), on=F.lit(True), how="inner")
    return pairs.select(
        "q_id",
        "t_id",
        (_dot(F.col("q_vec"), F.col("t_vec")) / F.sqrt(F.col("q_norm") * F.col("t_norm"))).alias("cos"),
    )


def similarity_topk(
    queries: DataFrame, targets: DataFrame, k: int, quantized: bool = True
) -> DataFrame:
    """Top-k cosine neighbors per query (excluding self)."""
    join = cosine_join_quantized if quantized else cosine_join
    pairs = join(queries, targets).filter(F.col("q_id") != F.col("t_id"))
    return window_rank_topk(
        pairs, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def embedding_near_dups(corpus: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Near-duplicate pairs (a < b) by cosine over the full corpus.

    At scale, pre-bucket (``embedding_near_dups_clustered`` below, or
    hyperplane LSH) and run this join per bucket instead of all-pairs."""
    pairs = cosine_join_quantized(corpus, corpus).filter(F.col("q_id") < F.col("t_id"))
    return pairs.filter(F.col("cos") > threshold).select(
        F.col("q_id").alias("a"), F.col("t_id").alias("b"), "cos"
    )


def embedding_near_dups_clustered(
    corpus: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    threshold: float = 0.95,
    scale: int = 1000,
) -> DataFrame:
    """Scale path for embedding near-dup detection: k-means-bucket the
    corpus (deterministic integer k-means), then score pairs WITHIN each
    cell only — the all-pairs O(N²) cross join becomes k equi-join buckets
    of ~(N/k)² and the pair-generation join is a plain shuffle on cell.

    Recall trade, stated plainly: a near-dup pair whose members fall in
    different cells is missed (same class of trade as LSH banding).  An
    exact duplicate vector can never split cells — identical vectors have
    identical centroid distances and the argmin tie-breaks on cell id — so
    true duplicates always survive; raise k for tighter buckets, lower k
    (or union multiple clusterings) for recall.  Every stage is
    integer-deterministic, so results are hash-gateable cross-engine."""
    from .clustering import kmeans_integer

    cells = kmeans_integer(corpus, "vec_id", "embedding", k=k, n_iter=n_iter, scale=scale)
    q = corpus.select(
        "vec_id", quantize_vec(F.col("embedding"), scale).alias("v")
    ).withColumn("norm", _dot_long(F.col("v"), F.col("v")))
    t = q.join(cells, on="vec_id")
    a = t.select(
        F.col("vec_id").alias("a"), F.col("v").alias("va"),
        F.col("norm").alias("na"), "cell",
    )
    b = t.select(
        F.col("vec_id").alias("b"), F.col("v").alias("vb"),
        F.col("norm").alias("nb"), "cell",
    )
    pairs = a.join(b, on="cell").filter(F.col("a") < F.col("b"))
    scored = pairs.select(
        "a",
        "b",
        (
            _dot_long(F.col("va"), F.col("vb")).cast("double")
            / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
        ).alias("cos"),
    )
    return scored.filter(F.col("cos") > threshold)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: each vector mapped to its ``nprobe`` nearest
    centroids by exact quantized cosine (ties broken by centroid id).

    Output: (id_col, cell, probe_rank).  The centroid set is broadcast (k is
    small by construction); assignment is a narrow map over the data — no
    shuffle of the corpus.  Centroid choice is the caller's (deterministic
    subsets work fine for oracle checking; k-means iterations can refine the
    same contract at scale)."""
    c = centroids.select(
        F.col(id_col).alias("cell"), quantize_vec(F.col(vec_col), scale).alias("c_vec")
    ).withColumn("c_norm", _dot_long(F.col("c_vec"), F.col("c_vec")))
    v = df.select(
        F.col(id_col),
        quantize_vec(F.col(vec_col), scale).alias("v_vec"),
    ).withColumn("v_norm", _dot_long(F.col("v_vec"), F.col("v_vec")))
    pairs = v.join(F.broadcast(c), on=F.lit(True), how="inner")
    scored = pairs.select(
        id_col,
        "cell",
        (
            _dot_long(F.col("v_vec"), F.col("c_vec")).cast("double")
            / F.sqrt(F.col("v_norm").cast("double") * F.col("c_norm").cast("double"))
        ).alias("c_cos"),
    )
    from .windows import window_rank_topk as _topk

    ranked = _topk(
        scored, [id_col], [F.col("c_cos").desc(), F.col("cell").asc()], nprobe,
        rank_col="probe_rank",
    )
    return ranked.select(id_col, "cell", "probe_rank")


def ivf_assign_vectorized(
    df: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bit-identical numpy twin of ``ivf_assign`` for LARGE assignment
    batches: the k-row centroid table is collected driver-side (k-scale —
    the one collect that is always legal here) and each Arrow batch of
    vectors scores against it with ONE int64 matmul instead of k
    interpreted HOF dot products per row.

    Exactness: centroids are quantized via the expression path
    (``quantize_vec``) BEFORE collection, batch vectors via ``quantize_np``
    (same HALF_UP); cosine is the identical IEEE shape
    (double(dot)/sqrt(double·double)); the nprobe selection replays the
    (c_cos DESC, cell ASC) total order with a lexsort.  Pinned equal to
    ``ivf_assign`` by test, and the routed serving path built on it stays
    hash-gated cross-engine by the similarity_ann_ivf_routed catalog
    query."""
    import numpy as np
    import pandas as pd

    crows = (
        centroids.select(
            F.col(id_col).alias("cell"), quantize_vec(F.col(vec_col), scale).alias("cv")
        )
        .collect()
    )
    from .guards import check_driver_bound

    check_driver_bound(
        len(crows),
        65_536,
        "ivf_assign_vectorized (centroid driver collect)",
        "a coarser cell count at index build time (centroids are "
        "structurally k_cells rows — this bound failing means the index "
        "was built with a corpus-scale cell count)",
    )
    cells = np.array([int(r.cell) for r in crows], dtype=np.int64)
    C = np.array([list(r.cv) for r in crows], dtype=np.int64)
    # centroids pre-sorted by cell id: the reference order is
    # lexsort((cells, -cos)) — cell-ASC tie-break — which a stable argsort
    # on -cos alone reproduces over cell-sorted columns (round 14; the old
    # shape ran one np.lexsort per input row in a Python loop)
    ord_c = np.argsort(cells, kind="stable")
    cells = cells[ord_c]
    C = C[ord_c]
    c_norm = (C * C).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = quantize_np(np.stack(pdf[vec_col].to_numpy()), scale)
            v_norm = (V * V).sum(axis=1)
            # exact-by-bound float64 BLAS (round 14 — was naive int64)
            dots = exact_int_matmul(V, C.T)
            cos = dots / np.sqrt(
                v_norm[:, None].astype(np.float64) * c_norm[None, :].astype(np.float64)
            )
            kk = min(nprobe, cells.size)
            order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, kk),
                    "cell": cells[order].reshape(-1),
                    "probe_rank": np.tile(
                        np.arange(1, kk + 1, dtype=np.int32), ids.size
                    ),
                }
            )

    # probe_rank INT, matching ivf_assign's row_number type exactly so the
    # two twins union/compare without schema widening
    return df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cell long, probe_rank int"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """IVF-flat ANN: corpus vectors live in their single nearest cell; each
    query probes its ``nprobe`` nearest cells and exact-scores only those
    cells' members.  One shuffle keyed on cell; recall is tuned by nprobe —
    the classic inverted-file trade replacing the O(N·Q) cross product."""
    corpus_cells = ivf_assign(corpus, centroids, nprobe=1, scale=scale).select(
        F.col("vec_id").alias("t_id"), "cell"
    )
    query_cells = ivf_assign(queries, centroids, nprobe=nprobe, scale=scale).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    t = corpus.select(
        F.col("vec_id").alias("t_id"), quantize_vec(F.col("embedding"), scale).alias("t_vec")
    ).withColumn("t_norm", _dot_long(F.col("t_vec"), F.col("t_vec")))
    q = queries.select(
        F.col("vec_id").alias("q_id"), quantize_vec(F.col("embedding"), scale).alias("q_vec")
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    cand = (
        query_cells.join(corpus_cells, on="cell")
        .select("q_id", "t_id")
        .distinct()
        .filter(F.col("q_id") != F.col("t_id"))
    )
    pairs = cand.join(t, on="t_id").join(F.broadcast(q), on="q_id")
    scored = pairs.select(
        "q_id",
        "t_id",
        (
            _dot_long(F.col("q_vec"), F.col("t_vec")).cast("double")
            / F.sqrt(F.col("q_norm").cast("double") * F.col("t_norm").cast("double"))
        ).alias("cos"),
    )
    return window_rank_topk(
        scored, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    scale: int = 1000,
    n_partitions: int | None = None,
) -> DataFrame:
    """One-time IVF index build: corpus quantized, normed, assigned to its
    nearest cell, and hash-partitioned BY cell — the layout the probe join
    needs.  Returns (t_id, t_vec ARRAY<BIGINT>, t_norm, cell).

    Persist (or write bucketed by cell) the result and serve many query
    batches from it: the build is the O(corpus) cost that end-to-end timing
    unfairly charges to every batch — at 100 TB the index is built once per
    corpus version while query batches arrive continuously.  Because the
    output is partitioned on cell, ``ivf_topk_prebuilt``'s candidate join
    reuses that partitioning instead of re-shuffling the corpus per batch.
    """
    cells = ivf_assign(corpus, centroids, nprobe=1, scale=scale).select(
        F.col("vec_id").alias("t_id"), "cell"
    )
    t = corpus.select(
        F.col("vec_id").alias("t_id"), quantize_vec(F.col("embedding"), scale).alias("t_vec")
    ).withColumn("t_norm", _dot_long(F.col("t_vec"), F.col("t_vec")))
    indexed = t.join(cells, on="t_id")
    if n_partitions:
        indexed = indexed.repartition(n_partitions, "cell")
    return indexed


def ivf_topk_prebuilt(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Serving path of IVF ANN over a prebuilt ``build_ivf_index`` frame:
    probe assignment is a broadcast-centroid map over the (small) query
    batch, the candidate join touches only the probed cells' partitions, and
    exact scoring runs on |Q|·nprobe·cell_size pairs instead of |Q|·N."""
    query_cells = ivf_assign(queries, centroids, nprobe=nprobe, scale=scale).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), quantize_vec(F.col("embedding"), scale).alias("q_vec")
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    cand = index.join(F.broadcast(query_cells), on="cell").filter(
        F.col("q_id") != F.col("t_id")
    )
    scored = cand.join(F.broadcast(q), on="q_id").select(
        "q_id",
        "t_id",
        (
            _dot_long(F.col("q_vec"), F.col("t_vec")).cast("double")
            / F.sqrt(F.col("q_norm").cast("double") * F.col("t_norm").cast("double"))
        ).alias("cos"),
    )
    return window_rank_topk(
        scored, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def hyperplane_lsh_bucket_quantized(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, seed: int = 42, scale: int = 1000
) -> DataFrame:
    """Exact-deterministic random-hyperplane LSH bucket over the quantized
    vector: plane component for (plane p, dim d) = 2*h - 65535 where h is the
    first-4-hex-chars value of md5(seed|p|d) — an odd integer, so the dot
    product is a nonzero-biased exact integer and the sign bit is identical
    in any engine.  Bucket id packs the n_planes sign bits.

    This is the scale path for cosine search: candidate generation joins on
    bucket id (vectors at small angles agree on most sign bits), cutting the
    exact-scoring join from O(N·Q) to per-bucket."""
    qv = quantize_vec(F.col(vec_col), scale)

    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                qv,
                F.sequence(F.lit(0), F.size(qv) - 1),
                lambda x, d: x
                * (
                    F.conv(
                        F.substring(
                            F.md5(F.concat_ws("|", F.lit(str(seed)), p.cast("string"), d.cast("string"))),
                            1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("long")
                    * 2
                    - 65535
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) > 0, F.pow(F.lit(2.0), p.cast("double")).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    bucket = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return df.withColumn("lsh_bucket", bucket)


def hyperplane_lsh_bucket(df: DataFrame, vec_col: str, n_planes: int = 16, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH bucket id (scale path for cosine search).

    Plane components are derived deterministically from md5(seed, plane, dim)
    so the bucketing is reproducible across engines and runs without RNG
    state.  Vectors whose angle is small agree on most sign bits; candidate
    generation joins on bucket id.
    """
    dims = F.size(F.col(vec_col))
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))

    def plane_component(p: Column, d: Column) -> Column:
        h = F.md5(F.concat_ws("|", F.lit(seed), p.cast("string"), d.cast("string")))
        # first 4 hex chars -> [0, 65535] -> centered
        return (
            F.conv(F.substring(h, 1, 4), 16, 10).cast("double") - F.lit(32767.5)
        )

    sign_bits = F.transform(
        planes,
        lambda p: (
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.sequence(F.lit(0), dims - 1),
                    lambda x, d: x.cast("double") * plane_component(p, d),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("int"),
    )
    bucket = F.aggregate(
        F.zip_with(
            sign_bits,
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            lambda b, i: b * F.pow(F.lit(2.0), i.cast("double")).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("lsh_bucket", bucket)


def cosine_topk_vectorized(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    scale: int = 1000,
    max_queries: int = 20_000,
) -> DataFrame:
    """Arrow-batched numpy twin of ``similarity_topk(quantized=True)`` —
    bit-identical results, vectorized hot loop.

    The expression path's per-row ``zip_with``+``aggregate`` dot product is
    a higher-order function, which Spark evaluates INTERPRETED (no codegen)
    — the same finding that drove the bloom filter's hash-family choice.
    Here the fix is the sanctioned vectorized-UDF path: the query matrix is
    collected and quantized driver-side (|Q| << |T| is this operator's
    contract — Q-scale, not data-scale, like the materialized bloom words),
    and each Arrow batch of targets scores as ONE int64 matmul.

    Exactness argument, step by step:
      - quantization: both paths compute HALF_UP round(float64(x) * scale) —
        ``quantize_np`` replicates Spark's half-away-from-zero rounding
        exactly (dyadic values like 0.0625 land on .5 after scaling, where
        np.rint's half-even would diverge);
      - dot/norms: int64 arithmetic, exact and associative — matmul order
        cannot matter;
      - cosine: one float64 multiply + sqrt + divide, the same IEEE ops in
        the same shape as the JVM expression — bit-identical doubles.

    Each batch emits only its LOCAL top-k per query under the exact final
    total order (cos DESC, t_id ASC), so candidates are n_batches*|Q|*k
    rows — the per-partition-heap shape of TakeOrderedAndProject — and the
    global window top-k over them equals the true top-k (union-of-local-
    top-k property of total orders).

    Zero-norm vectors: Spark's non-ANSI double division yields NULL for
    0/0 (not IEEE NaN) and the DESC window orders nulls LAST; the numpy
    side produces NaN, which ``-col``-keyed lexsort also orders last and
    which the pandas→Arrow hop delivers back to Spark as NULL — so both
    paths exclude zero-norm rows from any top-k that has k valid
    candidates, and emit them trailing otherwise (pinned by test).  Under
    ANSI the expression path raises DIVIDE_BY_ZERO instead: zero-norm
    input is invalid there by construction.

    Exceeding the |Q| contract raises :class:`guards.DriverBoundExceeded`
    BEFORE the collect (one cheap count job) — the audit tier fails
    loudly instead of degrading into a driver bottleneck; the unbounded
    serving shape is ``cosine_topk_routed``.
    """
    import numpy as np
    import pandas as pd

    from .guards import check_driver_bound

    check_driver_bound(
        queries.count(),
        max_queries,
        "cosine_topk_vectorized (query-side driver collect)",
        "cosine_topk_routed (cogrouped, zero driver collect)",
    )
    qrows = queries.select("vec_id", "embedding").collect()
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = quantize_np(np.array([r.embedding for r in qrows], dtype=np.float64), scale)
    q_norm = (Q * Q).sum(axis=1)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            t_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            T = quantize_np(np.stack(pdf["embedding"].to_numpy()), scale)
            t_norm = (T * T).sum(axis=1)
            dots = T @ Q.T
            # same IEEE shape as the expression path: double(dot) /
            # sqrt(double(nq) * double(nt))
            cos = dots.astype(np.float64) / np.sqrt(
                q_norm[None, :].astype(np.float64) * t_norm[:, None].astype(np.float64)
            )
            out_q, out_t, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                idx = np.nonzero(t_ids != qid)[0]
                if idx.size == 0:
                    continue
                col = cos[idx, j]
                order = np.lexsort((t_ids[idx], -col))[:k]
                sel = idx[order]
                out_q.append(np.full(sel.size, qid, dtype=np.int64))
                out_t.append(t_ids[sel])
                out_c.append(cos[sel, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "q_id": np.concatenate(out_q),
                        "t_id": np.concatenate(out_t),
                        "cos": np.concatenate(out_c),
                    }
                )

    cand = targets.select("vec_id", "embedding").mapInPandas(
        score, "q_id long, t_id long, cos double"
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def ivf_topk_prebuilt_vectorized(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Vectorized serving path over a ``build_ivf_index`` frame —
    bit-identical to ``ivf_topk_prebuilt``, with the per-candidate HOF dot
    replaced by per-cell numpy matmuls.

    Shape: probe assignment is unchanged (broadcast-centroid map over the
    query batch); the probed cell→queries routing table and the quantized
    query matrix are collected driver-side (both Q-scale); the index is
    FILTERED to probed cells (partition-pruned when the index is stored
    partitioned/bucketed by cell) and each Arrow batch scores its members
    against exactly the queries probing their cells — index vectors cross
    into Python ONCE, already quantized, and each (batch, cell) group emits
    only its local top-k per query under the final total order before the
    global window refine.  Same exactness argument as
    cosine_topk_vectorized (int64 dots, one IEEE-shaped division).
    Honest measurement (80k corpus, 64 cells, nprobe=8, local[32]): 1.34 s
    vs the expression path's 1.23 s — PARITY, not a win.  After IVF's 8x
    candidate pruning the scoring volume (~500k pairs) is small enough that
    probe assignment, Python worker startup, and the Arrow hop of the index
    vectors offset the interpreted-HOF savings that gave the brute-force
    twin its 2.4-3x.  Use this variant when cells are large (bigger corpora,
    fewer cells, higher nprobe) — the matmul advantage grows linearly with
    pairs-per-cell while the overheads stay fixed; below that regime the
    expression path is already the right choice.

    Exceeding the |Q| contract raises :class:`guards.DriverBoundExceeded`
    before the collect; the unbounded serving shape is
    ``ivf_topk_prebuilt_routed``."""
    import numpy as np
    import pandas as pd

    from .guards import check_driver_bound

    check_driver_bound(
        queries.count(),
        20_000,
        "ivf_topk_prebuilt_vectorized (query-side driver collect)",
        "ivf_topk_prebuilt_routed (cogrouped, zero driver collect)",
    )
    probe = ivf_assign(queries, centroids, nprobe=nprobe, scale=scale).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    qrows = queries.select("vec_id", "embedding").collect()
    q_index = {int(r.vec_id): i for i, r in enumerate(qrows)}
    # HALF_UP, same as quantize_vec: ivf_assign quantizes these queries
    # half-up for probe assignment and the index's t_vec is half-up — one
    # query vector must never be quantized two different ways (ADVICE r4).
    Q = quantize_np(np.array([r.embedding for r in qrows], dtype=np.float64), scale)
    q_ids_arr = np.array([r.vec_id for r in qrows], dtype=np.int64)
    q_norm = (Q * Q).sum(axis=1)
    cell_to_q: dict[int, list[int]] = {}
    for r in probe.collect():
        cell_to_q.setdefault(int(r.cell), []).append(q_index[int(r.q_id)])
    probed_cells = sorted(cell_to_q)

    members = index.filter(F.col("cell").isin(probed_cells)).select(
        "cell", "t_id", "t_vec", "t_norm"
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            cells = pdf["cell"].to_numpy()
            for cell in np.unique(cells):
                qs = cell_to_q.get(int(cell))
                if not qs:
                    continue
                sub = pdf[cells == cell]
                t_ids = sub["t_id"].to_numpy(dtype=np.int64)
                T = np.stack(sub["t_vec"].to_numpy()).astype(np.int64)
                t_norm = sub["t_norm"].to_numpy(dtype=np.int64)
                Qc, qn, qi = Q[qs], q_norm[qs], q_ids_arr[qs]
                dots = T @ Qc.T
                cos = dots.astype(np.float64) / np.sqrt(
                    qn[None, :].astype(np.float64) * t_norm[:, None].astype(np.float64)
                )
                out_q, out_t, out_c = [], [], []
                for j, qid in enumerate(qi):
                    idx = np.nonzero(t_ids != qid)[0]
                    if idx.size == 0:
                        continue
                    col = cos[idx, j]
                    order = np.lexsort((t_ids[idx], -col))[:k]
                    sel = idx[order]
                    out_q.append(np.full(sel.size, qid, dtype=np.int64))
                    out_t.append(t_ids[sel])
                    out_c.append(cos[sel, j])
                if out_q:
                    yield pd.DataFrame(
                        {
                            "q_id": np.concatenate(out_q),
                            "t_id": np.concatenate(out_t),
                            "cos": np.concatenate(out_c),
                        }
                    )

    cand = members.mapInPandas(score, "q_id long, t_id long, cos double")
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def ivf_topk_prebuilt_routed(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Fully-distributed vectorized IVF serving — NO driver collect of the
    query side (VERDICT r4 #2).  Bit-identical to ``ivf_topk_prebuilt``.

    The collect-based twin (``ivf_topk_prebuilt_vectorized``) ships the
    query matrix through the driver, a hop that stops scaling around
    |Q|~10k.  Here queries stay a DataFrame end-to-end:

      1. probe assignment (broadcast-centroid map, unchanged) produces the
         (q_id, cell) routing table as a DataFrame;
      2. queries are quantized ONCE via the expression path
         (``quantize_vec`` — so there is exactly one rounding mode in play)
         and joined to their probed cells: (cell, q_id, q_vec, q_norm);
      3. a cogrouped ``applyInPandas`` on cell brings each cell's index
         members and its probing queries together on the EXECUTOR — one
         int64 matmul per cell, local top-k per query under the final total
         order (cos DESC, t_id ASC);
      4. a global window top-k refines the per-cell candidates (each t_id
         lives in exactly one cell, so candidates are duplicate-free and
         the union-of-local-top-k property applies per query).

    Shuffle shape: one exchange of the routed queries + one of the index on
    cell (the second is free when the index was written
    partitioned/bucketed by cell — same co-location contract as
    ``ivf_topk_prebuilt``).  Per-cell state is bounded by cell size x
    probing-query count; skewed cells split naturally across nothing — a
    hot cell is the IVF analogue of a hot key, mitigated by raising k_cells
    at build time (documented trade, same as the expression path)."""
    # vectorized probe assignment (bit-identical twin of ivf_assign): at
    # |Q|=10k the per-row interpreted HOF dots of the expression assign are
    # the dominant serving cost once scoring is a cogrouped matmul
    probe = ivf_assign_vectorized(queries, centroids, nprobe=nprobe, scale=scale).select(
        F.col("vec_id").alias("q_id"), "cell"
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        quantize_vec(F.col("embedding"), scale).alias("q_vec"),
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    # BROADCAST the quantized query batch into the routing join (round 15,
    # guide §3.1): q is |Q| rows — bounded by the serving contract, the same
    # budget argument as _exact_rerank's shortlist broadcast — while the
    # planner's estimate for the two opaque children (MapInPandas probe ×
    # projected cache scan) was wide enough that it planned a SortMergeJoin:
    # two exchanges + two sorts of query-scale frames per serve, all to
    # attach 64-int vectors to their probe rows.  The broadcast leaves one
    # exchange on the query side (the cell routing itself).
    routed = probe.join(F.broadcast(q), on="q_id").select(
        "cell", "q_id", "q_vec", "q_norm"
    )
    members = index.select("cell", "t_id", "t_vec", "t_norm")

    cand = (
        members.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInArrow(_block_cogroup_scorer_arrow(k), "q_id long, t_id long, cos double")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def exact_int_matmul(A, B):
    """``A @ B`` over int64 matrices, computed through float64 BLAS when
    provably exact, else the numpy int64 loop.  numpy has no BLAS kernel
    for integer dtypes — an int64 matmul is a naive C triple loop, 10-50×
    slower than dgemm.  Every partial sum here is an integer, and every
    integer with |x| < 2^53 is exactly representable in float64 with exact
    IEEE addition, so when max|A|·max|B|·K < 2^53 the BLAS result equals
    the int64 result bit-for-bit after rounding back (guide §4.2: hand
    batches to vectorized native libraries).  Quantized embeddings are
    |v| ≲ 1e3·scale_margin, so the guard passes by ~6 orders of magnitude;
    it exists so adversarial inputs degrade to slow-but-exact, never to
    silently-wrong.  Returns float64 (integer-valued when the guard held).
    """
    import numpy as np

    ka = A.shape[1]
    ma = int(np.abs(A).max(initial=0))
    mb = int(np.abs(B).max(initial=0))
    if ma * mb * ka < 2**53:
        return A.astype(np.float64) @ B.astype(np.float64)
    return (A @ B).astype(np.float64)


def grouped_topk_indices(key, t_ids_sorted, q_ids, k: int):
    """Vectorized per-query top-k used by the cogrouped scorers: for each
    column j of ``key`` (shape (n_t, n_q)), select the k smallest entries
    ASCENDING with NaN last and ties broken by row order — callers pass
    rows pre-sorted by t_id ASC, so a stable argsort reproduces the
    reference ``np.lexsort((t_id, key))`` total order — excluding the
    (at most one) self row where t_id == q_ids[j].  Returns flat
    (q_col_idx, t_row_idx) index arrays.

    This replaces the per-query Python loop (np.nonzero + np.lexsort per
    query — 80k interpreter iterations at the |Q|=10k bench shape) with
    one C-level argsort over the whole matrix: argsort-then-drop-self over
    k+1 rows is exactly select-top-k-among-non-self because each t_id
    occurs once per cell."""
    import numpy as np

    n_t, n_q = key.shape
    kk = min(k + 1, n_t)
    ord_ = np.argsort(key, axis=0, kind="stable")[:kk, :]
    sel_t = t_ids_sorted[ord_]
    not_self = sel_t != q_ids[None, :]
    take = not_self & (np.cumsum(not_self, axis=0) <= k)
    q_idx = np.broadcast_to(np.arange(n_q)[None, :], take.shape)[take]
    return q_idx, ord_[take]


def _pa_list_matrix(col, np):
    """(n, d) matrix from a pyarrow primitive-list column (int64, int32,
    float64, …) in ONE flat copy: the list column's value buffer is a
    single contiguous array, so ``flatten().to_numpy()`` + a reshape
    replaces the pandas path's per-row object boxing (one numpy array
    allocated per row) and the O(n) ``np.stack`` gather.  Dtype follows
    the Arrow value type.  Rejects nulls and ragged widths loudly (the
    pandas twin's ``np.stack`` would have raised on both)."""
    arr = col.combine_chunks()
    if arr.null_count:
        raise ValueError("NULL vector in cogroup scorer input")
    offs = np.asarray(arr.offsets)
    lens = np.diff(offs)
    d = int(lens[0]) if lens.size else 0
    if lens.size and not (lens == d).all():
        raise ValueError("ragged vector column in cogroup scorer input")
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, d)


def _block_cogroup_scorer_arrow(k: int):
    """Arrow-native twin of ``_block_cogroup_scorer`` (the round-14 §4.2
    boundary fix): the cogrouped scorer receives ``pyarrow.Table`` pairs
    directly (``applyInArrow``), so the vector columns cross the boundary
    as flat int64 buffers instead of being boxed into object-dtype pandas
    columns row by row — the boxing was the measured residual wall of the
    routed rows after the compute itself was vectorized.  The numpy core
    (exact_int_matmul → IEEE cosine division → grouped_topk_indices) is
    byte-for-byte the pandas twin's; only input extraction and output
    construction change, so results are bit-identical (pinned by
    tools/verify_routed_ann.py and the interleaved A/B probe)."""
    import numpy as np
    import pyarrow as pa

    empty = pa.table(
        {
            "q_id": pa.array([], pa.int64()),
            "t_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def score(mem: "pa.Table", qs: "pa.Table") -> "pa.Table":
        if mem.num_rows == 0 or qs.num_rows == 0:
            return empty
        t_ids = mem.column("t_id").to_numpy()
        ord_t = np.argsort(t_ids, kind="stable")
        t_ids = t_ids[ord_t]
        T = _pa_list_matrix(mem.column("t_vec"), np)[ord_t]
        t_norm = mem.column("t_norm").to_numpy()[ord_t]
        q_ids = qs.column("q_id").to_numpy()
        Q = _pa_list_matrix(qs.column("q_vec"), np)
        q_norm = qs.column("q_norm").to_numpy()
        dots = exact_int_matmul(T, Q.T)
        cos = dots / np.sqrt(
            q_norm[None, :].astype(np.float64) * t_norm[:, None].astype(np.float64)
        )
        q_idx, t_row = grouped_topk_indices(-cos, t_ids, q_ids, k)
        if q_idx.size == 0:
            return empty
        return pa.table(
            {"q_id": q_ids[q_idx], "t_id": t_ids[t_row], "cos": cos[t_row, q_idx]}
        )

    return score


def _block_cogroup_scorer(k: int):
    """Pandas form of the cogrouped (members, queries) → local-top-k
    scorer.  Production consumers (``ivf_topk_prebuilt_routed``,
    ``cosine_topk_routed``) now run the Arrow twin above
    (``_block_cogroup_scorer_arrow`` — identical numpy core, no pandas
    boxing of the vector columns); this form is kept as the A/B reference
    used by tools/probe_scorer_vec_ab.py and the bit-identity pins.
    Per cell/block group: one int64 matmul, one IEEE-shaped cosine
    division (double(dot) / sqrt(double·double) — the exact
    expression-path shape), local top-k per query under the final
    (cos DESC, t_id ASC) total order."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "q_id": pd.Series(dtype="int64"),
            "t_id": pd.Series(dtype="int64"),
            "cos": pd.Series(dtype="float64"),
        }
    )

    def score(mem: pd.DataFrame, qs: pd.DataFrame) -> pd.DataFrame:
        if mem.empty or qs.empty:
            return empty
        # members pre-sorted by t_id so grouped_topk_indices' stable
        # argsort replays the (cos DESC, t_id ASC) lexsort tie order
        t_ids = mem["t_id"].to_numpy(dtype=np.int64)
        ord_t = np.argsort(t_ids, kind="stable")
        t_ids = t_ids[ord_t]
        T = np.stack(mem["t_vec"].to_numpy()[ord_t]).astype(np.int64)
        t_norm = mem["t_norm"].to_numpy(dtype=np.int64)[ord_t]
        q_ids = qs["q_id"].to_numpy(dtype=np.int64)
        Q = np.stack(qs["q_vec"].to_numpy()).astype(np.int64)
        q_norm = qs["q_norm"].to_numpy(dtype=np.int64)
        # exact-by-bound float64 BLAS (round 14 — was a naive int64 matmul);
        # the division below consumed double(dots) anyway, so values are
        # IEEE-identical to the old astype path
        dots = exact_int_matmul(T, Q.T)
        cos = dots / np.sqrt(
            q_norm[None, :].astype(np.float64) * t_norm[:, None].astype(np.float64)
        )
        # vectorized per-query top-k (round 14 — was a Python loop with one
        # np.lexsort per query: 80k interpreter iterations at |Q|=10k);
        # key = -cos gives ASC order == cos DESC, NaN placement unchanged
        q_idx, t_row = grouped_topk_indices(-cos, t_ids, q_ids, k)
        if q_idx.size == 0:
            return empty
        return pd.DataFrame(
            {
                "q_id": q_ids[q_idx],
                "t_id": t_ids[t_row],
                "cos": cos[t_row, q_idx],
            }
        )

    return score


def cosine_topk_routed(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    scale: int = 1000,
    n_blocks: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k served through the routed cogroup — the
    ``ivf_topk_prebuilt_routed`` serving shape at nprobe = ALL cells,
    with deterministic hash blocks standing in for trained cells.  This
    retires the |Q|≪|T| driver collect of ``cosine_topk_vectorized`` from
    the production/benched path (VERDICT r7 #2 — the same move that fixed
    r6's ann_pq_rerank breach): queries stay a DataFrame end-to-end.

    Bit-identical to ``cosine_topk_vectorized`` / ``similarity_topk
    (quantized=True)``: ONE quantization mode (expression-side HALF_UP
    ``quantize_vec`` on both sides), the shared ``_block_cogroup_scorer``
    (same int64 matmul and IEEE division bytes as the IVF rung), blocks
    partition the targets so per-block local top-k unions are
    duplicate-free and the global window refine returns the true top-k.

    Shuffle shape at 100 TB: one exchange of targets on block (free if
    the corpus is stored bucketed by the same hash), one broadcast of the
    block ids crossed with queries (|Q|·B rows of K-dim int vectors —
    executor-side replication, never a driver hop).  Block count defaults
    to shuffle parallelism; raise it to bound per-task matmul memory
    (|block| × |Q| floats)."""
    spark = queries.sparkSession
    if n_blocks is None:
        n_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    t = targets.select(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks)).cast("int").alias("cell"),
        F.col("vec_id").alias("t_id"),
        quantize_vec(F.col("embedding"), scale).alias("t_vec"),
    ).withColumn("t_norm", _dot_long(F.col("t_vec"), F.col("t_vec")))
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        quantize_vec(F.col("embedding"), scale).alias("q_vec"),
    ).withColumn("q_norm", _dot_long(F.col("q_vec"), F.col("q_vec")))
    # replicate each query to every block via explode(sequence(..)) — a
    # pure codegen projection, no join node (the plan auditor's cartesian
    # check stays meaningful for real accidents)
    routed = q.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("cell"),
        "q_id",
        "q_vec",
        "q_norm",
    )
    cand = (
        t.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInArrow(_block_cogroup_scorer_arrow(k), "q_id long, t_id long, cos double")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def _seq_fold_matmul(T, Q, np):
    """(n_t, d) × (n_q, d) → (n_t, n_q) float64 dot products with STRICT
    left-to-right per-dimension accumulation — the exact IEEE association
    of the expression path's ``aggregate ∘ zip_with`` fold (acc starts at
    0.0 and adds one product per dim in index order), vectorized across
    pairs: d fused multiply-adds over the (n_t, n_q) plane.  BLAS dgemm
    would be faster still but reassociates the sum (blocked/SIMD partial
    sums), which is NOT bit-identical for doubles — this shape is, by
    construction, while still running at C speed instead of one
    interpreted fold per pair."""
    acc = np.zeros((T.shape[0], Q.shape[0]), dtype=np.float64)
    for j in range(T.shape[1]):
        acc += T[:, j][:, None] * Q[:, j][None, :]
    return acc


def _seq_fold_norms(V, np):
    """Per-row ‖v‖² with the same strict left-to-right fold as
    ``_dot(v, v)`` — bit-identical to the expression norm."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for j in range(V.shape[1]):
        acc += V[:, j] * V[:, j]
    return acc


def _block_cogroup_scorer_double(k: int):
    """Arrow cogrouped scorer for the DOUBLE (unquantized) brute-force
    cosine rung — the ``_block_cogroup_scorer_arrow`` shape with float64
    vectors and sequential-fold arithmetic.  Dots and norms replay the
    expression fold's IEEE association exactly (``_seq_fold_matmul`` /
    ``_seq_fold_norms``), and the division is the identical
    ``dot / sqrt(q_norm · t_norm)`` shape, so every cos value is
    bit-identical to ``cosine_join``'s interpreted HOF output — pinned by
    tools/probe_cosine_double_ab.py at the 80k bench shape and by unit
    test.  NaN caveat (shared with every routed rung): a zero-norm vector
    yields NaN cos, which numpy's local top-k places last while Spark's
    window would place first; callers guarantee nonzero vectors."""
    import numpy as np
    import pyarrow as pa

    empty = pa.table(
        {
            "q_id": pa.array([], pa.int64()),
            "t_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def score(mem: "pa.Table", qs: "pa.Table") -> "pa.Table":
        if mem.num_rows == 0 or qs.num_rows == 0:
            return empty
        t_ids = mem.column("t_id").to_numpy()
        ord_t = np.argsort(t_ids, kind="stable")
        t_ids = t_ids[ord_t]
        T = _pa_list_matrix(mem.column("t_vec"), np)[ord_t]
        q_ids = qs.column("q_id").to_numpy()
        Q = _pa_list_matrix(qs.column("q_vec"), np)
        t_norm = _seq_fold_norms(T, np)
        q_norm = _seq_fold_norms(Q, np)
        dots = _seq_fold_matmul(T, Q, np)
        cos = dots / np.sqrt(q_norm[None, :] * t_norm[:, None])
        q_idx, t_row = grouped_topk_indices(-cos, t_ids, q_ids, k)
        if q_idx.size == 0:
            return empty
        return pa.table(
            {"q_id": q_ids[q_idx], "t_id": t_ids[t_row], "cos": cos[t_row, q_idx]}
        )

    return score


def cosine_topk_routed_double(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    n_blocks: int | None = None,
) -> DataFrame:
    """Brute-force DOUBLE cosine top-k served through the routed cogroup —
    the ``cosine_topk_routed`` shape for the unquantized rung (round 15,
    VERDICT r14 #3).  Bit-identical to ``similarity_topk(quantized=False)``:
    vectors cross as float64 (the expression path's cast), dots/norms
    replay the HOF fold's sequential IEEE association inside the scorer
    (``_seq_fold_matmul``/``_seq_fold_norms``), the division is the same
    ``dot / sqrt(q_norm · t_norm)``, and blocks partition the targets so
    the per-block local top-k union + global window refine returns the
    true top-k under the identical (cos DESC, t_id ASC) total order.

    What it removes vs the expression twin: the per-pair interpreted
    ``aggregate ∘ zip_with`` fold of the BroadcastNestedLoopJoin plan —
    |Q|·|T| interpreted 64-dim folds become d vectorized multiply-adds per
    block.  The expression twin stays as the reference rung (bench row
    cosine_topk) pinning bit-identity."""
    spark = queries.sparkSession
    if n_blocks is None:
        n_blocks = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    t = targets.select(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks)).cast("int").alias("cell"),
        F.col("vec_id").alias("t_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("t_vec"),
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("q_vec"),
    )
    routed = q.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("cell"),
        "q_id",
        "q_vec",
    )
    cand = (
        t.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInArrow(_block_cogroup_scorer_double(k), "q_id long, t_id long, cos double")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("cos").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def maxsim_topk(
    q_tokens: DataFrame,
    t_tokens: DataFrame,
    k: int,
    scale: int = 1000,
) -> DataFrame:
    """Multi-vector late-interaction retrieval (ColBERT-style MaxSim):
    each document is a SET of token embeddings and the query-document
    score is Σ_{query token} max_{doc token} <q_tok, t_tok> — the scoring
    family that beats single-vector cosine when relevance is carried by a
    few tokens, and the retrieval shape a multi-vector training corpus
    needs audited.

    Exactness: token vectors are HALF_UP integer-quantized
    (``quantize_vec``) and every pairwise interaction is an int64 dot —
    max and sum over int64 are order-free, so the score, and therefore
    the top-k set under the (score DESC, t_id ASC) tie rule, is
    bit-identical across engines and reduction orders.

    Shape: this is the brute-force baseline rung of the ladder (the
    ``cosine_topk`` analogue): the token-pair interaction is a broadcast
    cross join (query tokens ≪ corpus tokens — the |Q|≪|T| contract),
    folded immediately by a two-stage aggregation: max over doc tokens
    keyed (q_id, t_id, q_tok), then sum keyed (q_id, t_id) — both stages
    partial-aggregate map-side, so the shuffle carries per-pair rows, not
    per-token-pair.  The scale rung routes candidates through IVF over
    per-document centroid vectors first and MaxSim-scores only the
    shortlist (compose with ``ivf_topk_prebuilt_routed``).

    Inputs: (q_id, q_tok, vec) / (t_id, t_tok, vec); output (q_id, t_id,
    maxsim_units, n_q_tokens) = top-k docs per query.
    """
    q = q_tokens.select(
        F.col("q_id"), F.col("q_tok"), quantize_vec(F.col("vec"), scale).alias("_qv")
    )
    t = t_tokens.select(
        F.col("t_id"), F.col("t_tok"), quantize_vec(F.col("vec"), scale).alias("_tv")
    )
    inter = t.join(F.broadcast(q), on=F.lit(True), how="inner").select(
        "q_id", "t_id", "q_tok", _dot_long(F.col("_qv"), F.col("_tv")).alias("_dot")
    )
    per_qtok = inter.groupBy("q_id", "t_id", "q_tok").agg(
        F.max("_dot").alias("_best")
    )
    scores = per_qtok.groupBy("q_id", "t_id").agg(
        F.sum("_best").cast("long").alias("maxsim_units"),
        F.count(F.lit(1)).cast("long").alias("n_q_tokens"),
    )
    return window_rank_topk(
        scores.filter(F.col("q_id") != F.col("t_id")),
        ["q_id"],
        [F.col("maxsim_units").desc(), F.col("t_id").asc()],
        k,
        rank_col="rnk",
    )


def maxsim_doc_summaries(
    tokens: DataFrame, id_col: str, scale: int = 1000
) -> DataFrame:
    """Per-document routing summary for multi-vector MaxSim: the int64
    element-wise SUM of the document's quantized token vectors — order-free
    (int64 addition commutes), division-free (a mean would round), and
    computed with the ``ema_integer`` fold pattern: collect the token
    vectors per doc and zip_with-add them, first element as the seed.
    Output: (id_col, svec array<long>)."""
    q = tokens.select(
        F.col(id_col), quantize_vec(F.col("vec"), scale).alias("_qv")
    )
    g = q.groupBy(id_col).agg(F.collect_list("_qv").alias("_xs"))
    xs = F.col("_xs")
    svec = F.aggregate(
        F.slice(xs, 2, F.size(xs) - 1),
        F.element_at(xs, 1),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    return g.select(id_col, svec.alias("svec"))


def merge_doc_summaries(partials: DataFrame, id_col: str = "t_id") -> DataFrame:
    """Merge per-shard/per-batch token-SUM summaries: int64 vector addition
    is associative and commutative, so summaries maintained one micro-batch
    at a time (or one backfill shard at a time) equal the single-pass
    summary regardless of how tokens were bundled — the property
    ``stream_maxsim_maintain`` gates.  Same fold pattern as
    ``maxsim_doc_summaries`` (collect + zip_with-add, first element as
    seed)."""
    g = partials.groupBy(id_col).agg(F.collect_list("svec").alias("_xs"))
    xs = F.col("_xs")
    svec = F.aggregate(
        F.slice(xs, 2, F.size(xs) - 1),
        F.element_at(xs, 1),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    return g.select(id_col, svec.alias("svec"))


def maxsim_route_cells(
    q_tokens: DataFrame,
    t_tokens: DataFrame,
    n_cells: int,
    nprobe: int,
    scale: int = 1000,
    q_sum: DataFrame | None = None,
    t_sum: DataFrame | None = None,
    vectorized_assign: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """THE routing chain for cell-routed MaxSim, shared verbatim by the
    expression path (``maxsim_topk_routed``) and the cogrouped vectorized
    path (``maxsim_topk_routed_vectorized``) so their candidate sets are
    identical by construction: int64 token-sum summaries
    (``maxsim_doc_summaries``), seeds = first ``n_cells`` docs by
    (md5(t_id), t_id), assignment = exact int64 squared L2 to the nearest
    seed (ties → smaller cell); queries keep their ``nprobe`` nearest
    cells.  Returns (q_cells, t_cells) as (id, cell) frames.

    ``q_sum``/``t_sum`` (id, svec) override the internally-computed
    summaries — the streaming maintainer's hook: token-SUM summaries are
    ADDITIVE, so a stream can keep them fresh by merging per-batch sums
    (`stream_maxsim_maintain`) and route through the maintained table
    without ever rescanning the corpus tokens.

    ``vectorized_assign`` swaps the assignment stage's implementation —
    NOT its result: the expression shape evaluates |docs|·n_cells
    interpreted zip_with/aggregate HOF distances through a window top-k,
    while the vectorized shape collects the BOUNDED seed table (n_cells
    rows — the k-means driver-loop doctrine) and computes per-batch exact
    int64 ‖v‖²+‖s‖²−2·v·s matrices in numpy with a stable argsort whose
    tie order is cell-ascending by construction.  int64 matmul/argsort
    are exact, so the two shapes are BIT-IDENTICAL — pinned by an
    identity test on random inputs.  MEASURED NEGATIVE RESULT at the
    benched 10k×64 shape (round-10 A/B, min-of-5): the vectorized twin
    costs 4.87 s full-row vs the expression path's 3.76 s — the eager
    summary-materialization job plus the Arrow hop exceed the interpreted
    HOF it replaces — so the default stays False; the twin is the
    documented choice for n_cells in the hundreds+, where the
    |docs|·n_cells HOF explode dominates instead."""
    if t_sum is None:
        t_sum = maxsim_doc_summaries(t_tokens, "t_id", scale)
    if q_sum is None:
        q_sum = maxsim_doc_summaries(q_tokens, "q_id", scale)
    seeds = (
        t_sum.select(
            "t_id",
            "svec",
            F.row_number()
            .over(
                Window.orderBy(
                    F.md5(F.col("t_id").cast("string")), F.col("t_id")
                )
            )
            .alias("_r"),
        )
        .filter(F.col("_r") <= n_cells)
        .select((F.col("_r") - 1).cast("long").alias("cell"), F.col("svec").alias("_sv"))
    )

    if vectorized_assign:
        import numpy as np

        # the seed collect is an EXTRA eager job consuming the summaries
        # subtree — materialize the summaries once so the collect and the
        # two downstream assigns share them instead of re-deriving the
        # corpus scan + fold per consumer (measured: without this the
        # vectorized path LOST 1.7 s to recomputation at the bench shape)
        t_sum = t_sum.localCheckpoint(eager=True)
        q_sum = q_sum.localCheckpoint(eager=True)
        seeds = (
            t_sum.select(
                "t_id",
                "svec",
                F.row_number()
                .over(
                    Window.orderBy(
                        F.md5(F.col("t_id").cast("string")), F.col("t_id")
                    )
                )
                .alias("_r"),
            )
            .filter(F.col("_r") <= n_cells)
            .select(
                (F.col("_r") - 1).cast("long").alias("cell"),
                F.col("svec").alias("_sv"),
            )
        )
        rows = seeds.orderBy("cell").collect()  # bounded: ≤ n_cells rows
        S = np.asarray([r["_sv"] for r in rows], dtype=np.int64)
        cells_arr = np.asarray([r["cell"] for r in rows], dtype=np.int64)
        ss = (S * S).sum(axis=1)

        def _assign(side: DataFrame, id_col: str, keep: int) -> DataFrame:
            k = min(keep, len(cells_arr))

            def run(batches):
                import pandas as pd

                for pdf in batches:
                    if pdf.empty:
                        continue
                    V = np.array(
                        [np.asarray(v, dtype=np.int64) for v in pdf["svec"]]
                    )
                    vv = (V * V).sum(axis=1)
                    # exact int64 squared L2; ties break to the SMALLER cell
                    # because columns are cell-ascending and the stable sort
                    # preserves column order among equal distances
                    d = vv[:, None] + ss[None, :] - 2 * (V @ S.T)
                    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
                    yield pd.DataFrame(
                        {
                            id_col: np.repeat(pdf[id_col].to_numpy(), k),
                            "cell": cells_arr[idx].reshape(-1),
                        }
                    )

            return side.mapInPandas(run, f"{id_col} long, cell long")

    else:

        def _assign(side: DataFrame, id_col: str, keep: int) -> DataFrame:
            d = side.join(F.broadcast(seeds), on=F.lit(True), how="inner").select(
                id_col,
                "cell",
                sq_dist_long(F.col("svec"), F.col("_sv")).alias("_d"),
            )
            w = Window.partitionBy(id_col).orderBy(
                F.col("_d").asc(), F.col("cell").asc()
            )
            return (
                d.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= keep)
                .select(id_col, "cell")
            )

    return _assign(q_sum, "q_id", nprobe), _assign(t_sum, "t_id", 1)


def maxsim_topk_routed(
    q_tokens: DataFrame,
    t_tokens: DataFrame,
    k: int,
    n_cells: int = 4,
    nprobe: int | None = None,
    scale: int = 1000,
    q_sum: DataFrame | None = None,
    t_sum: DataFrame | None = None,
) -> DataFrame:
    """Cell-routed multi-vector MaxSim — the scale rung of ``maxsim_topk``:
    exact token-level late interaction runs ONLY on (query, doc) pairs
    that share a routing cell, so per-task work is per-cell, never
    |Q|·|T|·tokens².

    Routing is deterministic end-to-end (the trained-IVF doctrine): each
    doc is summarized by its int64 token-sum vector
    (``maxsim_doc_summaries``), seeds are the first ``n_cells`` docs by
    (md5(t_id), t_id) — a pure function of the ids — and assignment is
    exact int64 squared L2 to the nearest seed (ties → smaller cell).
    Queries route through the same metric to their ``nprobe`` nearest
    cells.  With ``nprobe = n_cells`` the candidate set is all pairs and
    the output is BIT-IDENTICAL to ``maxsim_topk`` — cells become a pure
    partitioning device (the IVF-PQ routed-identity doctrine), which is
    exactly what the shared-oracle gate pins.

    Shape: summaries are one aggregation each side; the n_cells-row seed
    table broadcasts (corpus never shuffles for assignment); candidates
    come from an equi-join on cell; scoring joins tokens by id within
    candidates — every join keyed, the only broadcast is O(n_cells) or
    O(|Q| tokens).  Hot-cell degradation is one straggler task, the
    measured IVF hot-cell story (SCALE.md §hot-cell).
    """
    if nprobe is None:
        nprobe = n_cells
    q_cells, t_cells = maxsim_route_cells(
        q_tokens, t_tokens, n_cells, nprobe, scale, q_sum=q_sum, t_sum=t_sum
    )
    cand = q_cells.join(t_cells, "cell").select("q_id", "t_id").distinct()
    q = q_tokens.select(
        "q_id", "q_tok", quantize_vec(F.col("vec"), scale).alias("_qv")
    )
    t = t_tokens.select(
        "t_id", "t_tok", quantize_vec(F.col("vec"), scale).alias("_tv")
    )
    inter = (
        cand.join(q, "q_id")
        .join(t, "t_id")
        .select("q_id", "t_id", "q_tok", _dot_long(F.col("_qv"), F.col("_tv")).alias("_dot"))
    )
    per_qtok = inter.groupBy("q_id", "t_id", "q_tok").agg(F.max("_dot").alias("_best"))
    scores = per_qtok.groupBy("q_id", "t_id").agg(
        F.sum("_best").cast("long").alias("maxsim_units"),
        F.count(F.lit(1)).cast("long").alias("n_q_tokens"),
    )
    return window_rank_topk(
        scores.filter(F.col("q_id") != F.col("t_id")),
        ["q_id"],
        [F.col("maxsim_units").desc(), F.col("t_id").asc()],
        k,
        rank_col="rnk",
    )


def maxsim_topk_routed_vectorized(
    q_tokens: DataFrame,
    t_tokens: DataFrame,
    k: int,
    n_cells: int = 4,
    nprobe: int | None = None,
    scale: int = 1000,
    routing: str = "hash",
) -> DataFrame:
    """Fully-distributed vectorized MaxSim serving — the
    ``ivf_topk_prebuilt_routed`` shape applied to the multi-vector rung,
    and the production hot path: the expression twin's per-token-pair HOF
    dots evaluate interpreted (the documented HOF landmine), while here
    each cell does ONE int64 numpy matmul per (query, doc) token block.

    Routing is ``maxsim_route_cells`` — the SAME chain as
    ``maxsim_topk_routed``, shared by construction, so the candidate sets
    are identical and the scoring is bit-identical: quantization happens
    in the expression layer (``quantize_vec``, one rounding mode in play)
    BEFORE the tokens reach numpy, and int64 matmul/max/sum are exact.
    No driver collect anywhere: queries and corpus stay DataFrames
    end-to-end; per-doc token matrices are packed by a
    ``sort_array(collect_list(struct(tok, vec)))`` aggregation (token
    order fixed by the sort, though max over doc tokens and sum over the
    sorted query tokens are order-free anyway).

    Shuffle shape: one pack aggregation per side, one exchange of each on
    cell, the cogroup, then the global window top-k over per-cell
    candidates (each doc lives in exactly one cell → candidates are
    duplicate-free; union-of-local-top-k applies per query).  Hot cells
    are one straggler task — k_cells at route-build time is the documented
    mitigation, as for IVF.

    ``routing`` picks the cell builder: ``"hash"`` = md5-seeded
    ``maxsim_route_cells`` (no training pass; exact with nprobe=all, the
    gate shape, and the benched nprobe=8 default); ``"trained"`` =
    ``maxsim_route_cells_trained`` (k-means over the summaries) — the
    measured A/B (SCALE.md §maxsim-trained-serving, VERDICT r7 #5) shows
    trained cells buy recall only at LOW probe fractions (nprobe ≤ 4 of
    64: 0.442→0.500 @1, 0.542→0.610 @4) and wash out by nprobe=8, so
    trained is the low-probe-budget serving choice, not the default.
    Scoring downstream of the cells is byte-identical either way.
    """
    import numpy as np
    import pyarrow as pa

    if nprobe is None:
        nprobe = n_cells
    if routing == "trained":
        q_cells, t_cells = maxsim_route_cells_trained(
            q_tokens, t_tokens, n_cells, nprobe, scale=scale
        )
    else:
        # expression assign, deliberately: the numpy vectorized_assign twin
        # MEASURED SLOWER at this exact shape (round-10 A/B, min-of-5 —
        # 4.87 s vs 3.76 s full-row; naive version without summary
        # materialization 5.49 s): the eager summary job + Arrow hop cost
        # more than the interpreted HOF distances they replace at
        # 10k docs × 64 cells.  The twin stays implemented + identity-
        # gated for the regime where it should win (n_cells in the
        # hundreds+, where the |docs|·n_cells HOF explode dominates).
        q_cells, t_cells = maxsim_route_cells(q_tokens, t_tokens, n_cells, nprobe, scale)

    def _pack(tokens: DataFrame, id_col: str, tok_col: str) -> DataFrame:
        # FLAT array<long> of the concatenated token vectors + a token
        # count, NOT array<array<long>>: pyarrow segfaults converting
        # large doubly-nested list columns on the cogroup deserialization
        # path (observed at the 10k-doc bench scale; single-level arrays
        # are the proven ivf_topk_prebuilt_routed shape) — numpy reshapes
        # per doc instead
        q = tokens.select(
            F.col(id_col),
            F.col(tok_col).alias("_tok"),
            quantize_vec(F.col("vec"), scale).alias("_qv"),
        )
        packed = q.groupBy(id_col).agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_tok", "_qv"))),
                lambda s: s["_qv"],
            ).alias("_toks")
        )
        return packed.select(
            id_col,
            F.size("_toks").cast("long").alias("n_toks"),
            F.flatten("_toks").alias("toks"),
        )

    # the q and t sides often share lineage (queries ARE corpus docs in the
    # audits), which trips Spark's ambiguous-self-join analysis inside the
    # cogroup — re-alias the grouping column through a fresh exprId on one
    # side so the two children are distinguishable
    q_packed = _pack(q_tokens, "q_id", "q_tok").join(q_cells, "q_id").select(
        (F.col("cell") + F.lit(0)).alias("cell"), "q_id", "n_toks", "toks"
    )
    t_packed = _pack(t_tokens, "t_id", "t_tok").join(t_cells, "t_id").select(
        "cell", "t_id", "n_toks", "toks"
    )

    empty = pa.table(
        {
            "q_id": pa.array([], pa.int64()),
            "t_id": pa.array([], pa.int64()),
            "maxsim_units": pa.array([], pa.int64()),
            "n_q_tokens": pa.array([], pa.int64()),
        }
    )

    # Arrow-native cogroup scorer (round 15 — the same §4.2 boundary fix as
    # _block_cogroup_scorer_arrow): the flat token-matrix columns cross the
    # Python boundary as ONE contiguous int64 buffer per side (list offsets
    # give the per-doc slices) instead of being boxed into object-dtype
    # pandas cells one numpy array per row.  The numpy core — one
    # exactness-guarded matmul per (query, cell), segmented max, int64 sum —
    # is byte-for-byte the pandas twin's, so results stay bit-identical.
    def score(mem: "pa.Table", qs: "pa.Table") -> "pa.Table":
        if mem.num_rows == 0 or qs.num_rows == 0:
            return empty
        t_ids = mem.column("t_id").to_numpy()
        # ragged docs arrive FLAT: one concatenated int64 vector per doc
        # plus its token count; infer dim from the first doc and reshape
        counts = mem.column("n_toks").to_numpy()
        toks_arr = mem.column("toks").combine_chunks()
        if toks_arr.null_count:
            raise ValueError("NULL token matrix in maxsim cogroup scorer input")
        m_offs = np.asarray(toks_arr.offsets)
        flat_all = toks_arr.flatten().to_numpy(zero_copy_only=False)
        dim = int(m_offs[1] - m_offs[0]) // int(counts[0])
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        T_all = flat_all.reshape(-1, dim)
        q_toks_arr = qs.column("toks").combine_chunks()
        if q_toks_arr.null_count:
            raise ValueError("NULL token matrix in maxsim cogroup scorer input")
        # offsets of a sliced ListArray need not start at 0, while flatten()
        # returns only the covered values — rebase so they index q_flat
        q_offs = np.asarray(q_toks_arr.offsets)
        q_offs = q_offs - q_offs[0]
        q_flat = q_toks_arr.flatten().to_numpy(zero_copy_only=False)
        out_q, out_t, out_units, out_ntok = [], [], [], []
        for qi, (qid, qn) in enumerate(
            zip(qs.column("q_id").to_numpy(), qs.column("n_toks").to_numpy())
        ):
            Q = q_flat[q_offs[qi]:q_offs[qi + 1]].reshape(int(qn), -1)
            # ONE matmul per (query, cell), then a segmented max per doc:
            # max and sum over int64 are exact, so this is bit-identical to
            # the expression path's per-token-pair fold.  Round 14: route
            # the matmul through float64 BLAS when provably exact (every
            # dot AND the nq-term sum are integers < 2^53 — see
            # exact_int_matmul); numpy int64 matmul is a naive C loop.
            mq = int(np.abs(Q).max(initial=0))
            mt = int(np.abs(T_all).max(initial=0))
            if mq * mt * Q.shape[1] * max(int(qn), 1) < 2**53:
                dots = Q.astype(np.float64) @ T_all.T.astype(np.float64)
                seg_max = np.maximum.reduceat(dots, starts, axis=1)
                sums = seg_max.sum(axis=0).astype(np.int64)
            else:
                dots = Q @ T_all.T                                   # (nq, Σ|doc|)
                seg_max = np.maximum.reduceat(dots, starts, axis=1)  # (nq, |docs|)
                sums = seg_max.sum(axis=0)                           # (|docs|,)
            keep = t_ids != qid
            if not keep.any():
                continue
            n_keep = int(keep.sum())
            out_q.append(np.full(n_keep, qid, dtype=np.int64))
            out_t.append(t_ids[keep])
            out_units.append(sums[keep])
            out_ntok.append(np.full(n_keep, int(qn), dtype=np.int64))
        if not out_q:
            return empty
        return pa.table(
            {
                "q_id": np.concatenate(out_q),
                "t_id": np.concatenate(out_t),
                "maxsim_units": np.concatenate(out_units),
                "n_q_tokens": np.concatenate(out_ntok),
            }
        )

    cand = (
        t_packed.groupBy("cell")
        .cogroup(q_packed.groupBy("cell"))
        .applyInArrow(score, "q_id long, t_id long, maxsim_units long, n_q_tokens long")
    )
    return window_rank_topk(
        cand, ["q_id"], [F.col("maxsim_units").desc(), F.col("t_id").asc()], k, rank_col="rnk"
    )


def maxsim_route_cells_trained(
    q_tokens: DataFrame,
    t_tokens: DataFrame,
    n_cells: int,
    nprobe: int,
    n_iter: int = 2,
    scale: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """TRAINED routing for cell-routed MaxSim: k-means over the int64
    token-sum summaries (``kmeans_fit`` with scale=1 — the summaries are
    already integers, so quantization is the identity and the whole chain
    stays hash-gateable), replacing the md5-seeded arbitrary cells of
    ``maxsim_route_cells``.  This is the measured recall lever SCALE.md
    §maxsim names: cells that follow the summary distribution keep true
    neighbors co-located, exactly as k-means training did for
    single-vector IVF.  Same return contract: (q_cells, t_cells)."""
    from .clustering import kmeans_fit

    t_sum = maxsim_doc_summaries(t_tokens, "t_id", scale)
    q_sum = maxsim_doc_summaries(q_tokens, "q_id", scale)
    cents = kmeans_fit(
        t_sum.select(F.col("t_id").alias("vec_id"), F.col("svec").alias("embedding")),
        k=n_cells,
        n_iter=n_iter,
        scale=1,
    )

    def _assign(side: DataFrame, id_col: str, keep: int) -> DataFrame:
        scored = side.join(F.broadcast(cents), on=F.lit(True), how="inner").select(
            id_col, "cell", sq_dist_long(F.col("svec"), F.col("cv")).alias("_d")
        )
        w = Window.partitionBy(id_col).orderBy(F.col("_d").asc(), F.col("cell").asc())
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep)
            .select(id_col, F.col("cell").cast("long").alias("cell"))
        )

    return _assign(q_sum, "q_id", nprobe), _assign(t_sum, "t_id", 1)


def range_search_routed(
    em: DataFrame,
    queries: DataFrame,
    n_cells: int,
    nprobe: int,
    tau_num: int = 1,
    tau_den: int = 4,
) -> DataFrame:
    """Cell-routed RADIUS search: all corpus vectors with cosine ≥
    tau_num/tau_den of each query, candidates served through md5-seeded
    IVF cells instead of a full scan.

    ``em``/``queries`` carry (vec_id, qv, norm_sq) — HALF_UP-quantized
    int64 vectors with exact norms (the `quantize_vec` contract).  Seeds
    are the first ``n_cells`` corpus vectors by (md5(vec_id), vec_id) —
    the `maxsim_route_cells` seeding doctrine; corpus vectors assign to
    their single nearest seed by EXACT int64 squared L2 (ties → smaller
    cell), queries keep their ``nprobe`` nearest cells by the same
    measure, and candidates come from the (cell) equi-join.  The refine
    is the exact integer cross-multiplication the brute tier gates:
    cos ≥ n/d ⟺ dot ≥ 0 ∧ d²·dot² ≥ n²·|q|²·|t|², squared compare in
    DECIMAL(38,0) (dot ~ 7.6e8 wraps d²·dot² past BIGINT).

    At ``nprobe = n_cells`` every cell is probed, the candidate set is
    all (query, corpus) pairs, and the output is bit-identical to the
    brute scan — the routed-identity proof.  At nprobe < n_cells recall
    is structural for exact duplicates: identical vectors quantize
    identically, hence assign to the same cell, hence are recovered at
    nprobe = 1.  Every piece of routing state is integer-exact, so the
    candidate SET (not just the refined output) is engine-independent.
    """
    seeds = (
        em.select(
            "vec_id",
            "qv",
            F.row_number()
            .over(Window.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id")))
            .alias("_r"),
        )
        .filter(F.col("_r") <= n_cells)
        .select((F.col("_r") - 1).cast("long").alias("cell"), F.col("qv").alias("cv"))
    )

    def _assign(side: DataFrame, keep: int, out_id: str) -> DataFrame:
        scored = side.join(F.broadcast(seeds), on=F.lit(True), how="inner").select(
            F.col("vec_id").alias(out_id),
            "cell",
            sq_dist_long(F.col("qv"), F.col("cv")).alias("_d"),
        )
        w = Window.partitionBy(out_id).orderBy(F.col("_d").asc(), F.col("cell").asc())
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep)
            .select(out_id, "cell")
        )

    t_cells = _assign(em, 1, "t_id")
    q_cells = _assign(queries, nprobe, "q_id")
    cand = q_cells.join(t_cells, on="cell").filter(
        F.col("t_id") != F.col("q_id")
    ).select("q_id", "t_id")
    qv = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("qv").alias("q_qv"),
        F.col("norm_sq").alias("q_norm"),
    )
    tv = em.select(
        F.col("vec_id").alias("t_id"),
        F.col("qv").alias("t_qv"),
        F.col("norm_sq").alias("t_norm"),
    )
    scored = (
        cand.join(F.broadcast(qv), on="q_id")
        .join(tv, on="t_id")
        .select(
            "q_id",
            "t_id",
            _dot_long(F.col("q_qv"), F.col("t_qv")).alias("dot_q"),
            "q_norm",
            "t_norm",
        )
    )
    d2, n2 = tau_den * tau_den, tau_num * tau_num
    return scored.filter(
        (F.col("dot_q") >= 0)
        & (
            F.expr(f"{d2} * CAST(dot_q AS DECIMAL(38,0)) * dot_q")
            >= F.expr(f"{n2} * CAST(q_norm AS DECIMAL(38,0)) * t_norm")
        )
    ).select("q_id", "t_id", "dot_q")
