"""Training-data pipeline operators: deterministic splits, stratified
sampling, weighted interleaving, sequence packing, shard assignment,
embedding quantization, and benchmark-contamination checks.

The reference pipeline ends at graph construction
(``OntologyGraphBuilder.java:491-626``); these operators extend the engine
with the operations an LLM training-data pipeline runs downstream of ETL at
100 TB — carving a corpus into train/val/test, rebalancing source mixtures,
packing documents into fixed token budgets, and screening against held-out
benchmarks.

Determinism contract
--------------------
Every sampling/split decision here is a pure function of ``(key, salt)``
via md5 — NO ``rand()``, no RNG state, no partition-order dependence.
Re-running on the same corpus yields byte-identical decisions regardless of
cluster size, partitioning, or task retries (a ``rand()``-based split
changes membership whenever a task is re-attempted — silent train/test
contamination at scale).  The same decisions are expressible in ANSI SQL,
which is exactly what the DuckDB oracles in ``catalog/training.py`` run.

Scale notes
-----------
- ``hash_bucket``/``hash_fraction`` are single md5 + conv projections:
  JVM-side, codegen'd, no shuffle, no state.
- ``split_train_val_test`` / ``sample_stratified`` / ``interleave_weighted``
  are pure narrow projections+filters — they pipeline into whatever scan
  precedes them and cost one pass.
- ``pack_sequences`` windows are PARTITIONED by shard — no global window,
  each shard packs independently (the 100 TB layout: thousands of shards,
  each a few GB).  The greedy variant is an ``applyInPandas`` per shard:
  Arrow-batched, state bounded by one shard's rows.
- ``interleave_weighted`` deliberately does NOT assign a global
  ``row_number`` (a single-partition window at scale); the order hash itself
  is the shuffle key — range-partition on it at write time and the stream is
  globally shuffled without any global coordination.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_fraction",
    "split_train_val_test",
    "sample_stratified",
    "interleave_weighted",
    "assign_shards",
    "pack_sequences",
    "pack_sequences_greedy",
    "quantize_embeddings_int8",
    "contamination_ngrams",
]

# 2^32: the first 8 hex chars of md5 are a uniform 32-bit integer.
_HASH_SPACE = float(1 << 32)


def _hash32(key: Column, salt: str) -> Column:
    d = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(d, 1, 8), 16, 10).cast("long")


def hash_bucket(key: Column, n_buckets: int, salt: str = "") -> Column:
    """Uniform bucket in ``[0, n_buckets)`` from ``md5(salt || key)``.

    2^32 >> n_buckets, so modulo bias is < n_buckets/2^32 (negligible).
    Pure projection — no shuffle, no RNG state.
    """
    return (_hash32(key, salt) % F.lit(n_buckets)).cast("int")


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform double in ``[0, 1)`` from ``md5(salt || key)``.

    h < 2^32 is exactly representable in a double and the divisor is a
    power of two, so the division is exact — Spark and any ANSI SQL engine
    compute bit-identical fractions.
    """
    return _hash32(key, salt) / F.lit(_HASH_SPACE)


def split_train_val_test(
    df: DataFrame,
    key: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Deterministic hash-threshold split: membership is a pure function of
    the key, so adding/removing OTHER rows never moves a row between splits
    (contrast ``randomSplit``, which reshuffles membership on every change
    of input partitioning — train/test leakage across pipeline re-runs).
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    frac = hash_fraction(F.col(key), salt)
    # chained CASE with cumulative upper bounds: frac < w0 -> names[0],
    # frac < w0+w1 -> names[1], ..., else names[-1]
    cum = 0.0
    expr = None
    for w, name in zip(weights[:-1], names[:-1]):
        cum += w
        expr = (F.when if expr is None else expr.when)(frac < F.lit(cum), F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out, expr)


def split_by_group_leakage_safe(
    df: DataFrame,
    group_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "groupsplit",
    out: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: the hash threshold is applied to
    the GROUP key (url domain, source, author, dedup-cluster id), so every
    member of a group lands in the same split — the guard against the
    classic evaluation leak where near-identical documents from one domain
    straddle train and test and inflate held-out metrics.

    Same determinism contract as ``split_train_val_test`` (membership a
    pure function of (group, salt); re-runs/repartitions/retries stable),
    and the same zero-shuffle shape — a pure projection, since the group
    key is already on the row.  Weights apportion GROUPS, not rows: a
    heavy group drags its whole mass into one split by design (that IS the
    leakage guarantee) — rebalance by splitting at a finer group key, not
    by letting members straddle."""
    return split_train_val_test(df, group_col, weights, names, salt, out)


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key: str,
    salt: str = "strat",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff its hash fraction is
    below its stratum's rate.  Unlike ``df.sampleBy`` (Bernoulli on a
    per-partition RNG), re-runs and retries keep the SAME rows.

    The fraction lookup is a literal map → pure projection; no join.
    """
    frac_map = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )
    rate = F.coalesce(frac_map[F.col(strata_col)], F.lit(float(default_fraction)))
    return df.filter(hash_fraction(F.col(key), salt) < rate)


def sample_weighted(
    df: DataFrame,
    key: str,
    weight_col: str,
    base_rate: float,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic importance sampling: keep a row with probability
    ``min(1, base_rate × weight)`` — the quality-weighted downsample every
    curation pipeline runs (keep high-quality documents at a higher rate)
    made reproducible.

    Acceptance compares the md5 hash fraction (exact double, see
    ``hash_fraction``) against ``base_rate * weight`` — one multiply of
    exact inputs, bit-identical in any IEEE engine.  Membership is a pure
    function of (key, salt, weight), so re-runs, retries, and repartitioning
    keep exactly the same rows, and a row's fate changes only if ITS weight
    changes — the property that makes weighted re-sampling diffable across
    pipeline versions.  Pure projection+filter: no shuffle, no RNG state.
    """
    threshold = F.lit(float(base_rate)) * F.col(weight_col)
    return df.filter(hash_fraction(F.col(key), salt) < threshold)


def interleave_weighted(
    df: DataFrame,
    source_col: str,
    weights: Mapping[str, float],
    key: str,
    salt: str = "mix",
    order_out: str = "order_hash",
) -> DataFrame:
    """Weighted mixture + deterministic global shuffle order.

    Each source is down-sampled to its acceptance rate (``weights`` in
    (0, 1]), then every surviving row gets an ``order_hash`` — sorting by it
    yields a reproducible, well-mixed interleaving of sources (the property
    epoch shuffling needs).  At scale: range-partition the write on
    ``order_hash``; no global row_number, no single-partition window.
    """
    accepted = sample_stratified(df, source_col, weights, key, salt=salt + ":acc")
    return accepted.withColumn(order_out, _hash32(F.col(key), salt + ":ord"))


def assign_shards(df: DataFrame, key: str, n_shards: int, salt: str = "shard", out: str = "shard") -> DataFrame:
    """Stable output sharding: shard = hash_bucket(key).  Rows keep their
    shard across re-runs (incremental rebuilds touch only changed shards);
    uniformity follows from the hash (checked by the catalog query)."""
    return df.withColumn(out, hash_bucket(F.col(key), n_shards, salt))


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
    bin_out: str = "bin",
) -> DataFrame:
    """Quotient packing: walk each shard in ``order_col`` order and assign
    ``bin = floor(tokens_before / budget)``.  Documents straddling a budget
    boundary stay in the earlier bin, so bins overflow by at most one
    document — the cheap streaming approximation (one partitioned window,
    no state).  Use :func:`pack_sequences_greedy` for strict no-overflow
    packing.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn(bin_out, F.floor(before / F.lit(budget)).cast("long"))


def pack_sequences_greedy(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
    passthrough: Sequence[str] = (),
) -> DataFrame:
    """Strict greedy packing: walk each shard in order; a document that
    would overflow the current bin closes it and opens the next.  No bin
    exceeds ``budget`` unless a single document alone does.

    Sequential state per shard → ``applyInPandas`` (Arrow-batched, one
    group = one shard's rows, memory bounded by shard size — the 100 TB
    layout packs thousands of shards in parallel).  The semantics are still
    SQL-expressible (recursive CTE over per-shard row_number), which is what
    the DuckDB oracle runs.

    ``passthrough`` columns ride along through the packer unchanged —
    carrying labels through costs nothing here, whereas joining them back on
    the id afterwards is a full extra shuffle of both sides.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_cols = [shard_col, order_col, tokens_col, *passthrough]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for t in pdf[tokens_col].astype("int64"):
            if fill > 0 and fill + t > budget:
                cur += 1
                fill = 0
            fill += t
            bins.append(cur)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[out_cols + ["bin"]]

    sel = df.select(
        F.col(shard_col).cast("int").alias(shard_col),
        F.col(order_col).cast("long").alias(order_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        *passthrough,
    )
    schema = StructType(list(sel.schema.fields) + [StructField("bin", LongType())])
    return sel.groupBy(shard_col).applyInPandas(pack, schema=schema)


def pack_sequences_ffd(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """First-fit-decreasing packing: per shard, documents sort by token
    count DESCENDING (ties to the smaller ``order_col`` — determinism is
    part of the contract) and each goes into the FIRST open bin with room
    (bins are 1-indexed in creation order); an item larger than the budget
    opens its own bin.  The classic 11/9·OPT+6/9 heuristic, vs the strict
    arrival-order greedy of :func:`pack_sequences_greedy`.

    Generic extraction of the catalog's `pack_sequences_ffd` row (round
    11, catalog/frontier8.py) so composed chains (`pack_sequences_bpe`)
    reuse the exact packer.  Per-shard sequential state (the open-bin
    fill list) runs in one Arrow ``applyInPandas`` group per shard —
    thousands of shards pack in parallel, memory bounded by shard size."""
    from pyspark.sql.types import LongType, StructField, StructType

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [tokens_col, order_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        bins: list[int] = []
        for t in pdf[tokens_col].astype("int64"):
            for i, fll in enumerate(fills):
                if fll + t <= budget:
                    fills[i] += t
                    bins.append(i + 1)
                    break
            else:
                fills.append(int(t))
                bins.append(len(fills))
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[[shard_col, order_col, tokens_col, "bin"]]

    sel = df.select(
        F.col(shard_col).cast("long").alias(shard_col),
        F.col(order_col).cast("long").alias(order_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
    )
    schema = StructType(
        list(sel.schema.fields) + [StructField("bin", LongType())]
    )
    return sel.groupBy(shard_col).applyInPandas(pack, schema=schema)


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v| / 127``,
    ``q_i = floor(v_i / scale + 0.5)`` ∈ [-127, 127].

    ``floor(x + 0.5)`` (not ``round``) on purpose: Spark's round is
    half-even, DuckDB/C's is half-away — floor+0.5 is the one rounding both
    engines (and a downstream C++ inference stack) agree on bit-for-bit.
    All math in double; one pass, no shuffle.  Output is exploded
    ``(id, i, q, scale)`` so the oracle compares every component.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # nullif-guard the degenerate all-zero vector: scale = 0 would divide by
    # zero (NULL under Spark non-ANSI, undefined downstream); define q = 0.
    safe_scale = F.nullif(F.col("scale"), F.lit(0.0))
    return (
        df.select(F.col(id_col), v.alias("v"))
        .withColumn("scale", F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0))
        .select(
            id_col,
            "scale",
            F.posexplode(
                F.transform(
                    F.col("v"),
                    lambda x: F.coalesce(
                        F.floor(x / safe_scale + F.lit(0.5)), F.lit(0)
                    ).cast("long"),
                )
            ).alias("i", "q"),
        )
        .select(id_col, (F.col("i") + 1).alias("i"), "q", "scale")
    )


def contamination_ngrams(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_width: int = 8,
    prefix_len: int = 120,
) -> DataFrame:
    """Benchmark decontamination: count distinct character shingles each
    training document shares with ANY benchmark document.

    Both sides shingle a bounded prefix (cost cap), hash shingles to md5
    (tiny fixed-width join keys instead of raw text), dedup per side, and
    inner-join on the hash — a hash-partitioned equi-join whose build side
    (the benchmark set, thousands of docs) broadcasts at scale while the
    training side streams.  Output: ``(doc_id, n_hits)`` for docs with ≥ 1
    shared shingle; route them out with a left-anti join downstream.
    """

    def shingles(df: DataFrame, ident: str) -> DataFrame:
        prefix = F.substring(F.col(text_col), 1, prefix_len)
        n = F.greatest(F.length(prefix) - F.lit(shingle_width - 1), F.lit(0))
        # Spark sequence(1, 0) DESCENDS to [1, 0]: a text shorter than the
        # shingle width would emit a spurious whole-text shingle — guard with
        # an explicit empty array, like every other n-gram builder here.
        sh = F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.md5(prefix.substr(i, F.lit(shingle_width))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return (
            df.select(F.col(id_col).alias(ident), F.explode(sh).alias("sh"))
            .dropDuplicates([ident, "sh"])
        )

    bench_sh = shingles(benchmark, "bench_id").select("sh").distinct()
    doc_sh = shingles(docs, "doc_id")
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def sample_cap_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: str = "cap"
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``k`` rows per group,
    chosen by md5-hash order of the key (a reproducible uniform sample, not
    head-of-partition bias).  The domain-capping primitive: bound any one
    source/domain's share of the corpus.

    One shuffle (window by group); ties impossible (hash order is broken by
    the key itself).  Like every sampling op here, membership is a pure
    function of (key, salt) and the group's other members — stable under
    re-runs and repartitioning.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_fraction(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_source_sqrt(
    df: DataFrame,
    key: str,
    source_col: str,
    salt: str = "srcbal",
) -> DataFrame:
    """Square-root source balancing — the temperature-style corpus-mix
    downsample (the T=2 point of the p_s ∝ n_s^(1/T) family used to flatten
    multilingual / multi-source LLM training mixes): each source keeps rows
    at rate sqrt(min_n / n_s), so kept counts land ∝ sqrt(n_s) — large
    sources are damped toward the mix, the smallest source is kept whole.

    T=2 specifically because it stays bit-exact cross-engine: min_n and
    n_s are exact integers, their double division is one correctly-rounded
    op, and IEEE-754 sqrt is correctly rounded — unlike general pow(x, 1/T),
    which libm implementations round differently.  Membership compares the
    exact md5 hash fraction (``hash_fraction``) against that rate: a pure
    function of (key, salt, source counts), so re-runs and repartitioning
    keep exactly the same rows, and a row's fate changes only when its
    SOURCE's share changes.

    Shape: one dim-sized count aggregate (+ its global min — rows =
    #sources, KBs), broadcast back onto the corpus; the corpus itself is
    touched by one projection+filter, no corpus-sized shuffle.

    Output: input columns + (n_source, keep_rate) for observability.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_source"))
    min_n = counts.agg(F.min("n_source").alias("_min_n"))
    dim = counts.crossJoin(F.broadcast(min_n)).select(
        source_col,
        "n_source",
        F.sqrt(F.col("_min_n").cast("double") / F.col("n_source").cast("double")).alias(
            "keep_rate"
        ),
    )
    joined = df.join(F.broadcast(dim), on=source_col)
    return joined.filter(hash_fraction(F.col(key), salt) < F.col("keep_rate"))


def repeat_by_weight(
    df: DataFrame, key: str, weight: Column, salt: str = "repeat"
) -> DataFrame:
    """Deterministic fractional epoch repetition — the data-mixing step
    that UPSAMPLES a source beyond weight 1.0 (interleave_weighted only
    reweights order; this materializes repeats): a row with weight w
    appears floor(w) times plus one more with probability frac(w),
    decided by the md5 hash fraction of (salt, key) — a pure function of
    the row, so re-runs, retries, and repartitioning reproduce the exact
    same epoch multiset (the randomSplit-vs-hash doctrine applied to
    Poisson-ish upsampling; expected copies = w exactly).

    Zero-repeat rows (w < 1 and the coin says no) drop — fractional
    weights double as subsampling, one mechanism for the whole mixing
    range.  Shape: pure projection + bounded ``sequence`` explode, no
    shuffle, no RNG state; output rows carry ``epoch`` (1-based) and
    ``n_repeats``.
    """
    w = weight.cast("double")
    base = F.floor(w).cast("long")
    extra = (hash_fraction(F.col(key), salt) < (w - F.floor(w))).cast("long")
    rep = (base + extra).alias("n_repeats")
    out = df.withColumn("n_repeats", rep).filter(F.col("n_repeats") >= 1)
    return out.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.col("n_repeats").cast("int")))
    )
