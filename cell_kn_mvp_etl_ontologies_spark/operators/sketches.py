"""Fixed-size mergeable sketches: a Bloom filter for join pruning and a
deterministic count-min sketch for heavy-hitter frequency estimation.

Both sketches derive every hash position from md5 with Kirsch–Mitzenmacher
double hashing (one digest per value; positions ``h1 + i*h2 mod m`` — the
same doctrine as operators/dedup.py's MinHash), so every BIT of the sketch —
not just the final answer — is reproducible in any engine with md5 and
64-bit integer ops, and the catalog queries hash-gate the sketches
cross-engine against DuckDB.

Why these exist at 100 TB:

- ``bloom_build`` / ``bloom_prefilter``: a semi-join reduction.  Joining a
  100 TB fact side to a selective dimension subset normally shuffles the
  ENTIRE fact table on the join key before the join discards most of it.
  A Bloom filter over the small side's keys is a few KB of BIGINT words,
  broadcast for free; applying it as a plain filter BEFORE the exchange
  means only rows that can possibly match are ever shuffled.  False
  positives just ride through to the exact join (no correctness impact);
  false negatives are impossible.  This is what Spark's runtime row-group /
  bloom pruning (spark.sql.optimizer.runtime.bloomFilter.enabled) does
  adaptively; the explicit operator makes the reduction available to any
  plan shape (e.g. ahead of an aggregation, or against a pre-materialized
  key set) and keeps it deterministic and gate-checkable.

- ``count_min_build`` / ``count_min_estimate``: frequency estimates with
  ``depth*width`` cells of bounded state per group — the answer to "how
  often does each of these items occur" when the item domain is too large
  to count exactly.  Cells are plain (row, col, cnt) aggregates, so sketches
  from different shards MERGE by summing cells (the same re-aggregation
  property the bitmap words in operators/aggregates.py deliver for distinct
  counts).  Estimates only ever over-count (min over rows of colliding
  sums), never under-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _km_hashes(value: Column, salt: str) -> tuple[Column, Column]:
    """(h1, h2) from ONE md5 digest: two 60-bit non-negative BIGINTs; h2 is
    forced odd so the Kirsch–Mitzenmacher sequence h1 + i*h2 walks the whole
    table for power-of-two widths."""
    d = F.md5(F.concat_ws("|", F.lit(salt), value.cast("string")))
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 16, 15), 16, 10).cast("long").bitwiseOR(F.lit(1))
    return h1, h2


def _km_hashes_fast(value: Column, salt: str) -> tuple[Column, Column]:
    """The production sibling of ``_km_hashes``: two xxhash64 calls — native,
    codegen'd, ~20x cheaper per evaluation than the md5+conv pair.  This
    matters because Catalyst inlines these expressions into join conditions
    and filters where common subexpressions are NOT eliminated: each of the
    k bit tests re-evaluates both hashes (measured 3.7 s md5 vs 0.7 s
    xxhash64 over 600k rows at k=4).  Same portable-vs-fast doctrine as
    operators/dedup.py's MinHash.  Build and probe MUST agree on the
    setting — the bit positions differ between the two families."""
    # 59-bit mask: h1 + i*h2 stays under 2^63 for i <= 15.  NOTE the md5
    # path's 15-hex-char substrings give 60 bits, which is only safe to
    # i <= 7 — both bounds are enforced by _check_km_positions
    mask = F.lit((1 << 59) - 1)
    h1 = F.xxhash64(F.lit(salt), value).bitwiseAND(mask)
    h2 = F.xxhash64(F.lit(salt + "#2"), value).bitwiseAND(mask).bitwiseOR(F.lit(1))
    return h1, h2


def _check_km_positions(n_positions: int, portable: bool, what: str) -> None:
    """Overflow guard for the KM walk h1 + i*h2 (ADVICE r4).

    The md5 path yields 60-bit h1/h2, so h1 + i*h2 < (i+1)*2^60 stays under
    2^63 only for i <= 7 — with k >= 9 positions the sum overflows int64
    (negative word indices, or an ANSI error).  The xxhash64 path masks to
    59 bits, safe to i <= 15.  Masking md5 to 59 bits instead would change
    every already-gate-verified sketch bit pattern and its DuckDB oracle,
    so the bound is enforced rather than papered over."""
    limit = 8 if portable else 16
    if n_positions > limit:
        raise ValueError(
            f"{what}: {'md5-portable' if portable else 'xxhash64'} KM hashing "
            f"supports at most {limit} positions without int64 overflow "
            f"(got {n_positions}); lower k/depth or switch hash family"
        )


def _hashes(value: Column, salt: str, portable: bool) -> tuple[Column, Column]:
    return _km_hashes(value, salt) if portable else _km_hashes_fast(value, salt)


def bloom_build(
    df: DataFrame,
    key: str,
    m_bits: int = 2048,
    k: int = 4,
    salt: str = "bloom",
    portable: bool = True,
) -> DataFrame:
    """Build a Bloom filter over ``df[key]`` as ONE row holding a
    MAP<BIGINT, BIGINT> from word index to 32-bit word (see inline note on
    why not 64).

    Each key contributes ``k`` bit positions (one digest, KM-derived);
    positions fold to words via ``bit_or`` per 64-bit chunk — a tiny
    aggregate whose partial states are already the final representation, so
    the build is one scan + one ``m_bits/64``-row shuffle regardless of input
    size.  Absent words mean all-zero (``bloom_prefilter`` coalesces), so the
    map stays sparse for underfull filters.

    NULL keys: concat_ws drops the NULL, so every NULL key hashes to one
    constant position set — a build containing NULLs lets NULL probe rows
    through (conservative; the exact join downstream never matches
    NULL=NULL, so correctness is unaffected).  Pinned in
    tests/test_sketches.py.
    """
    _check_km_positions(k, portable, "bloom_build")
    positions = []
    h1, h2 = _hashes(F.col(key), salt, portable)
    for i in range(k):
        # bounded by _check_km_positions: h1 + i*h2 < 2^63 for all allowed i
        positions.append((h1 + F.lit(i) * h2) % F.lit(m_bits))
    # 32 bits per BIGINT word, not 64: bit 63 would need shiftleft(1, 63),
    # whose negative result DuckDB rejects as overflow — 32-bit words keep
    # every word non-negative so the oracle can replicate the filter verbatim
    bits = df.select(F.explode(F.array(*positions)).alias("pos")).select(
        F.floor(F.col("pos") / 32).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
    )
    words = bits.groupBy("word_idx").agg(F.bit_or("bit").alias("word"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("bloom")
    )


def _word_test(word: Column, pos: Column) -> Column:
    """True iff bit ``pos % 32`` is set in ``word`` (NULL word = empty).
    bit_get is a plain codegen'd expression — higher-order forall/transform
    formulations measured SLOWER here (HOF lambdas evaluate interpreted,
    allocating a positions array per row)."""
    return (
        F.bit_get(F.coalesce(word, F.lit(0).cast("long")), (pos % 32).cast("int"))
        == 1
    )


def _membership(key: Column, lookup, m_bits: int, k: int, salt: str, portable: bool) -> Column:
    """Conjunction of the k bit tests; ``lookup`` maps a word-index Column to
    a word Column (map lookup for the broadcast frame, element_at for the
    literal-array variant)."""
    _check_km_positions(k, portable, "bloom probe")
    h1, h2 = _hashes(key, salt, portable)
    keep = None
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % F.lit(m_bits)
        test = _word_test(lookup(F.floor(pos / 32).cast("long")), pos)
        keep = test if keep is None else keep & test
    return keep


def _attach_tests(big, key, bloom, m_bits, k, salt, portable):
    """Cross-join the 1-row bloom frame onto ``big`` and return (frame,
    membership Column)."""
    out = big.crossJoin(F.broadcast(bloom))
    keep = _membership(
        F.col(key),
        lambda idx: F.element_at(F.col("bloom"), idx),
        m_bits,
        k,
        salt,
        portable,
    )
    return out, keep


def bloom_prefilter(
    big: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
    salt: str = "bloom",
    portable: bool = True,
) -> DataFrame:
    """Keep only rows of ``big`` whose ``key`` MIGHT be in the filter.

    ``bloom`` is the 1-row frame from ``bloom_build`` — broadcast via a 1-row
    crossJoin (the sanctioned broadcast-stats pattern), then each of the k
    bit tests is a pure JVM expression over the map, so the filter runs
    inside the scan's WholeStageCodegen and rows are dropped BEFORE any
    exchange.  Guarantee: never drops a true match (no false negatives);
    survivors still need the exact join/semijoin downstream.
    """
    out, keep = _attach_tests(big, key, bloom, m_bits, k, salt, portable)
    return out.filter(keep).drop("bloom")


def bloom_prefilter_materialized(
    big: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
    salt: str = "bloom",
    portable: bool = True,
) -> DataFrame:
    """``bloom_prefilter`` with the words COLLECTED to the driver and embedded
    as an array literal — a pure Filter over the scan, no join at all.

    This is how Spark's own runtime bloom filter ships (the built sketch
    becomes a literal in the reused subquery), and what you want when the
    filter is reused across many queries or the extra BroadcastNestedLoopJoin
    node is unwelcome in the plan.  The collect is bounded by the filter
    size: m_bits/32 BIGINTs (2048 bits = 64 longs ≈ 0.5 KB; even 2^24 bits
    is 4 MB) — sketch-scale, not data-scale, the same class as the sink
    DDL's collection-list collect.  Triggers the bloom build job eagerly.
    Beyond 2^27 bits (16 MB of words) the literal stops being sketch-scale
    — :class:`guards.DriverBoundExceeded`, use ``bloom_prefilter``'s
    broadcast-join form instead.
    """
    from .guards import check_driver_bound

    check_driver_bound(
        m_bits,
        1 << 27,
        "bloom_prefilter_materialized (m_bits words embedded as a literal)",
        "bloom_prefilter (broadcast-join form, words never driver-side)",
    )
    [row] = bloom.collect()
    words = row[0] or {}
    dense = [int(words.get(i, 0)) for i in range(m_bits // 32)]
    # one ArrayType literal (not m/32 scalar literals) — a single constant in
    # the plan, cheap to codegen even for multi-MB filters
    arr = F.lit(dense).cast("array<bigint>")
    keep = _membership(
        F.col(key),
        lambda idx: F.element_at(arr, (idx + 1).cast("int")),
        m_bits,
        k,
        salt,
        portable,
    )
    return big.filter(keep)


def bloom_mark(
    big: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
    salt: str = "bloom",
    out_col: str = "is_candidate",
    portable: bool = True,
) -> DataFrame:
    """Like ``bloom_prefilter`` but ADDS a boolean membership column instead
    of filtering — for screening flows that need both populations in one
    pass (e.g. route bloom-positive rows to an exact check and bloom-negative
    rows straight to the definitely-new path)."""
    out, keep = _attach_tests(big, key, bloom, m_bits, k, salt, portable)
    return out.withColumn(out_col, keep).drop("bloom")


def count_min_build(
    df: DataFrame,
    item: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
    portable: bool = True,
) -> DataFrame:
    """Count-min sketch cells: (r BIGINT, c BIGINT, cnt BIGINT), one row per
    non-empty cell, ``r`` in [0, depth), ``c`` in [0, width).

    One md5 digest per input row; the ``depth`` cell columns are KM-derived
    from it.  The build is a single scan + one aggregate at ``depth*width``
    cardinality (map-side partials do almost all the work — the shuffle
    moves at most depth*width rows per task).  Sketches over different data
    slices merge by summing ``cnt`` per (r, c).  NULL items collapse to
    one pseudo-item (constant digest input) — drop NULLs upstream if they
    should not be counted.
    """
    _check_km_positions(depth, portable, "count_min_build")
    h1, h2 = _hashes(F.col(item), salt, portable)
    cells = []
    for r in range(depth):
        cells.append(
            F.struct(
                F.lit(r).cast("long").alias("r"),
                ((h1 + F.lit(r) * h2) % F.lit(width)).alias("c"),
            )
        )
    exploded = df.select(F.explode(F.array(*cells)).alias("rc")).select("rc.r", "rc.c")
    return exploded.groupBy("r", "c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def count_min_estimate(
    probes: DataFrame,
    item: str,
    cms: DataFrame,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
    portable: bool = True,
) -> DataFrame:
    """Estimated frequency for each probe item: min over the sketch's rows of
    the probed cells — the classic CMS point query, as a broadcast join.

    ``cms`` has at most depth*width rows (KBs), so it broadcasts; probing is
    a probe-side explode to (item, r, c) + broadcast-hash left join + min.
    Output: (item, cms_est BIGINT) with cms_est >= the true count always.
    """
    _check_km_positions(depth, portable, "count_min_estimate")
    h1, h2 = _hashes(F.col(item), salt, portable)
    cells = []
    for r in range(depth):
        cells.append(
            F.struct(
                F.lit(r).cast("long").alias("r"),
                ((h1 + F.lit(r) * h2) % F.lit(width)).alias("c"),
            )
        )
    probe_cells = probes.select(
        F.col(item), F.explode(F.array(*cells)).alias("rc")
    ).select(item, "rc.r", "rc.c")
    joined = probe_cells.join(F.broadcast(cms), ["r", "c"], "left")
    return joined.groupBy(item).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est")
    )
