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


def bloom_build(
    df: DataFrame, key: str, m_bits: int = 2048, k: int = 4, salt: str = "bloom"
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
    """
    positions = []
    h1, h2 = _km_hashes(F.col(key), salt)
    for i in range(k):
        # h1, h2 < 2^60 and i < k (small), so h1 + i*h2 stays well under 2^63
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


def _attach_tests(big, key, bloom, m_bits, k, salt):
    """Cross-join the 1-row bloom frame onto ``big``, materialize the k bit
    positions as temp columns, and return (frame, membership Column, temp
    column names)."""
    out = big.crossJoin(F.broadcast(bloom))
    h1, h2 = _km_hashes(F.col(key), salt)
    keep = None
    for i in range(k):
        pos = (h1 + F.lit(i) * h2) % F.lit(m_bits)
        out = out.withColumn(f"_bp{i}", pos)
        test = F.expr(
            f"(coalesce(element_at(bloom, CAST(_bp{i} DIV 32 AS BIGINT)), "
            f"CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), "
            f"CAST(_bp{i} % 32 AS INT))) != 0"
        )
        keep = test if keep is None else keep & test
    return out, keep, [f"_bp{i}" for i in range(k)]


def bloom_prefilter(
    big: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Keep only rows of ``big`` whose ``key`` MIGHT be in the filter.

    ``bloom`` is the 1-row frame from ``bloom_build`` — broadcast via a 1-row
    crossJoin (the sanctioned broadcast-stats pattern), then each of the k
    bit tests is a pure JVM expression over the map, so the filter runs
    inside the scan's WholeStageCodegen and rows are dropped BEFORE any
    exchange.  Guarantee: never drops a true match (no false negatives);
    survivors still need the exact join/semijoin downstream.
    """
    out, keep, tmp = _attach_tests(big, key, bloom, m_bits, k, salt)
    return out.filter(keep).drop("bloom", *tmp)


def bloom_mark(
    big: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
    salt: str = "bloom",
    out_col: str = "is_candidate",
) -> DataFrame:
    """Like ``bloom_prefilter`` but ADDS a boolean membership column instead
    of filtering — for screening flows that need both populations in one
    pass (e.g. route bloom-positive rows to an exact check and bloom-negative
    rows straight to the definitely-new path)."""
    out, keep, tmp = _attach_tests(big, key, bloom, m_bits, k, salt)
    return out.withColumn(out_col, keep).drop("bloom", *tmp)


def count_min_build(
    df: DataFrame, item: str, depth: int = 4, width: int = 256, salt: str = "cms"
) -> DataFrame:
    """Count-min sketch cells: (r BIGINT, c BIGINT, cnt BIGINT), one row per
    non-empty cell, ``r`` in [0, depth), ``c`` in [0, width).

    One md5 digest per input row; the ``depth`` cell columns are KM-derived
    from it.  The build is a single scan + one aggregate at ``depth*width``
    cardinality (map-side partials do almost all the work — the shuffle
    moves at most depth*width rows per task).  Sketches over different data
    slices merge by summing ``cnt`` per (r, c).
    """
    h1, h2 = _km_hashes(F.col(item), salt)
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
) -> DataFrame:
    """Estimated frequency for each probe item: min over the sketch's rows of
    the probed cells — the classic CMS point query, as a broadcast join.

    ``cms`` has at most depth*width rows (KBs), so it broadcasts; probing is
    a probe-side explode to (item, r, c) + broadcast-hash left join + min.
    Output: (item, cms_est BIGINT) with cms_est >= the true count always.
    """
    h1, h2 = _km_hashes(F.col(item), salt)
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
