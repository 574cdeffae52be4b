"""Z-order clustered writes (multi-dimensional data skipping, 100 TB posture).

A 100 TB table queried by box predicates on TWO columns (time × tenant,
lat × lon, partkey × size) can't be range-sharded on either column alone —
one dimension prunes, the other scans everything.  Interleaving the bits of
both columns (Morton / Z-order curve) gives a single sort key whose
contiguous ranges are small axis-aligned cells: files clustered on a
z-prefix carry TIGHT parquet min/max footer stats on BOTH source columns,
so a box query skips every non-intersecting file.

Cells here are fixed z-prefix buckets (``z >> prefix_shift``), not sampled
range boundaries: the cell of a row is a pure function of the row, so
writes are deterministic, append-friendly (new data lands in the same cell
space), and need no global sort — one hash exchange on the cell id, then
each task writes its cells.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton code of two non-negative ints, ``bits`` bits each: bit i of x
    lands at position 2i, bit i of y at 2i+1.  Unrolled pure-Column
    arithmetic — whole-stage-codegen'd, no UDF."""
    x, y = x.cast("long"), y.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        terms.append(F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
    return reduce(add, terms)


def z_value_sql(x: str, y: str, bits: int = 10) -> str:
    """The identical Morton code as a portable SQL expression (DuckDB/ANSI),
    for differential oracles."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 10,
    prefix_shift: int = 14,
) -> DataFrame:
    """Write ``df`` clustered into z-prefix cells on (x_col, y_col); one file
    per cell via a cell-keyed repartition.  Returns the read-back frame with
    its ``cell`` column.  2*bits - prefix_shift bits of cell id =>
    2^(2*bits - prefix_shift) cells; size ``prefix_shift`` so a cell's rows
    fit a healthy parquet file (~128 MB-1 GB) at your scale."""
    z = z_value(F.col(x_col), F.col(y_col), bits)
    cells = df.withColumn("cell", F.shiftright(z, prefix_shift))
    (
        cells.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)


def zorder_cell_stats(
    back: DataFrame,
    x_col: str,
    y_col: str,
    box: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Per-cell clustering stats: (cell, n, min/max of both dims) — the
    bounding boxes a scanner's file-skipping would consult — plus, when
    ``box`` = (x_lo, x_hi, y_lo, y_hi) is given, ``cell_hit``: whether the
    cell holds any row inside the half-open query box.  The fraction of
    cells with ``cell_hit`` is the scan fraction a box query pays."""
    x, y = F.col(x_col), F.col(y_col)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(x).cast("long").alias("min_x"),
        F.max(x).cast("long").alias("max_x"),
        F.min(y).cast("long").alias("min_y"),
        F.max(y).cast("long").alias("max_y"),
    ]
    if box is not None:
        x_lo, x_hi, y_lo, y_hi = box
        inside = (x >= x_lo) & (x < x_hi) & (y >= y_lo) & (y < y_hi)
        aggs.append(F.bool_or(inside).alias("cell_hit"))
    return back.groupBy(F.col("cell").cast("long").alias("cell")).agg(*aggs)
