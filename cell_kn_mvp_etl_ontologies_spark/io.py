"""Table loading for the driver's synthetic parquet tables (TESTDATA.md).

The ``events`` table's ``ts`` column has changed storage type across driver
refreshes — parquet TIMESTAMP(NANOS) in earlier rounds, TIMESTAMP(MICROS)
now — so normalization is driven by the OBSERVED dtype, never assumed:

- ``bigint`` (nanos read as long under ``spark.sql.legacy.parquet.nanosAsLong``,
  which Spark 4 needs because it refuses native NANOS): rebuild TIMESTAMP_NTZ
  with integer division to microseconds.  Integer ``div`` matters: ``/`` is
  double division in Spark and a 1.7e18 nanosecond value loses precision past
  double's 15-16 significant digits, producing off-by-1µs values versus
  DuckDB's truncating parquet reader.
- ``timestamp`` / ``timestamp_ntz`` (native MICROS): cast to TIMESTAMP_NTZ
  as-is, no arithmetic.

NTZ (not LTZ) keeps collected values timezone-independent, matching DuckDB's
naive timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Event-time columns normalized to TIMESTAMP_NTZ on load, branching on the
# dtype the parquet reader actually produced (see module docstring).
EVENT_TIME_COLS: dict[str, list[str]] = {"events": ["ts"]}


def normalize_event_time(df: DataFrame, cols: list[str]) -> DataFrame:
    """Normalize event-time columns to TIMESTAMP_NTZ regardless of how the
    parquet file stored them.  ``bigint`` means nanos-as-long (legacy NANOS
    storage under ``nanosAsLong``) and needs the ns->µs rebuild; any
    timestamp flavor is cast straight to NTZ.  Unknown dtypes raise loudly so
    a future storage change fails in our suite, not the driver gate."""
    dtypes = dict(df.dtypes)
    for c in cols:
        dt = dtypes.get(c)
        if dt is None:
            continue
        if dt == "bigint":
            df = df.withColumn(
                c,
                F.expr(
                    f"TIMESTAMPADD(MICROSECOND, {c} div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif dt in ("timestamp", "timestamp_ntz"):
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
        else:
            raise TypeError(
                f"event-time column {c!r} has unexpected dtype {dt!r}; "
                "extend normalize_event_time for this storage type"
            )
    return df


def parallelize(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition to restore parallelism after an unsplittable
    scan.  The synthetic testdata ships one row group per file, so parquet
    scans are single-task regardless of maxPartitionBytes; CPU-heavy
    downstream stages (shingling, hashing, vector math) would otherwise run
    on one core.  Worth one small shuffle only when per-row compute dominates
    — cheap scan+agg queries should NOT use this.  On real multi-row-group
    data this is a no-op decision made by the caller."""
    sc = df.sparkSession.sparkContext
    return df.repartition(n or sc.defaultParallelism * 2)


def read_state_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """Read an IVM maintainer's parquet state, returning ``None`` iff the
    state genuinely does not exist yet (first batch).

    ADVICE r10 (catalog/frontier7.py:777 et al.): the IVM maintainers used a
    bare ``except Exception`` around the state read, so a TRANSIENT read
    failure (permissions flap, object-store hiccup, corrupt footer) was
    indistinguishable from "first batch" and silently reset accumulated
    state to empty — converging to a wrong, batch-inequal result instead of
    failing loudly.  This helper catches ONLY ``AnalysisException`` (Spark's
    path-not-found / cannot-infer-schema-from-empty-location signal, checked
    at plan time); executor-side IO errors surface at action time as
    ``Py4JJavaError``/``SparkException`` and now propagate.  Defense in
    depth: the path-not-found claim is VERIFIED before concluding "first
    batch" — ``os.path.exists`` for local paths, the Hadoop ``FileSystem``
    API for URI paths (ADVICE r11: object-store prefixes previously fell
    through to the silent-reset branch on ANY plan-time failure, the exact
    hazard this helper exists to eliminate).  An existing-but-unplannable
    path re-raises rather than resetting; only a genuinely absent path
    returns ``None``.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        import os

        if "://" not in path and os.path.exists(path):
            # Fast path: visible on the driver's local filesystem, so the
            # path exists but planning failed — NOT a first batch.
            raise
        # Authoritative check: the Hadoop FileSystem the READER resolves
        # the path against (scheme from the URI, else fs.defaultFS — ADVICE
        # r12: a scheme-less path on a non-local defaultFS exists remotely
        # even when os.path.exists says no, and must not reset state).  If
        # the existence check itself fails (auth flap, endpoint down) we
        # must NOT conclude first-batch — propagate loudly.
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(
            spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]
        )
        if fs.exists(hpath):
            # The path exists but planning failed: NOT a first batch.
            raise
        return None


def commit_state_parquet(df: DataFrame, path: str) -> None:
    """Replace the parquet state at ``path`` with ``df`` via the staging
    pattern: materialize to ``<path>_staging`` (safe while ``df`` still lazily
    reads the OLD files under ``path``), then commit with ONE filesystem
    rename of the staging directory onto ``path``.

    Round 14 (guide §1.2 per-task work / §6 I/O): the maintainers previously
    committed with a second full Spark job — ``read.parquet(staging).write
    .parquet(path)`` — so every state piece paid write+read+write per
    trigger.  The rename commit writes each byte once; the directory swap is
    a metadata operation on local/HDFS-class filesystems.  The crash window
    (between delete and rename) is strictly smaller than the old pattern's
    non-atomic overwrite-in-place of ``path``; on object stores without
    atomic rename, pair this with a manifest/table format — same caveat the
    old double-write had.  Resolved through the Hadoop ``FileSystem`` of the
    destination, so URI-qualified state roots behave like local ones."""
    path = path.rstrip("/")
    staging = path + "_staging"
    df.write.mode("overwrite").parquet(staging)
    replace_parquet_dir(df.sparkSession, staging, path)


def replace_parquet_dir(spark: SparkSession, staging: str, path: str) -> None:
    """Commit a fully-written ``staging`` directory onto ``path``: delete the
    old directory, rename staging into place.  One metadata operation instead
    of a second full read+write job; resolved through the destination's
    Hadoop ``FileSystem`` so local and URI-qualified paths behave alike."""
    jvm = spark._jvm
    src = jvm.org.apache.hadoop.fs.Path(staging)  # type: ignore[union-attr]
    dst = jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = dst.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
    if fs.exists(dst):
        fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise IOError(f"state commit rename failed: {staging} -> {path}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_event_time(df, EVENT_TIME_COLS.get(name, []))
