"""Table loading for the driver's synthetic parquet tables (TESTDATA.md).

The ``events`` table stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4
refuses to read natively.  We read nanos as long
(``spark.sql.legacy.parquet.nanosAsLong`` — runtime-settable) and rebuild a
TIMESTAMP_NTZ with integer division to microseconds.  Integer ``div`` matters:
``/`` is double division in Spark and a 1.7e18 nanosecond value loses
precision past double's 15-16 significant digits, producing off-by-1µs values
versus DuckDB's truncating parquet reader.  NTZ (not LTZ) keeps collected
values timezone-independent, matching DuckDB's naive timestamps.
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

# Columns stored as TIMESTAMP(NANOS) that arrive as LongType under
# nanosAsLong and need the ns -> µs -> TIMESTAMP_NTZ rebuild.
NS_TIMESTAMP_COLS: dict[str, list[str]] = {"events": ["ts"]}


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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NS_TIMESTAMP_COLS.get(name, []):
        df = df.withColumn(
            c,
            F.expr(f"TIMESTAMPADD(MICROSECOND, {c} div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return df
