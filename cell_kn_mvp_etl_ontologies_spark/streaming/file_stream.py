"""Structured Streaming variants of the append-compatible operators
(SURVEY.md §2.11).

The reference is pure batch; these re-run the same declarative transforms
over a file stream.  Tests/queries use ``trigger(availableNow=True)`` + a
memory sink so a stream run is a bounded job; in production the same plans
run continuously against an object-store drop zone with checkpointing.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_state_parquet, replace_parquet_dir


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events table with the same dtype-branched
    timestamp normalization as the batch loader (io.normalize_event_time),
    except targeting LTZ: watermarks/event-time windows require TIMESTAMP
    type, not NTZ.  The container and driver sessions run UTC, so formatted
    output matches DuckDB's naive timestamps.

    ``max_files_per_trigger`` bounds files per micro-batch (None = source
    default) — production's backpressure knob, and the tests' lever for
    forcing REAL multi-batch runs over split files (the IVM
    bundling-independence pins)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file streams need a directory source; glob-filter the one table out of
    # the mixed-schema testdata dir
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "events*")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(sf_dir)
    dt = dict(stream.dtypes).get("ts")
    if dt == "bigint":  # legacy TIMESTAMP(NANOS) storage read as long
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt in ("timestamp", "timestamp_ntz"):
        return stream.withColumn("ts", F.col("ts").cast("timestamp"))
    raise TypeError(
        f"events.ts has unexpected stream dtype {dt!r}; "
        "extend read_events_stream for this storage type"
    )


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the documents table (no event-time column, so
    no normalization needed) — the ingestion side of continuous index
    maintenance.  ``max_files_per_trigger`` as in ``read_events_stream``."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "documents*")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(sf_dir)


def read_orders_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the orders table — the ingestion side of
    continuous distribution-drift monitoring.  o_orderdate is stored as a
    micros TIMESTAMP in the synthetic data; branch like read_events_stream
    so a storage change fails loudly here, not in the driver gate.
    ``max_files_per_trigger`` forces multi-batch execution (the bundling-
    independence tests drive the IVM maintainers with it)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "orders*")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(sf_dir)
    dt = dict(stream.dtypes).get("o_orderdate")
    if dt == "bigint":  # legacy TIMESTAMP(NANOS) storage read as long
        return stream.withColumn(
            "o_orderdate", F.timestamp_micros(F.expr("o_orderdate div 1000"))
        )
    if dt in ("timestamp", "timestamp_ntz"):
        return stream.withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    raise TypeError(
        f"orders.o_orderdate has unexpected stream dtype {dt!r}; "
        "extend read_orders_stream for this storage type"
    )


def read_lineitem_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the lineitem fact table — the ingestion side
    of continuous warehouse-rollup maintenance.  l_shipdate gets the same
    dtype branching as read_orders_stream so a storage change fails loudly
    here."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/lineitem.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "lineitem*")
        .parquet(sf_dir)
    )
    dt = dict(stream.dtypes).get("l_shipdate")
    if dt == "bigint":  # legacy TIMESTAMP(NANOS) storage read as long
        return stream.withColumn(
            "l_shipdate", F.timestamp_micros(F.expr("l_shipdate div 1000"))
        )
    if dt in ("timestamp", "timestamp_ntz"):
        return stream.withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    raise TypeError(
        f"lineitem.l_shipdate has unexpected stream dtype {dt!r}; "
        "extend read_lineitem_stream for this storage type"
    )


def read_part_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the part table (no event-time column) — the
    ingestion side of continuous frontier/skyline maintenance."""
    schema = spark.read.parquet(f"{sf_dir}/part.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "part*")
        .parquet(sf_dir)
    )


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the embeddings table — the ingestion side of
    continuous ANN-index maintenance."""
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings*")
        .parquet(sf_dir)
    )


def run_stream_upsert(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
    output_mode: str = "update",
    transform=None,
) -> DataFrame:
    """Run a (bounded) stream with a foreachBatch MERGE into a parquet path
    and return the resulting table.  Each micro-batch upserts via the same
    join_upsert the batch sink uses — the continuous version of
    sink_graph_upsert (exactly-once per batch comes from the checkpointed
    batch id in production; availableNow bounds it here).

    ``transform`` (optional, ``batch DataFrame -> DataFrame``) runs inside
    foreachBatch, where the micro-batch is a plain batch frame — the place
    for operators a streaming plan can't host directly (windows, top-k
    ranking, broadcast-scored assignment)."""
    from ..sinks.graph import upsert_parquet

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch_df = transform(batch_df)
        # dedup within the batch first: upsert keys must be unique per merge
        upsert_parquet(
            batch_df.sparkSession, batch_df.dropDuplicates(keys), path, keys, partition_by
        )

    query = (
        df.writeStream.foreachBatch(handle_batch)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", path.rstrip("/") + "__checkpoint")
        .start()
    )
    query.awaitTermination()
    return df.sparkSession.read.parquet(path)


def run_stream_apply_changes(
    changelog: DataFrame,
    path: str,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    chaos_after_batch=None,
) -> DataFrame:
    """Run a (bounded) CDC changelog stream into keyed parquet state via
    foreachBatch ``apply_changes`` and return the final state (with
    tombstones — pass through ``live_view`` for the queryable face).

    Because apply_changes is seq-resolved, the result is INDEPENDENT of how
    the file source bundles files into micro-batches or in what order they
    arrive — the property that makes CDC ingestion restartable and
    backfillable at scale.  It is also IDEMPOTENT under batch redelivery:
    re-applying an already-applied changelog slice resolves to the same
    (key, max seq) winners, so a crash in the at-least-once window (state
    committed, checkpoint offset not yet) converges on restart —
    ``chaos_after_batch(batch_id)``, called after the state write and
    before foreachBatch returns, is the fault-injection seam the chaos
    tests use to land a failure exactly there (production passes nothing).
    Same two-phase staging rewrite as run_stream_upsert (a parquet path
    can't be overwritten mid-read)."""
    from ..operators.incremental import apply_changes

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = read_state_parquet(spark, path)
        if state is None:  # first batch: empty state with the changelog schema
            state = batch_df.limit(0)
        merged = apply_changes(state, batch_df, keys, op_col, seq_col)
        staging = path.rstrip("/") + "__staging"
        merged.write.mode("overwrite").parquet(staging)
        replace_parquet_dir(spark, staging, path.rstrip("/"))
        if chaos_after_batch is not None:
            chaos_after_batch(batch_id)

    query = (
        changelog.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", path.rstrip("/") + "__checkpoint")
        .start()
    )
    query.awaitTermination()
    return changelog.sparkSession.read.parquet(path)


def run_stream_to_table(df: DataFrame, output_mode: str = "append") -> DataFrame:
    """Run a (bounded) stream to completion into a uniquely-named memory sink
    and return the sink table."""
    return run_stream_to_table_with_metrics(df, output_mode)[0]


def run_stream_to_table_with_metrics(
    df: DataFrame, output_mode: str = "append"
) -> tuple[DataFrame, list[dict]]:
    """Like ``run_stream_to_table`` but also returns the per-micro-batch
    progress dicts (``query.recentProgress``) — the state-store metrics
    (`stateOperators[].numRowsTotal/numRowsRemoved/numRowsDroppedByWatermark`)
    are the observable evidence that watermark eviction actually bounds
    state (VERDICT r6 #8)."""
    name = f"stream_sink_{uuid.uuid4().hex[:12]}"
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return df.sparkSession.table(name), list(query.recentProgress)
