"""Directory scan with regex filename matching (SURVEY.md §2.1 scan_dir_regex).

Ref: PathUtilities.java:24-30 (regular files whose names match a regex).
Glob-expressible patterns push into the file index (pathGlobFilter); true
regexes filter on input file name after listing.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_files_matching_pattern(directory: str, pattern: str) -> list[str]:
    """Driver-side listing (the reference's exact semantics, incl. raising on
    a bad directory)."""
    rx = re.compile(pattern)
    return sorted(
        os.path.join(directory, name)
        for name in os.listdir(directory)
        if rx.fullmatch(name) and os.path.isfile(os.path.join(directory, name))
    )


def scan_dir_regex(
    spark: SparkSession,
    directory: str,
    name_regex: str,
    fmt: str = "binaryFile",
    glob: str | None = None,
) -> DataFrame:
    """Distributed scan of files whose NAME matches ``name_regex``.

    ``glob`` (when the pattern is glob-expressible, e.g. ``*.owl``) prunes at
    listing time; the regex then filters exactly on the file name — both
    evaluated before any file content is read."""
    reader = spark.read.format(fmt)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(directory)
    name = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return df.filter(name.rlike(f"^{name_regex}$"))


def read_jsonl_with_corrupt_routing(
    spark: SparkSession,
    path: str,
    schema: str,
    out_dir: str | None = None,
    corrupt_col: str = "_corrupt_record",
    route_col: str = "ingest_route",
) -> tuple[DataFrame, DataFrame]:
    """Production JSONL ingest: parse against an EXPLICIT schema in
    PERMISSIVE mode and route each line to a valid or corrupt side output
    in ONE pass — the ingest posture a 100 TB crawl pipeline needs, where
    a malformed line must be counted and quarantined, never crash the job
    (FAILFAST) or vanish silently (DROPMALFORMED).

    The explicit schema matters twice at scale: it skips Spark's
    schema-inference pre-pass (a full extra read of the corpus), and it
    makes drift VISIBLE — a document whose field changed type lands in
    the corrupt side output with its raw line intact for replay, the same
    side-output doctrine as `sink_side_output_deprecated`.

    Shape (VERDICT r6 #5): the corpus is scanned exactly once — a single
    ``partitionBy(route_col)`` parquet write emits both side outputs in
    one job, replacing the earlier corpus-sized ``.cache()`` (Spark
    refuses corrupt-column-only queries over a raw JSON scan,
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN, so SOME
    materialization is forced; a write the pipeline needs anyway beats a
    memory-resident copy of the whole parse at 100 TB).  Returns
    (valid, corrupt) as LAZY columnar readers over ``out_dir`` — valid
    carries the schema columns, corrupt carries the raw ``corrupt_col``
    line only (partition pruning makes each side read only its own
    files).  Caller owns ``out_dir`` cleanup/retention.
    """
    import tempfile

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="jsonl_routed_")
    full_schema = f"{schema}, {corrupt_col} STRING"
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    routed = parsed.withColumn(
        route_col,
        F.when(F.col(corrupt_col).isNull(), F.lit("valid")).otherwise(F.lit("corrupt")),
    )
    routed.write.mode("overwrite").partitionBy(route_col).parquet(out_dir)
    # Explicit schema on the read-back: an all-valid (or all-corrupt, or
    # empty) corpus leaves one partition directory absent, and schema
    # inference over the remaining files cannot see it — the reader must
    # not fail on the empty side.
    on_disk = spark.read.schema(f"{full_schema}, {route_col} STRING").parquet(out_dir)
    valid = on_disk.filter(F.col(route_col) == "valid").drop(route_col, corrupt_col)
    corrupt = on_disk.filter(F.col(route_col) == "corrupt").select(corrupt_col)
    return valid, corrupt
