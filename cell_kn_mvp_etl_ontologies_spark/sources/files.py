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
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Production JSONL ingest: parse against an EXPLICIT schema in
    PERMISSIVE mode and split the result into (valid, corrupt) frames —
    the ingest posture a 100 TB crawl pipeline needs, where a malformed
    line must be counted and quarantined, never crash the job (FAILFAST)
    or vanish silently (DROPMALFORMED).

    The explicit schema matters twice at scale: it skips Spark's
    schema-inference pre-pass (a full extra read of the corpus), and it
    makes drift VISIBLE — a document whose field changed type lands in
    the corrupt side output with its raw line intact for replay, the same
    side-output doctrine as `sink_side_output_deprecated`.

    Returns (valid, corrupt, parsed): valid carries the schema columns
    (corrupt column dropped); corrupt carries the raw ``corrupt_col`` line
    only; ``parsed`` is the shared CACHED parse both project from — Spark
    refuses corrupt-column-only queries over a raw scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the parse
    is persisted here and the caller unpersists ``parsed`` when done.
    """
    full_schema = f"{schema}, {corrupt_col} STRING"
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()
    )
    valid = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    corrupt = parsed.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return valid, corrupt, parsed
