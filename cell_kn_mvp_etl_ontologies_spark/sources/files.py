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
