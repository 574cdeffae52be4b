"""JSONL export (SURVEY.md §2.1 sink_jsonl_export).

Replaces the reference's ``arangoexport`` shell-out
(src/main/shell/export-arangodb.sh:1-13) with a native distributed write —
JSONL is the reference's interchange format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_jsonl(df: DataFrame, path: str, mode: str = "overwrite", coalesce: int | None = None) -> None:
    """Write a collection as JSON Lines.  ``coalesce=1`` reproduces the
    single-file shape of arangoexport; leave None for parallel part files at
    scale."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode(mode).json(path)
