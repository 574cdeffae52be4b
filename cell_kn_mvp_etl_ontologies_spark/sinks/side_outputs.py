"""Side outputs (SURVEY.md §2.1): deprecated-terms and edge-labels files.

Ref: OntologyGraphBuilder.java:41-42,246-261,276,556-562.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import fn_normalize_edge_label


def write_deprecated_terms(deprecated: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One ``{id}_{number}`` line per deprecated/obsolete vertex."""
    deprecated.select(F.col("term").cast("string")).write.mode(mode).text(path)


def write_edge_labels(edge_labels: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distinct raw labels with their normalized forms, as headered CSV."""
    out = edge_labels.select(
        "raw_label", fn_normalize_edge_label(F.col("raw_label")).alias("normalized_label")
    )
    out.write.mode(mode).option("header", "true").csv(path)
