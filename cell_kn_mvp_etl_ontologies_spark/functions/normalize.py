"""Edge label / source normalization case maps (SURVEY.md §2.8).

Pure CASE expressions — chained ``when`` over the special-case dictionaries,
with the reference's default branch.  Ref: OntologyGraphBuilder.java:287-326.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import EDGE_LABEL_MAP, EDGE_SOURCE_MAP


def _case_map(col: Column, mapping: dict[str, str], default: Column) -> Column:
    out = None
    for raw, normalized in mapping.items():
        cond = col == raw
        out = F.when(cond, normalized) if out is None else out.when(cond, normalized)
    return out.otherwise(default)


def fn_normalize_edge_label(label: Column) -> Column:
    """6-way case map (``subClassOf`` -> ``SUB_CLASS_OF`` ...) else
    ``upper(replace(label, ' ', '_'))``.  Ref: OntologyGraphBuilder.java:309-326."""
    return _case_map(label, EDGE_LABEL_MAP, F.upper(F.replace(label, F.lit(" "), F.lit("_"))))


def fn_normalize_edge_source(source: Column) -> Column:
    """4-way case map (``mondo-simple`` -> ``MONDO`` ...) else ``upper(source)``.
    Ref: OntologyGraphBuilder.java:287-300."""
    return _case_map(source, EDGE_SOURCE_MAP, F.upper(source))
