"""Vectorized UDF / UDAF / UDTF extension points (SURVEY.md §2.12 udf_surface).

The engine's position: built-in expressions first (everything in functions/
is UDF-free); when Python is unavoidable, Arrow-batched pandas UDFs — never
row-at-a-time.  These exemplars mirror expression-library semantics so they
can be differentially checked against both DuckDB AND the pure-Column path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import LongType, StringType


@pandas_udf(StringType())
def uri_basename_udf(uris: pd.Series) -> pd.Series:
    """Vectorized URI basename — same semantics as functions.fn_uri_basename
    (and sources.owl._uri_basename), as a scalar pandas UDF."""
    from ..sources.owl import _uri_basename

    return uris.map(lambda u: _uri_basename(u) if u is not None else None)


@pandas_udf(LongType())
def cents_sum_udf(values: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: exact integer-cents sum of a 2-decimal
    double column (round-then-int per element is cross-engine exact)."""
    return int(values.mul(100).round().sum())


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """Python UDTF (Spark >= 3.5): one output row per whitespace token with
    its 1-based position."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i + 1, tok
