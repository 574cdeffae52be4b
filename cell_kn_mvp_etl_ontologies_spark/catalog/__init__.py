"""Query catalog: one entry per operator ID from SURVEY.md §2.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered under its
operator ID, optionally with an equivalent DuckDB oracle SQL string.  The
driver runs both at sf0.01 and compares row count + schema + order-insensitive
value hash (the t2 correctness gate).

Cross-engine output rules (learned differentially, see tools/check_correctness.py):
  - integer outputs: cast to BIGINT in both engines (parquet int32 vs Spark int)
  - aggregate numerics: sum in DECIMAL(18,6) for determinism, cast the result
    to DOUBLE in both (Spark Decimal vs DuckDB float stringify differently)
  - no raw timestamp columns in outputs — format to strings with
    date_format/strftime (collected dtypes differ)
  - floating point math (e.g. dot products): force DOUBLE element types in
    both engines; DuckDB's list_dot_product on FLOAT[] computes in single
    precision and diverges
  - every computed column aliased identically in Spark and SQL
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query under a SURVEY.md §2 operator ID, with an optional
    DuckDB oracle.  Queries without an oracle get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def finish_and_clean(df: DataFrame, *scratch_dirs: str) -> DataFrame:
    """Materialize a small verification frame driver-side, then delete the
    scratch directories it reads from.

    Catalog queries that write to a ``mkdtemp`` scratch area return frames
    that are LAZY over those files — deleting first would break the read, and
    not deleting leaks state into /tmp on every gate/bench invocation.  The
    frames routed through here are verification summaries (tens to a few
    thousand rows by construction), so a collect is driver-scale.
    """
    import shutil

    rows = df.collect()
    out = df.sparkSession.createDataFrame(rows, df.schema)
    for p in scratch_dirs:
        shutil.rmtree(p, ignore_errors=True)
    return out


def load_all() -> None:
    """Import all catalog modules so their registrations run."""
    from . import core  # noqa: F401
    from . import ontology  # noqa: F401
    from . import extensions  # noqa: F401
    from . import streaming  # noqa: F401
    from . import fine_grained  # noqa: F401
    from . import training  # noqa: F401
    from . import scale_ops  # noqa: F401
    from . import analytics  # noqa: F401
    from . import frontier  # noqa: F401
    from . import frontier2  # noqa: F401
    from . import frontier3  # noqa: F401
    from . import frontier4  # noqa: F401
    from . import frontier5  # noqa: F401
    from . import frontier6  # noqa: F401
    from . import frontier7  # noqa: F401
    from . import frontier8  # noqa: F401
    from . import frontier9  # noqa: F401
    from . import frontier10  # noqa: F401
    from . import frontier11  # noqa: F401
