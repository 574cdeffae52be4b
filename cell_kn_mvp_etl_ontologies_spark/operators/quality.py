"""Data-quality expectation checks (Deequ-style) as declarative plans.

A training-data pipeline gates every ingest on constraint checks: null
rates, key uniqueness, referential integrity, value ranges, format
conformance.  The scale discipline is pass-count: ALL row-level checks
(not_null / in_range / matches_regex) fold into ONE aggregate over ONE scan
— adding a constraint adds a conditional-sum column, not a job.  Only
uniqueness (a keyed aggregate) and foreign-key containment (an anti-join)
need their own shuffles, and both ship only key columns.

Output schema: (constraint STRING, violations BIGINT, passed BOOLEAN) — one
row per constraint, deterministic order by constraint name.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class NotNull:
    col: str

    @property
    def name(self) -> str:
        return f"not_null({self.col})"

    def violation(self) -> Column:
        return F.col(self.col).isNull()


@dataclass(frozen=True)
class InRange:
    col: str
    lo: float
    hi: float

    @property
    def name(self) -> str:
        return f"in_range({self.col},{self.lo},{self.hi})"

    def violation(self) -> Column:
        # NULLs are not range violations — pair with NotNull to forbid them
        return F.col(self.col).isNotNull() & (
            (F.col(self.col) < self.lo) | (F.col(self.col) > self.hi)
        )


@dataclass(frozen=True)
class MatchesRegex:
    col: str
    pattern: str

    @property
    def name(self) -> str:
        return f"matches_regex({self.col})"

    def violation(self) -> Column:
        return F.col(self.col).isNotNull() & ~F.col(self.col).rlike(self.pattern)


@dataclass(frozen=True)
class Unique:
    cols: tuple[str, ...]

    @property
    def name(self) -> str:
        return f"unique({','.join(self.cols)})"


@dataclass(frozen=True)
class ForeignKey:
    col: str
    parent_name: str  # display only

    @property
    def name(self) -> str:
        return f"fk({self.col}->{self.parent_name})"


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column numeric profile in ONE aggregate pass: (column, n_rows,
    n_null, n_distinct, min_v, max_v, sum_v, mean_v).

    Sums accumulate in DECIMAL(28,6) — exact and order-independent AFTER
    each value is quantized to 6 fractional digits, which is the documented
    contract of this profile (for general doubles the decimal sum/mean can
    differ from the true float sum by the rounding; the oracle mirrors the
    same cast).  Mean is the IEEE double division of two such inputs, so it
    is identical cross-engine (unlike a double sum, whose value depends on
    reduction order).  The exact ``count(distinct)`` columns make Spark plan an Expand
    (one input duplicate per distinct aggregate) — acceptable for profiling
    runs; swap in the bitmap-words sketch (operators/aggregates.py) when
    profiling at full fact-table scale.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__dist"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.col(c).cast("decimal(28,6)")).alias(f"{c}__sum"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").cast("long").alias("n_rows"),
                F.coalesce(F.col(f"{c}__null"), F.lit(0)).cast("long").alias("n_null"),
                F.col(f"{c}__dist").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").cast("double").alias("min_v"),
                F.col(f"{c}__max").cast("double").alias("max_v"),
                F.col(f"{c}__sum").cast("double").alias("sum_v"),
                (
                    F.col(f"{c}__sum").cast("double")
                    / (F.col(f"{c}__n") - F.coalesce(F.col(f"{c}__null"), F.lit(0)))
                ).alias("mean_v"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(entries).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def check_expectations(
    df: DataFrame,
    row_checks: list,
    unique_checks: list | None = None,
    fk_checks: list[tuple["ForeignKey", DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate constraints against ``df``; see module docstring for the
    plan shape.  ``fk_checks`` entries are (ForeignKey, parent_df,
    parent_col): a child value violates if non-null and absent from parent.
    """
    parts: list[DataFrame] = []

    if row_checks:
        aggs = [
            F.sum(c.violation().cast("long")).alias(c.name) for c in row_checks
        ]
        wide = df.agg(*aggs)
        # unpivot the single wide row into (constraint, violations)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("constraint"),
                    F.coalesce(F.col(f"`{c.name}`"), F.lit(0)).alias("violations"),
                )
                for c in row_checks
            ]
        )
        parts.append(
            wide.select(F.explode(pairs).alias("kv")).select(
                "kv.constraint", "kv.violations"
            )
        )

    for u in unique_checks or []:
        # violations = rows carrying a key seen more than once (all of them)
        dup = (
            df.groupBy(*u.cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("violations"))
        )
        parts.append(dup.select(F.lit(u.name).alias("constraint"), "violations"))

    for fk, parent, parent_col in fk_checks or []:
        orphans = (
            df.select(F.col(fk.col).alias("k"))
            .filter(F.col("k").isNotNull())
            .join(
                parent.select(F.col(parent_col).alias("k")).distinct(),
                on="k",
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        parts.append(
            orphans.select(F.lit(fk.name).alias("constraint"), "violations")
        )

    if not parts:
        raise ValueError("no constraints given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "constraint",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("constraint")


def mad_outlier_filter(
    df: DataFrame, group_col: str, value_col: str, n_mads: float = 3.0
) -> DataFrame:
    """Robust per-group outlier cut: keep rows whose value lies within
    ``n_mads`` median-absolute-deviations of their group's median — the
    length/score outlier screen a curation pipeline runs per language or per
    source, where mean±k*stddev would let the outliers themselves drag the
    cutoff (median and MAD have a 50% breakdown point; moments have 0%).

    Exact MAD is inherently two order statistics deep (median first, then
    the median of deviations FROM it), so the shape is: per-group median
    (one aggregate at group cardinality, broadcast back), deviation pass
    (second aggregate, broadcast back), filter pass — three scans of the
    raw input with only group-cardinality frames ever shuffled or
    broadcast.  At 100 TB, cache/checkpoint the input projection once and
    the two stats passes read the cached columnar slice; or swap both
    ``percentile`` calls for ``approx_percentile`` to collapse the sketch
    state (the cut tolerance then dominates the approximation error).

    Determinism: with integer values, medians interpolate to halves and the
    MAD to quarters — dyadic rationals, exact in binary doubles, so the
    boundary comparison cannot waver cross-engine.

    Output: input columns + (grp_median, grp_mad, is_outlier) for ALL rows —
    callers filter on ``is_outlier`` (the query form reports both counts).
    """
    med = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("grp_median")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("grp_median")), F.lit(0.5)
            ).alias("grp_mad")
        )
    )
    out = with_med.join(F.broadcast(mad), group_col)
    return out.withColumn(
        "is_outlier",
        F.abs(F.col(value_col) - F.col("grp_median"))
        > F.lit(float(n_mads)) * F.col("grp_mad"),
    )


# Lexical-form validators per XSD datatype IRI (round 6): the subset OBO
# ontologies actually ship (boolean on owl:deprecated, integer/decimal on
# annotation values, date on version metadata), each as an anchored regex
# so validation is one codegen'd rlike per row — no UDF, no cast-and-trap.
_XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_LEXICAL_PATTERNS: dict[str, str] = {
    _XSD + "boolean": r"^(true|false|1|0)$",
    _XSD + "integer": r"^[+-]?[0-9]+$",
    _XSD + "nonNegativeInteger": r"^\+?[0-9]+$",
    _XSD + "decimal": r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$",
    _XSD + "double": r"^([+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?|[+-]?INF|NaN)$",
    _XSD + "date": r"^-?[0-9]{4}-[0-9]{2}-[0-9]{2}(Z|[+-][0-9]{2}:[0-9]{2})?$",
    _XSD + "dateTime": r"^-?[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$",
}


def validate_typed_literals(
    triples: DataFrame,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Typed-literal lexical validation over the round-6 ``object_datatype``
    column — the RDF-side sibling of ``check_expectations``: every literal
    triple carrying a KNOWN datatype IRI is checked against that type's
    anchored lexical pattern (Jena would raise ``DatatypeFormatException``
    on access; a 100 TB ingest wants the violation COUNTED and routed, not
    thrown).  Literals with no datatype or an unknown datatype are passed
    through as their own buckets, so the output is a complete audit.

    One scan, one hash aggregate: (object_datatype, status, n) with
    status ∈ {'valid', 'invalid', 'untyped', 'unknown_datatype'}.
    """
    pats = XSD_LEXICAL_PATTERNS if patterns is None else patterns
    if not pats:
        raise ValueError("validate_typed_literals: patterns must be non-empty")
    lit = triples.filter(F.col("object_kind") == "literal")
    known = None
    for dt, pat in sorted(pats.items()):
        cond = F.when(
            F.col("object_datatype") == dt,
            F.when(F.col("object_lexical").rlike(pat), F.lit("valid")).otherwise(
                F.lit("invalid")
            ),
        )
        known = cond if known is None else known.when(
            F.col("object_datatype") == dt,
            F.when(F.col("object_lexical").rlike(pat), F.lit("valid")).otherwise(
                F.lit("invalid")
            ),
        )
    status = (
        F.when(F.col("object_datatype").isNull(), F.lit("untyped"))
        .otherwise(F.coalesce(known, F.lit("unknown_datatype")))
    )
    return lit.groupBy(
        "object_datatype", status.alias("status")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
