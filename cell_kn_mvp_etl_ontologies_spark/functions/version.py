"""Version-date extraction and comparison (SURVEY.md §2.8).

Ref: OntologyDownloader.java:38 (date regex), 48-74 (versionInfo preferred,
versionIRI fallback), 113 (lexicographic ISO-date compare).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DATE_PATTERN = r"(\d{4}-\d{2}-\d{2})"


def fn_extract_version_date(text: Column) -> Column:
    """First ``YYYY-MM-DD`` occurrence, NULL when absent."""
    return F.nullif(F.regexp_extract(text, DATE_PATTERN, 1), F.lit(""))


def fn_version_from_info_or_iri(version_info: Column, version_iri: Column) -> Column:
    """Prefer a date parsed from ``owl:versionInfo`` text, fall back to one
    embedded in the ``owl:versionIRI``.  Ref: OntologyDownloader.java:48-74."""
    return F.coalesce(fn_extract_version_date(version_info), fn_extract_version_date(version_iri))


def fn_version_newer(new: Column, cur: Column) -> Column:
    """True iff ``new`` is strictly newer — lexicographic compare is exact for
    ISO dates.  NULL-safe: an absent version is never newer."""
    return F.coalesce(new > cur, F.lit(False))
