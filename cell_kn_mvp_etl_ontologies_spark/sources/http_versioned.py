"""Versioned HTTP source acquisition (SURVEY.md §2.1 source_http_versioned).

Ref: OntologyDownloader.java:86-133 — download each OBO PURL, extract the
YYYY-MM-DD version from the new and current file, and replace the current
file only if strictly newer, archiving the old copy to
``.archive/{stem}-{version}{suffix}``; otherwise delete the download.

This stays driver-side by design (9 small HTTP fetches, SURVEY.md §3 EP3);
the decision logic itself is also exposed as a DataFrame expression in the
catalog (``source_http_versioned``) for auditability.  Network access is
gated: callers inject ``fetch`` (bytes-returning callable) so tests and
offline environments exercise the full replace/archive state machine without
sockets.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Callable
from dataclasses import dataclass

from ..constants import OBO_PURLS

DATE_RE = re.compile(r"(\d{4}-\d{2}-\d{2})")
_VERSION_INFO_RE = re.compile(
    rb"<owl:versionInfo[^>]*>([^<]*)</owl:versionInfo>"
)
_VERSION_IRI_RE = re.compile(rb'<owl:versionIRI[^>]*rdf:resource="([^"]*)"')


def default_fetch(url: str) -> bytes:
    """Real HTTP fetch (only used when explicitly requested)."""
    from urllib.request import urlopen

    with urlopen(url, timeout=120) as resp:  # noqa: S310 — fixed OBO PURLs
        return resp.read()


def find_obo_version(path: str) -> str | None:
    """Version as YYYY-MM-DD: owl:versionInfo first, owl:versionIRI fallback.
    Ref: OntologyDownloader.java:48-74."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)  # version metadata lives in the preamble
    m = _VERSION_INFO_RE.search(head)
    if m:
        d = DATE_RE.search(m.group(1).decode("utf-8", "replace"))
        if d:
            return d.group(1)
    m = _VERSION_IRI_RE.search(head)
    if m:
        d = DATE_RE.search(m.group(1).decode("utf-8", "replace"))
        if d:
            return d.group(1)
    return None


@dataclass
class DownloadOutcome:
    url: str
    file_name: str
    version_new: str | None
    version_cur: str | None
    decision: str  # 'init' | 'replace' | 'keep'


def update_downloads(
    urls: list[str] | None = None,
    download_dir: str = "data/obo",
    fetch: Callable[[str], bytes] | None = None,
) -> list[DownloadOutcome]:
    """Download, version-compare, replace/archive — the reference's state
    machine (OntologyDownloader.java:86-133)."""
    if fetch is None:
        raise ValueError(
            "pass fetch=default_fetch explicitly to allow network access, or a stub for tests"
        )
    urls = urls or OBO_PURLS
    os.makedirs(download_dir, exist_ok=True)
    outcomes: list[DownloadOutcome] = []
    for url in urls:
        file_name = url.rsplit("/", 1)[-1]
        stem, suffix = os.path.splitext(file_name)
        new_file = os.path.join(download_dir, f"{stem}-new{suffix}")
        with open(new_file, "wb") as f:
            f.write(fetch(url))
        version_new = find_obo_version(new_file)
        cur_file = os.path.join(download_dir, file_name)
        if not os.path.exists(cur_file):
            os.replace(new_file, cur_file)
            outcomes.append(DownloadOutcome(url, file_name, version_new, None, "init"))
            continue
        version_cur = find_obo_version(cur_file)
        if version_new is not None and version_cur is not None and version_new > version_cur:
            archive_dir = os.path.join(download_dir, ".archive")
            os.makedirs(archive_dir, exist_ok=True)
            shutil.move(cur_file, os.path.join(archive_dir, f"{stem}-{version_cur}{suffix}"))
            os.replace(new_file, cur_file)
            outcomes.append(DownloadOutcome(url, file_name, version_new, version_cur, "replace"))
        else:
            os.remove(new_file)
            outcomes.append(DownloadOutcome(url, file_name, version_new, version_cur, "keep"))
    return outcomes
