"""VERDICT r11 #5: bench.py's ACCEPTANCE_BANDS and BASELINE.md's bands are
maintained in two places — pin them to each other so a re-base can never
half-land (one drifted band would silently change what the self-settlement
pass re-measures).  BASELINE.md's "Canonical acceptance bands" table is the
single parse target; the historical tables above it remain the evidence
record and are NOT parsed."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _baseline_bands() -> dict[str, float]:
    text = open(os.path.join(REPO, "BASELINE.md")).read()
    m = re.search(
        r"### Canonical acceptance bands.*?\n\n((?:\|.*\n)+)", text, re.S
    )
    assert m, "BASELINE.md canonical bands table not found"
    bands: dict[str, float] = {}
    for row in m.group(1).strip().splitlines():
        cells = [c.strip() for c in row.strip("|").split("|")]
        if len(cells) != 2 or cells[0] in ("query", "---"):
            continue
        bands[cells[0]] = float(cells[1])
    assert bands, "canonical bands table parsed empty"
    return bands


def test_bench_bands_equal_baseline_md():
    import importlib.util
    import sys

    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "bench_for_bands", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    md = _baseline_bands()
    assert bench.ACCEPTANCE_BANDS == md, (
        "bench.py ACCEPTANCE_BANDS and BASELINE.md canonical table disagree: "
        f"only-in-bench={sorted(set(bench.ACCEPTANCE_BANDS) - set(md))}, "
        f"only-in-md={sorted(set(md) - set(bench.ACCEPTANCE_BANDS))}, "
        f"value-diffs={ {k: (bench.ACCEPTANCE_BANDS[k], md[k]) for k in set(md) & set(bench.ACCEPTANCE_BANDS) if bench.ACCEPTANCE_BANDS[k] != md[k]} }"
    )
