"""Round-7 extension surface (batches 3-32) — HUB MODULE.

Split into four family part-modules in round 13 (VERDICT r12 #7: this
file had grown to 7,506 lines).  Importing this module imports all parts,
so every registration and the public `markov_maintain_run` helper remain
reachable exactly as before — zero behavior change; each section moved
verbatim.  Parts:

- frontier3_graph          graph / embedding / clustering / multimodal
- frontier3_dedup          ER blocking / dedup audits / contrastive pairs
- frontier3_text_quality   text analysis / data quality / eval / sampling
- frontier3_temporal_agg   temporal / warehouse aggs / joins / attribution

Families and shared doctrines (the original module docstring, kept as the
single inventory the parts point back to):

Families in the four parts (SURVEY §2.12/§2.13 carries the per-query rows):

- concentration & inequality: Gini (integer rank identity), HHI
  (mergeable sum-of-squares), Lorenz curve, Pareto 80/20 coverage
- data-quality audits: Benford first-digit (hardcoded integer ppm
  expectations), completeness census, sequence gaps, freshness,
  duplication & cluster-size scorecards, split leakage/balance,
  mojibake & char-diversity & code & readability screens
- warehouse analytics: broadcast star rollup (+ streaming maintainer),
  RFM, cohort LTV, aging buckets, WoW growth, top-k pivot, association
  rules, growth accounting, activity heatmap
- sequence/temporal: Markov transitions & trigrams (+ boundary-stitched
  streaming twins), CUSUM change-point, seasonality, inter-arrival &
  dwell, interval coalesce & overlap-duration, local peaks, lag-1
  autocorrelation, LTTB-style downsampling, new-entity curve
- ER blocking: sorted-neighborhood, phonetic key (dual-dialect rule
  chain), three-blocker union audit, MinHash estimator & LSH banding
  audits, normalized-exact dedup
- graph: Jaccard/RA link prediction, clustering coefficient, k-truss,
  two-hop reach, assortativity, deterministic uniform + node2vec-biased
  walks with skip-gram pair generation
- ML infra: point-in-time features, chronological split + rolling-origin
  folds, OOF target encoding, contrastive pair assembly, Poisson
  bootstrap, negative sampling, class weights, farthest-point seeding
  (+ inertia A/B), scaler params, embedding health audits
- evaluation-as-queries: confusion matrix, P/R/F1 scorecard, calibration
  bins, per-cell chi-square feature screening, label separation

Shared doctrines: no RNG anywhere (md5 rings / hash folds); no float
logs or divisions in gated outputs (hardcoded ppm constants, digit-length
buckets, (num, den) pairs — Spark DIV truncates, DuckDB // floors);
streaming maintainers share their batch twin's oracle constant; audits
measure their own knobs (banding, lookback, seeding) instead of assuming.
"""

from __future__ import annotations

from . import frontier3_dedup  # noqa: F401
from . import frontier3_graph  # noqa: F401
from . import frontier3_temporal_agg  # noqa: F401
from . import frontier3_text_quality  # noqa: F401
from .frontier3_temporal_agg import markov_maintain_run  # noqa: F401
