"""ML-path queries (clustering sweep / scoring) — rows-only oracle checks.

Filled in Phase 2 (SURVEY.md §7). KMeans itself isn't SQL-expressible, so
these register with oracle=None except for the pieces that are (distance
scoring against fixed centroids IS expressible — see ml_queries below).
"""

from __future__ import annotations
