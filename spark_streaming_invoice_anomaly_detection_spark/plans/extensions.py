"""LLM-data-pipeline extension queries (dedup, similarity, text analysis).

Filled in Phase 4 (SURVEY.md §7). Registered here so each extension operator
gets a driver-checked queries()/oracle_sql() entry.
"""

from __future__ import annotations
