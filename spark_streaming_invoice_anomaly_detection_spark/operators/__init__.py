"""Batch operators: reference inventory (SURVEY.md §2.2-2.3) + extensions."""
