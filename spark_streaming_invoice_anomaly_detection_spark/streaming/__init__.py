"""Structured Streaming rebuild of the reference DStream pipeline
(SURVEY.md §2.4, reference realtime/InvoicePipeline.scala)."""

from .monitor import BatchCountListener
from .parse import parse_purchase_lines, route_events
from .session_state import sessionize_invoices
from .validate import classify_erroneous, filter_valid_invoices
from .windows import sliding_count

__all__ = [
    "BatchCountListener",
    "parse_purchase_lines",
    "route_events",
    "sessionize_invoices",
    "classify_erroneous",
    "filter_valid_invoices",
    "sliding_count",
]
