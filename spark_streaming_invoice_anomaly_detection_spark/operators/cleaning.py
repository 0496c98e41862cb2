"""Corpus-cleaning operators for LLM training-data pipelines.

The four stages every web-scale text pipeline runs between "crawled" and
"trainable" (cf. the C4 / Gopher / RefinedWeb cleaning recipes in the
public literature):

- ``strip_html``: remove markup, collapse whitespace — pure
  ``regexp_replace`` chains, whole-stage-codegen'd, zero Python.
- ``redact_pii``: mask emails/phones with sentinel tokens. Pattern-based
  (the public-baseline approach); lookahead-free regexes so the DuckDB
  oracle (RE2) counts identically.
- ``repetition_ratio``: Gopher-style duplicate-line / duplicate-word
  fractions — high repetition predicts boilerplate and template spam.
- ``hash_split`` / ``stratified_sample``: deterministic md5-derived
  train/val/test assignment and per-stratum downsampling. Hash-based (not
  ``rand()``) so membership is stable across runs, re-partitions, and
  engines — the property that makes a 100 TB split reproducible and
  incrementally extendable (new docs never reshuffle old ones).

All row-path logic is native Spark SQL expressions: at 100 TB these run
inside the scan stage with no shuffle at all (the only shuffle in the
registered queries is the final small groupBy on split/stratum labels).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import h60

#: Markup: tags (incl. attributes), entities. Deliberately simple — the
#: public-baseline "good enough" recipe, not a full HTML5 parser.
HTML_TAG_PATTERN = r"<[^>]*>"
HTML_ENTITY_PATTERN = r"&[A-Za-z]+;|&#[0-9]+;"

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
#: 7+ digit runs with optional separators, anchored on digits at both ends.
PHONE_PATTERN = r"\+?[0-9][0-9()\- ]{5,}[0-9]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_html(col: Column | str) -> Column:
    """Markup-free text: drop tags, then entities, then collapse runs of
    whitespace to single spaces and trim."""
    c = _c(col)
    no_tags = F.regexp_replace(c, HTML_TAG_PATTERN, " ")
    no_ent = F.regexp_replace(no_tags, HTML_ENTITY_PATTERN, " ")
    return F.trim(F.regexp_replace(no_ent, r"\s+", " "))


def strip_html_sql(expr: str) -> str:
    """DuckDB twin of :func:`strip_html` (same three-pass replace)."""
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '{HTML_TAG_PATTERN}', ' ', 'g'), "
        f"'{HTML_ENTITY_PATTERN}', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


def redact_pii(col: Column | str) -> Column:
    """Mask emails then phone-number-shaped digit runs with sentinels."""
    c = _c(col)
    no_mail = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_mail, PHONE_PATTERN, "<PHONE>")


def redact_pii_sql(expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace({expr}, "
        f"'{EMAIL_PATTERN}', '<EMAIL>', 'g'), "
        f"'{PHONE_PATTERN}', '<PHONE>', 'g')"
    )


def pii_hit_count(col: Column | str) -> Column:
    """How many PII spans :func:`redact_pii` would mask (emails counted
    first; phone matches counted on the email-redacted text, mirroring the
    replace order)."""
    c = _c(col)
    n_mail = F.regexp_count(c, F.lit(EMAIL_PATTERN))
    after_mail = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    n_phone = F.regexp_count(after_mail, F.lit(PHONE_PATTERN))
    return (n_mail + n_phone).cast("int")


def repetition_ratios(col: Column | str) -> tuple[Column, Column]:
    """(dup_line_ratio, dup_word_ratio) — the Gopher repetition signals.

    dup_line_ratio = 1 - distinct_lines/lines over newline-split segments;
    dup_word_ratio = 1 - distinct_words/words over whitespace tokens.
    Both are 0.0 for empty docs (guarded denominators) and exact integer
    ratios, so the oracle is bit-identical.
    """
    c = _c(col)
    lines = F.filter(F.split(c, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    n_uniq_lines = F.size(F.array_distinct(lines))
    dup_lines = F.when(n_lines <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - n_uniq_lines.cast("double") / n_lines.cast("double")
    )
    words = F.filter(F.split(c, r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    n_uniq_words = F.size(F.array_distinct(words))
    dup_words = F.when(n_words <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - n_uniq_words.cast("double") / n_words.cast("double")
    )
    return dup_lines, dup_words


def hash_split(
    id_col: Column | str,
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> Column:
    """Deterministic train/val/test label from h60(salt:id) % 100.

    ``weights`` maps label -> percentage (must sum to 100); default
    98/1/1. Hash-based assignment is stable under re-runs and engine
    changes — append-only corpora keep their historical splits.
    """
    weights = weights or {"train": 98, "val": 1, "test": 1}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    bucket = F.pmod(
        h60(F.concat(F.lit(f"{salt}:"), _c(id_col).cast("string"))), F.lit(100)
    )
    expr = None
    lo = 0
    for label, pct in weights.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += pct
    return expr


def hash_split_sql(
    id_expr: str, weights: dict[str, int] | None = None, salt: str = "split"
) -> str:
    from .text import h60_sql

    weights = weights or {"train": 98, "val": 1, "test": 1}
    salted = f"'{salt}:' || CAST({id_expr} AS VARCHAR)"
    bucket = f"(({h60_sql(salted)} % 100) + 100) % 100"
    cases, lo = [], 0
    for label, pct in weights.items():
        cases.append(f"WHEN {bucket} >= {lo} AND {bucket} < {lo + pct} THEN '{label}'")
        lo += pct
    return "CASE " + " ".join(cases) + " END"


def stratified_sample_flag(
    id_col: Column | str,
    pct: int,
    salt: str = "sample",
) -> Column:
    """True for a deterministic ~pct% subset: h60(salt:id) % 100 < pct.

    Per-stratum quotas compose by keying the salt per stratum upstream or
    simply filtering within strata — membership of one row never depends
    on any other row, so the sample needs no shuffle and no state.
    """
    bucket = F.pmod(
        h60(F.concat(F.lit(f"{salt}:"), _c(id_col).cast("string"))), F.lit(100)
    )
    return bucket < pct


__all__ = [
    "strip_html",
    "strip_html_sql",
    "redact_pii",
    "redact_pii_sql",
    "pii_hit_count",
    "repetition_ratios",
    "hash_split",
    "hash_split_sql",
    "stratified_sample_flag",
]
