"""Text-analysis operators for LLM data pipelines (SURVEY.md §7 Phase 4).

All native column expressions — tokenization, language ID, quality scoring,
token counting, and fingerprinting run inside whole-stage codegen with zero
Python in the row path. Every function here has a DuckDB-expressible twin
(plans/extensions.py), using only cross-engine-deterministic primitives:
ASCII regexes, integer counts, and md5-derived 60-bit hashes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ASCII-only token pattern: identical semantics in Java regex (Spark) and
#: RE2 (DuckDB) — unicode classes like \w differ between engines.
TOKEN_PATTERN = "[A-Za-z0-9]+"

#: Tiny per-language stopword sets for the n-gram/stopword-voting heuristic.
#: Deliberately small + high-frequency; language ID here is a pipeline
#: operator (bucketing quality), not a linguistics product.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["que", "de", "la", "el", "en", "los", "del", "las", "por", "una"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "des", "est", "une", "dans", "que", "pour"],
}


def h60(col: Column | str) -> Column:
    """Deterministic 60-bit hash: first 15 hex digits of md5, as int64.

    Chosen over xxhash64/hash because DuckDB computes the identical value
    (``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``), making every
    hash-derived operator oracle-checkable bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB twin of :func:`h60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def tokenize(col: Column | str, lowercase: bool = True) -> Column:
    """ASCII word tokens (regexp_extract_all)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0))


def token_count(col: Column | str) -> Column:
    """Whitespace-free token count (the BPE-ish regex count)."""
    return F.size(tokenize(col, lowercase=False))


#: GPT-2-style pre-tokenizer, lookahead-free so Java regex (Spark) and RE2
#: (DuckDB oracle) agree: contraction suffixes, space-prefixed letter runs,
#: digit runs, punctuation runs, residual whitespace. Counting its matches
#: estimates the BPE token budget of a document without shipping a
#: vocabulary — the standard cheap cost model for LLM-pipeline sizing.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def ws_token_count(col: Column | str) -> Column:
    """Whitespace-split token count (runs of non-space)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"\S+"))


def bpe_token_estimate(col: Column | str) -> Column:
    """Pre-tokenizer match count — an upper-bound estimate of BPE tokens
    (each match is one-or-more merged BPE tokens; for sizing, the match
    count tracks real tokenizer output within ~25% on English text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Number of token positions that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))


def lang_id(text_col: Column | str) -> Column:
    """Stopword-voting language ID: argmax over per-language hit counts,
    'und' (undetermined) when no stopwords match at all.

    Ties break by the fixed language order en > es > de > fr (documented,
    mirrored in the oracle SQL).
    """
    tokens = tokenize(text_col)
    hits = {lang: stopword_hits(tokens, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, "und")
    for lang in STOPWORDS:  # insertion order = tie precedence
        expr = expr.when(hits[lang] == best, lang)
    return expr


def quality_score(text_col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length band + punctuation ratio
    + stopword ratio + mean word length band, equally weighted.

    All four terms are ratios of integer counts -> deterministic doubles,
    combined with fixed left-associated arithmetic (oracle bit-exact).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    tokens = tokenize(c)
    n_tok = F.size(tokens)
    n_chars = F.length(c)
    n_alnum = F.size(F.regexp_extract_all(c, F.lit("[A-Za-z0-9]"), F.lit(0)))
    n_stop = stopword_hits(tokens, "en")

    len_ok = ((n_chars >= 50) & (n_chars <= 2000)).cast("double")
    alnum_ratio = n_alnum.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    mean_wordlen = n_alnum.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    wordlen_ok = ((mean_wordlen >= 2.0) & (mean_wordlen <= 12.0)).cast("double")

    return (
        len_ok * 0.25 + alnum_ratio * 0.25 + stop_ratio * 0.25 + wordlen_ok * 0.25
    )


def word_ngrams(tokens: Column, n: int) -> Column:
    """Word n-gram strings from a token array (space-joined, distinct).

    Guarded for short docs: Spark's sequence(1, 0) would count DOWN
    ([1, 0]), so fewer-than-n tokens must short-circuit to an empty array.
    """
    count = F.size(tokens) - (n - 1)
    return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
            )
        )
    )


def doc_fingerprint(text_col: Column | str, n: int = 5) -> Column:
    """Winnowing-style document fingerprint: min 60-bit hash over word
    n-grams (the minimum of a rolling-hash window family). Empty/short docs
    fingerprint to null.
    """
    grams = word_ngrams(tokenize(text_col), n)
    return F.array_min(F.transform(grams, h60))
