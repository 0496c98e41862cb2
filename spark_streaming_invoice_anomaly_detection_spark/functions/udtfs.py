"""Python UDTFs (Spark 4 table functions) — the interop surface for
row-generating logic that has no native-expression equivalent.

The engine's hot paths stay native (operators/text.word_ngrams is the
production n-gram path, whole-stage codegen'd); the UDTF twin here exists
for (a) SQL-first users who want ``LATERAL ngrams(text, 3)`` and (b) as
the pattern for genuinely Python-only generators (custom tokenizers,
format parsers). Row-at-a-time Python — use for long-tail logic, not bulk
transforms.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

#: ASCII-only case fold, mirroring operators/text.ascii_lower (a
#: translate over A-Z only). Python str.lower() would apply full Unicode
#: case mapping ('İ'.lower() mints an ASCII 'i' + combining dot) and
#: diverge from the native n-gram path on non-ASCII uppercase text.
_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


@udtf(returnType="pos int, gram string")
class NgramUDTF:
    """Word n-grams with positions: one output row per gram.

    Tokenization matches operators/text.tokenize exactly: ASCII-only
    case folding (translate A-Z→a-z, every other codepoint untouched)
    then [A-Za-z0-9]+ runs — so ``LATERAL ngrams()`` results line up
    with the native word_ngrams path on any input, ASCII or not.
    """

    def eval(self, text: str, n: int):  # noqa: D102 (generator contract)
        import re

        if text is None or n is None or n <= 0:
            return
        toks = re.findall(r"[A-Za-z0-9]+", text.translate(_ASCII_FOLD))
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on a session (idempotent)."""
    spark.udtf.register("ngrams", NgramUDTF)
