"""Semantic pins for repeated-line boilerplate dedup (r11, CCNet
arXiv:1911.00359 / RefinedWeb arXiv:2306.01116): the token_lines
decomposition contract, the census arithmetic, and the planted
header/footer carrier counts the DuckDB hash oracle proves equal but
cannot explain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_invoice_anomaly_detection_spark.operators import dedup as D
from spark_streaming_invoice_anomaly_detection_spark.plans import extensions as E


def _lines_of(spark, texts, width=3):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    col = D.token_lines(F.col("text"), width=width)
    return [r.l for r in df.select(col.alias("l")).orderBy("id").collect()]


def test_token_lines_decomposition(spark):
    """Exhaustive fixed-width chunking: every token lands in exactly one
    line, in order, with a ragged tail — joining the lines back with a
    space reproduces the token stream."""
    full, ragged, short, empty = _lines_of(
        spark,
        [
            "a b c d e f",  # exact multiple of width
            "a b c d e f g",  # ragged 1-token tail
            "a b",  # shorter than one line
            "",  # no tokens
        ],
    )
    assert full == ["a b c", "d e f"]
    assert ragged == ["a b c", "d e f", "g"]
    assert short == ["a b"]
    assert empty == []
    for lines, text in [(full, "a b c d e f"), (ragged, "a b c d e f g")]:
        assert " ".join(lines) == text


def test_token_lines_param_validation():
    with pytest.raises(ValueError):
        D.token_lines(F.col("t"), width=0)


def test_planted_lines_survive_tokenization(spark):
    """The planted boilerplate strings must round-trip the tokenizer
    verbatim (lowercase ASCII words only), or the plant would hash
    differently from the body lines it is compared against — and both
    must clear the short-line guard."""
    for s in (E._LINE_HEADER, E._LINE_FOOTER):
        (lines,) = _lines_of(spark, [s], width=100)
        assert lines == [s]
        assert len(s.split(" ")) >= E._LINE_MIN_TOK


def test_repeated_line_census_arithmetic(spark, sf_dir):
    """Census internal consistency + the planted structure: the header
    (every 7th doc) and footer (every 9th) moduli are coprime to the
    corpus's source stride (source = doc_id % 20), so EVERY source must
    see carriers, and fractions must be exact ratios of the counted
    columns."""
    rows = E.q_repeated_line_census(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_docs > 0
        assert 0 <= r.boiler_docs <= r.n_docs
        assert 0 <= r.n_boiler_lines <= r.n_lines
        assert r.boiler_frac == pytest.approx(
            r.n_boiler_lines / r.n_lines if r.n_lines else 0.0
        )
        # CRT floor: among n_docs ids in an arithmetic progression with
        # step 20, multiples of 7 appear every 7 terms
        assert r.boiler_docs >= r.n_docs // E._LINE_HDR_MOD


def test_top_repeated_lines_planted_carriers(spark, sf_dir):
    """The planted header (every 7th doc) and footer (every 9th) head the
    strip-list with EXACT carrier counts; ordering contract holds."""
    import spark_streaming_invoice_anomaly_detection_spark.sources.catalog as cat

    rows = E.q_top_repeated_lines(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    doc_ids = [
        r.doc_id
        for r in cat.load_table(spark, "documents", sf_dir)
        .select("doc_id")
        .collect()
    ]
    hdr_docs = sum(1 for i in doc_ids if i % E._LINE_HDR_MOD == 0)
    ftr_docs = sum(1 for i in doc_ids if i % E._LINE_FTR_MOD == 0)
    by_line = {r.line: r for r in rows}
    assert E._LINE_HEADER in by_line and E._LINE_FOOTER in by_line
    assert by_line[E._LINE_HEADER].n_docs == hdr_docs
    assert by_line[E._LINE_HEADER].n_occ == hdr_docs
    assert by_line[E._LINE_FOOTER].n_docs == ftr_docs
    assert by_line[E._LINE_FOOTER].n_occ == ftr_docs
    assert rows[0].line == E._LINE_HEADER
    keys = [(-r.n_docs, -r.n_occ, r.line_hash) for r in rows]
    assert keys == sorted(keys)
    # short-line guard: nothing below the token floor reaches the report
    assert all(len(r.line.split(" ")) >= E._LINE_MIN_TOK for r in rows)
