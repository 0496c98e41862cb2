"""Corpus-cleaning operators (operators/cleaning.py) on known inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_invoice_anomaly_detection_spark.operators import cleaning as C


def test_strip_html_known(spark):
    rows = [
        (1, "<p>Hello <b>world</b></p>", "Hello world"),
        (2, "a &amp; b &#38; c", "a b c"),
        (3, "no markup  at\tall", "no markup at all"),
        (4, "<div class='x'>nested <span>tags</span></div>", "nested tags"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, want string")
    for r in df.select("id", "want", C.strip_html("text").alias("got")).collect():
        assert r.got == r.want, (r.id, r.got)


def test_redact_pii_known(spark):
    rows = [
        (1, "mail me at jo.doe+x@example.org now", "mail me at <EMAIL> now"),
        (2, "call +1 (555) 123-4567 today", "call <PHONE> today"),
        (3, "both: a@b.co and 555-123-9999", "both: <EMAIL> and <PHONE>"),
        (4, "clean text, no pii", "clean text, no pii"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, want string")
    out = df.select(
        "id", "want",
        C.redact_pii("text").alias("got"),
        C.pii_hit_count("text").alias("hits"),
    )
    for r in out.collect():
        assert r.got == r.want, (r.id, r.got)
    hits = {r.id: r.hits for r in out.collect()}
    assert hits == {1: 1, 2: 1, 3: 2, 4: 0}


def test_repetition_ratios_known(spark):
    rows = [
        (1, "a\nb\nc"),        # all lines unique
        (2, "x\nx\nx\nx"),     # 4 lines, 1 distinct -> 0.75
        (3, "w w w unique"),   # 4 words, 2 distinct -> 0.5
        (4, ""),               # empty -> 0.0 both
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    dl, dw = C.repetition_ratios("text")
    got = {
        r.id: (r.dl, r.dw)
        for r in df.select("id", dl.alias("dl"), dw.alias("dw")).collect()
    }
    assert got[1][0] == 0.0
    assert got[2][0] == 0.75
    assert got[3][1] == 0.5
    assert got[4] == (0.0, 0.0)


def test_hash_split_deterministic_and_complete(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    split = C.hash_split("doc_id", {"train": 80, "val": 10, "test": 10})
    counts = {
        r.split: r.n
        for r in df.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}  # every row labeled
    assert sum(counts.values()) == 2000
    # roughly proportional (hash uniformity; generous bounds)
    assert 1400 < counts["train"] < 1800
    # deterministic across evaluations
    again = {
        r.split: r.n
        for r in df.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == again


def test_hash_split_rejects_bad_weights():
    import pytest

    with pytest.raises(ValueError):
        C.hash_split("doc_id", {"train": 50, "val": 10})


def test_stratified_sample_flag_stable_subset(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    picked10 = {
        r.doc_id
        for r in df.filter(C.stratified_sample_flag("doc_id", 10)).collect()
    }
    picked20 = {
        r.doc_id
        for r in df.filter(C.stratified_sample_flag("doc_id", 20)).collect()
    }
    assert 50 < len(picked10) < 150
    assert picked10 <= picked20  # raising pct only ever ADDS members
