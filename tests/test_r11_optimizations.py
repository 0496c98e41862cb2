"""Focused pins for the r11 optimization-round internals.

Each optimization changed HOW an operator computes, never WHAT: these
tests pin the value-identity arguments and the physical-shape claims so a
later edit can't silently regress either side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_invoice_anomaly_detection_spark.operators.layout import (
    cluster_if_narrow,
)
from spark_streaming_invoice_anomaly_detection_spark.operators.text import (
    tokenize,
    word_ngrams,
)
from spark_streaming_invoice_anomaly_detection_spark.sources import catalog


class TestWordNgramsZipWith:
    """word_ngrams builds grams as zip_with folds over shifted slices;
    output must equal the definitional transform(sequence) construction
    for every n in use and on the short-doc edge cases."""

    def _reference(self, tokens, n):
        # the pre-r11 definitional form: per-position element_at concat
        def grams(ts):
            count = F.size(ts) - (n - 1)

            def gram(i):
                parts = []
                for j in range(n):
                    if j:
                        parts.append(F.lit(" "))
                    parts.append(F.element_at(ts, i + F.lit(j)))
                return F.concat(*parts)

            return F.when(
                count <= 0, F.array().cast("array<string>")
            ).otherwise(
                F.array_distinct(
                    F.transform(F.sequence(F.lit(1), count), gram)
                )
            )

        return F.element_at(F.transform(F.array(tokens), grams), 1)

    def test_matches_definitional_form_all_n(self, spark):
        rows = [
            ("a b c d e f g",),
            ("a b",),
            ("a",),
            ("",),
            ("x x x x",),  # duplicates: array_distinct path
            ("one two three four five six seven eight nine ten",),
        ]
        df = spark.createDataFrame(rows, "text string")
        toks = df.select("text", tokenize(F.col("text")).alias("t"))
        for n in (1, 2, 3, 5):
            # keyed on the source text (unique per row), not on
            # monotonically_increasing_id alignment of two separate plans
            # (r11 ADVICE: a planner change could silently misalign rows)
            got = {
                r.text: r.g
                for r in toks.select(
                    "text", word_ngrams(F.col("t"), n).alias("g")
                ).collect()
            }
            want = {
                r.text: r.g
                for r in toks.select(
                    "text", self._reference(F.col("t"), n).alias("g")
                ).collect()
            }
            assert got == want, f"n={n} diverged"

    def test_short_doc_returns_empty(self, spark):
        df = spark.createDataFrame([("a b",)], "text string")
        out = df.select(
            word_ngrams(tokenize(F.col("text")), 3).alias("g")
        ).head()
        assert out.g == []


class TestClusterIfNarrow:
    def test_narrow_scan_gets_keyed_repartition(self, spark, sf_dir):
        li = catalog.load_table(spark, "lineitem", sf_dir)
        out = cluster_if_narrow(li, "l_orderkey")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "RepartitionByExpression" in plan.replace(
            "repartitionbyexpression", "RepartitionByExpression"
        ) or "l_orderkey" in plan

    def test_agg_behind_single_exchange(self, spark, sf_dir):
        """The keyed spread must satisfy the groupBy's distribution: one
        hash exchange total, not two."""
        li = catalog.load_table(spark, "lineitem", sf_dir)
        df = cluster_if_narrow(li, "l_orderkey").groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("c")
        )
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert phys.count("Exchange hashpartitioning") == 1

    def test_values_identical_to_plain_agg(self, spark, sf_dir):
        li = catalog.load_table(spark, "lineitem", sf_dir)
        plain = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
            .orderBy("l_orderkey")
            .collect()
        )
        spread = (
            cluster_if_narrow(li, "l_orderkey")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
            .orderBy("l_orderkey")
            .collect()
        )
        assert plain == spread


class TestJaccardDistinct:
    """jaccard_distinct (inclusion-exclusion union size) must bit-match
    jaccard on duplicate-free arrays — the only inputs its call sites
    (shingle columns) ever produce — and is allowed to diverge on
    duplicate-bearing arrays (documented)."""

    def test_matches_jaccard_on_distinct_arrays(self, spark):
        from spark_streaming_invoice_anomaly_detection_spark.operators.dedup import (
            jaccard,
            jaccard_distinct,
        )

        rows = [
            (["a", "b", "c"], ["b", "c", "d"]),
            (["a"], ["a"]),
            (["a"], ["b"]),
            ([], ["a", "b"]),
            ([], []),
            (["x", "y", "z", "w"], ["y"]),
        ]
        df = spark.createDataFrame(
            rows, "a array<string>, b array<string>"
        )
        mism = df.select(
            (
                jaccard(F.col("a"), F.col("b"))
                != jaccard_distinct(F.col("a"), F.col("b"))
            ).alias("d")
        ).filter("d").count()
        assert mism == 0


class TestTableHandleCache:
    def test_same_handle_same_key(self, spark, sf_dir):
        a = catalog.load_table(spark, "orders", sf_dir)
        b = catalog.load_table(spark, "orders", sf_dir)
        assert a is b  # plan-object reuse, the whole point

    def test_distinct_keys_distinct_handles(self, spark, sf_dir, tmp_path):
        # second sf_dir derived from the fixture via symlink (r11 ADVICE:
        # don't hardcode two dataset paths — the property under test only
        # needs two distinct keys over readable parquet)
        import os

        alt = tmp_path / "alt_sf"
        alt.mkdir()
        os.symlink(
            os.path.join(sf_dir, "orders.parquet"), alt / "orders.parquet"
        )
        a = catalog.load_table(spark, "orders", sf_dir)
        b = catalog.load_table(spark, "orders", str(alt))
        assert a is not b

    def test_no_data_caching(self, spark, sf_dir):
        """The memo must hold LAZY handles only: nothing lands in the
        CacheManager, so every action re-scans parquet."""
        df = catalog.load_table(spark, "orders", sf_dir)
        assert not df.is_cached
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan
