"""Every registered query vs its DuckDB oracle — the driver's gate, locally."""

from __future__ import annotations

import pytest

from spark_streaming_invoice_anomaly_detection_spark.plans.registry import (
    REGISTRY,
    queries,
)

from .oracle import assert_matches_oracle, duckdb_con

queries()  # force registry load
ORACLE_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]

# Queries whose correct result CAN be empty at small SF. Everything else
# must return rows — an empty result matching an empty oracle is a vacuous
# pass (r2 ADVICE: three queries validated nothing through dead filters).
EMPTY_OK = {"join_anti", "nation_volume_shipping"}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert_matches_oracle(
        df, con, spec.oracle, name=name, allow_empty=name in EMPTY_OK
    )
