"""COVERAGE.md self-check (round-7 VERDICT ask #6, missed twice).

The registry count stated in COVERAGE.md drifted in r7 (176 stated /
178 actual) and again in r8 (178 stated / 181 actual) — each round's
new registrations outran the prose. This pins the LAST "Registry: N
queries (M oracled)" sentence in COVERAGE.md to the live registry so
the document cannot go stale a third time without failing the suite.
"""

from __future__ import annotations

import os
import re

from spark_streaming_invoice_anomaly_detection_spark.plans import registry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_doc_registry_count_is_current():
    with open(os.path.join(ROOT, "COVERAGE.md")) as f:
        text = f.read()
    stated = re.findall(r"Registry: (\d+) queries \((\d+) oracled\)", text)
    assert stated, "COVERAGE.md lost its 'Registry: N queries' sentence"
    n_stated, oracled_stated = map(int, stated[-1])
    registry._load_all()
    n_actual = len(registry.REGISTRY)
    oracled_actual = sum(
        1 for s in registry.REGISTRY.values() if s.oracle is not None
    )
    assert (n_stated, oracled_stated) == (n_actual, oracled_actual), (
        f"COVERAGE.md says {n_stated} queries ({oracled_stated} oracled) "
        f"but the registry has {n_actual} ({oracled_actual} oracled) — "
        "update the LAST Registry sentence in COVERAGE.md"
    )
