"""bench.py smoke: the driver's per-round benchmark entry must print one
parseable JSON line with the contract keys — a broken bench forfeits the
round's BENCH record, so it gets the same CI protection as the queries."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_prints_contract_json():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "sec"
    assert rec["value"] > 0
    assert rec["sf"] == 0.001
    assert len(rec["queries"]) == 18
    assert all(v >= 0 for v in rec["queries"].values())
    # streaming drain rates: positive, and far above the reference
    # simulator's ~200 rec/s ceiling (-1 = did-not-drain sentinel)
    assert rec["streaming_parse_lines_per_sec"] > 1000
    assert rec["drift_monitor_lines_per_sec"] > 1000
    assert rec["expectations_lines_per_sec"] > 1000
