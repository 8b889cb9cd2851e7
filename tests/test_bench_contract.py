"""bench.py is a graded artifact: it must print exactly one parseable
JSON line with the driver's expected keys, whatever else happens."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line_with_contract_keys():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_ITERS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{") and ln.endswith("}")
    ]
    assert len(json_lines) == 1, out.stdout
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "headline_queries_total_sec"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.001
    assert isinstance(rec["value"], (int, float)) and rec["value"] > 0
    assert rec["queries"] and all(v >= 0 for v in rec["queries"].values())
    assert abs(sum(rec["queries"].values()) - rec["value"]) < 0.01
