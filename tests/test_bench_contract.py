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


def test_bench_rechecks_flagged_regressions_in_process(tmp_path):
    """Self-adjudication: when a query flags against baseline, bench
    re-samples it same-process and embeds the recheck median — an entry
    back inside the gate moves to resolved_by_recheck, one still above
    stays in regressions; either way the evidence is IN the JSON."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # a baseline that guarantees flags (impossibly fast) alongside one
    # that guarantees a clean pass (impossibly slow)
    canon = json.load(open(os.path.join(repo, "BASELINE.json")))
    names = list(canon.get("bench_baseline", {}).get("queries", {}))[:2] or [
        "q01_pricing_summary",
        "q02_customer_monthly_mart",
    ]
    fake = {
        "bench_baseline": {
            "sf": 0.001,
            "queries": {names[0]: 1e-6, names[1]: 1e6},
        }
    }
    bpath = tmp_path / "baseline.json"
    bpath.write_text(json.dumps(fake))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_ITERS="1",
        SPARK_GRAFT_BASELINE=str(bpath),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=repo, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    # the impossibly-fast baseline can never be resolved by recheck
    flagged = rec.get("regressions", {})
    assert names[0] in flagged
    entry = flagged[names[0]]
    assert {"sec", "baseline_sec", "factor", "recheck_sec", "recheck_factor"} <= set(entry)
    assert entry["recheck_factor"] > 1.5
    # the impossibly-slow baseline never flags at all
    assert names[1] not in flagged
    assert names[1] not in rec.get("resolved_by_recheck", {})
