"""Benchmark runner — times the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Execution is measured end-to-end through a noop sink (full scan →
shuffle → sink, no driver collect skew). A tiny warmup job first so JVM
startup / codegen compilation isn't billed to the first query.

Regression-aware: each query runs $SPARK_GRAFT_BENCH_ITERS times
(default 3, round-robin so drift spreads evenly) and reports the
per-query MEDIAN; if BASELINE.json carries a "bench_baseline" block at
the same scale factor, queries slower than 1.5× their baseline median
are listed under "regressions" in the output line.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from sales_data_pipeline_spark.plans import QUERIES
from sales_data_pipeline_spark.session import get_spark

REGRESSION_FACTOR = 1.5


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _baseline_queries(sf: float) -> dict[str, float]:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")
    try:
        with open(path) as f:
            base = json.load(f).get("bench_baseline", {})
    except (OSError, json.JSONDecodeError):
        return {}
    return base.get("queries", {}) if base.get("sf") == sf else {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = max(int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")), 1)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    spark = get_spark(
        app_name="sales_data_pipeline_spark-bench",
        master=f"local[{cpus}]" if cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches + codegen paths (unmeasured
    # first pass; the timed passes below measure steady-state execution)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    headline = [q for q in QUERIES.values() if q.headline]
    for q in headline:
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {q.name: [] for q in headline}
    for _ in range(iters):
        # Dedup operators persist() their shingle sets and Spark's
        # CacheManager matches identical plans across invocations, so
        # without this each timed pass would silently reuse the previous
        # pass's cache (and cached blocks would accumulate all run).
        # Clearing makes every sample measure the query's real cost.
        spark.catalog.clearCache()
        for q in headline:
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[q.name].append(time.perf_counter() - t0)
    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}

    sf = _sf_from_dir(sf_dir)
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "iters": iters,
    }
    baseline = _baseline_queries(sf)
    regressions = {
        name: {"sec": t, "baseline_sec": baseline[name],
               "factor": round(t / baseline[name], 2)}
        for name, t in timings.items()
        if name in baseline and t > baseline[name] * REGRESSION_FACTOR
    }
    if regressions:
        out["regressions"] = regressions
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
