"""Benchmark runner — times the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Execution is measured end-to-end through a noop sink (full scan →
shuffle → sink, no driver collect skew). A tiny warmup job first so JVM
startup / codegen compilation isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from sales_data_pipeline_spark.plans import QUERIES
from sales_data_pipeline_spark.session import get_spark


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    spark = get_spark(
        app_name="sales_data_pipeline_spark-bench",
        master=f"local[{cpus}]" if cpus else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches + codegen paths (unmeasured
    # first pass; the timed pass below measures steady-state execution)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    headline = [q for q in QUERIES.values() if q.headline]
    for q in headline:
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for q in headline:
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[q.name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
