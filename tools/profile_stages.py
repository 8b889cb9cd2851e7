"""Stage-level profile of one catalog query (guide §1/§7.1).

Like profile_query.py but dumps per-STAGE metrics for the timed run:
duration, task count, executor run time (sum over tasks), shuffle
read/write bytes, and the stage name — the local-mode stand-in for the
UI's stage table. Usage:

    SPARK_GRAFT_CPUS=32 PYTHONPATH=. python tools/profile_stages.py q294_triangle_estimate
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from sales_data_pipeline_spark.plans import QUERIES
from sales_data_pipeline_spark.session import get_spark


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    q = QUERIES[name]

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    import gc

    gc.collect()
    sc._jvm.System.gc()
    time.sleep(1.0)

    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{sc.applicationId}"
    seen = {s["stageId"] for s in _get(base + "/stages")}
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    stages = [s for s in _get(base + "/stages") if s["stageId"] not in seen]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"query={name} wall={wall:.3f}s stages={len(stages)}")
    tot = 0
    for s in stages:
        run = s.get("executorRunTime", 0) / 1000.0
        tot += run
        if run < 0.05:
            continue
        print(
            f"  stage {s['stageId']:>4} exec={run:7.2f}s tasks={s.get('numCompleteTasks', 0):>4} "
            f"shR={s.get('shuffleReadBytes', 0):>11,} shW={s.get('shuffleWriteBytes', 0):>11,} "
            f"in={s.get('inputBytes', 0):>11,}  {s.get('name', '')[:70]}"
        )
    print(f"sum(executorRunTime)={tot:.2f}s over {cpus} cores; wall={wall:.3f}s")


if __name__ == "__main__":
    main()
