"""Per-job profile of one catalog query (guide §1: measure first).

Runs the named query once unmeasured (warmup: JVM/codegen/parquet
footers), clears caches, then runs it again timed through the noop sink
and dumps every Spark job the timed run submitted — duration, task
count, and the job group/description — plus per-stage shuffle bytes,
from the live UI REST API. Usage:

    SPARK_GRAFT_CPUS=32 python tools/profile_query.py q49_dedup_clusters
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

    first_job = max(sc.statusTracker().getJobIdsForGroup() or [-1]) + 1
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{sc.applicationId}"
    jobs = [j for j in _get(base + "/jobs") if j["jobId"] >= first_job]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in _get(base + "/stages")}
    total_job_sec = 0.0
    print(f"query={name} wall={wall:.3f}s jobs={len(jobs)}")
    for j in jobs:
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        try:
            dur = (
                datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
            ).total_seconds()
        except Exception:
            dur = float("nan")
        total_job_sec += dur if dur == dur else 0.0
        sids = j.get("stageIds", [])
        sh = sum(
            stages[s].get("shuffleWriteBytes", 0)
            for s in sids
            if s in stages
        )
        nst = sum(1 for s in sids if s in stages and stages[s].get("status") == "COMPLETE")
        print(
            f"  job {j['jobId']:>4} {dur:7.3f}s tasks={j.get('numTasks', 0):>5} "
            f"stages={nst}/{len(sids)} shufW={sh:>12,}B  {(j.get('description') or j.get('name') or '')[:90]}"
        )
    print(f"sum(job durations)={total_job_sec:.3f}s  (gaps = driver/planning time: {wall - total_job_sec:.3f}s)")


if __name__ == "__main__":
    main()
