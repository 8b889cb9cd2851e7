"""One-off same-protocol baseline recorder for the headline bench set.

Mirrors bench.py's protocol exactly (same session factory, warmup,
noop sink, clearCache'd per-query cold medians) but with n=5 iterations
and a query SUBSET, then merges the new medians into
BASELINE.json.bench_baseline and recomputes total_sec. Used for the r3
q23 re-record precedent: when a query's cost has genuinely moved for a
documented reason (or a new query joins the headline set), the
baseline must describe the code that ships, or the per-round
regression gate flags forever.

  SPARK_GRAFT_REBASELINE=q33_corpus_curation,q49_dedup_clusters \
      python tools/rebaseline.py

Prints the measured medians; does NOT write unless
SPARK_GRAFT_REBASELINE_WRITE=1 (measure-first, decide-then-write: the
same run doubles as the same-process A/B evidence for triage rows that
end up NOT re-recorded)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sales_data_pipeline_spark.plans import QUERIES  # noqa: E402
from sales_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [
        n for n in os.environ["SPARK_GRAFT_REBASELINE"].split(",") if n
    ]
    for n in names:
        assert n in QUERIES, n
        assert QUERIES[n].headline, f"{n} is not a headline query"
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="sales_data_pipeline_spark-rebaseline")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for n in names:  # unmeasured warmup pass (bench.py's protocol)
        QUERIES[n].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(iters):
        spark.catalog.clearCache()
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[n].append(time.perf_counter() - t0)
    medians = {
        n: round(statistics.median(ts), 3) for n, ts in samples.items()
    }
    print(json.dumps({"medians": medians, "samples": {
        n: [round(t, 3) for t in ts] for n, ts in samples.items()
    }}, indent=2))
    if os.environ.get("SPARK_GRAFT_REBASELINE_WRITE") != "1":
        print("dry run (set SPARK_GRAFT_REBASELINE_WRITE=1 to merge)",
              file=sys.stderr)
        return
    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        doc = json.load(f)
    doc["bench_baseline"]["queries"].update(medians)
    doc["bench_baseline"]["total_sec"] = round(
        sum(doc["bench_baseline"]["queries"].values()), 3
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print("merged into BASELINE.json", file=sys.stderr)


if __name__ == "__main__":
    main()
