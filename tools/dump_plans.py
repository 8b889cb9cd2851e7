"""Dump `.explain("formatted")` for catalog queries (guide §7.2) —
the before/after plan evidence each optimization round commits under
plans/r<N>/. Usage:

    PYTHONPATH=. python tools/dump_plans.py plans/r13 _after q288_curation_funnel ...

Writes <outdir>/<query><suffix>.txt for each named query (all headline
queries when none are named). Plans are dumped from a PRISTINE session
(no cached fragments), so shapes are the cold-plan shapes the plan
tests pin.
"""

from __future__ import annotations

import os
import sys

from sales_data_pipeline_spark.plans import QUERIES
from sales_data_pipeline_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [q.name for q in QUERIES.values() if q.headline]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="dump-plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    for name in names:
        spark.catalog.clearCache()
        df = QUERIES[name].fn(spark, sf_dir)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = sum(
            1 for line in plan.splitlines()
            if line.startswith("(") and ") Exchange" in line.split("\n")[0]
            and line.split(") ", 1)[1].startswith("Exchange")
        )
        print(f"{path}: {len(plan.splitlines())} lines, {n_ex} Exchange nodes")


if __name__ == "__main__":
    main()
