"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes the engine's full catalog (one entry per implemented operator
from SURVEY.md §2 plus the LLM-data-pipeline extensions); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sales_data_pipeline_spark.plans import QUERIES

_SMOKE_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q02_customer_monthly_mart"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (customer monthly mart) on sf0.001."""
    return QUERIES[FLAGSHIP].fn(spark, _SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every implemented catalog query: name -> (spark, sf_dir) -> DataFrame."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query; queries
    whose semantics are not SQL-expressible (LSH dedup/ANN, streaming
    state) are omitted -> driver records the weaker rows-only check."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
