"""Query catalog: name → (Spark callable, ANSI-SQL oracle)."""

from sales_data_pipeline_spark.plans.registry import QUERIES, Query, query  # noqa: F401

# Importing the query modules populates QUERIES.
from sales_data_pipeline_spark.plans import corpus_ops  # noqa: E402,F401
from sales_data_pipeline_spark.plans import governance  # noqa: E402,F401
from sales_data_pipeline_spark.plans import relational  # noqa: E402,F401
from sales_data_pipeline_spark.plans import similarity_multimodal  # noqa: E402,F401
from sales_data_pipeline_spark.plans import text_dedup  # noqa: E402,F401
