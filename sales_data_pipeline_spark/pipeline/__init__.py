"""End-to-end sales ETL: validate → normalize → enrich → marts → sinks."""

from sales_data_pipeline_spark.pipeline.sales_pipeline import (  # noqa: F401
    JdbcTopology,
    PipelineConfig,
    PipelineResult,
    run_pipeline,
    run_pipeline_jdbc,
)
from sales_data_pipeline_spark.pipeline.state import AuditState  # noqa: F401
