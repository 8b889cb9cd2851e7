"""Streaming revenue-anomaly monitor: the incremental form of
q149_revenue_anomalies.

Orders arrive as JSONL shards; each micro-batch folds its per-day
DECIMAL revenue sums into a persisted day table (bounded: one row per
calendar day), then recomputes z-scores for every day from the folded
table and publishes the anomaly report. Because the day table is a sum
monoid over exact decimals, the converged report after any batch
partitioning equals the one-shot batch computation over the union of
all shards — asserted in tests/test_streaming.py against the same
closed-form moments q149 uses.

Crash-retry safety reuses heavy_hitters' versioned-commit protocol
verbatim: day-table versions live under ``state_dir/v=<batch_id>``
(immutable, _SUCCESS-gated), a retried batch whose version already
committed is SKIPPED (no double-fold), and older versions are pruned
after each commit. The published report is derived state — rewriting it
from the latest day table is idempotent by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_spark.pipeline.fs import delete_path
from sales_data_pipeline_spark.streaming.heavy_hitters import (
    _committed_versions,
    _version_path,
)

ORDER_STREAM_SCHEMA = "order_id long, order_date string, total_price double"
DAY_SCHEMA = "day string, rev decimal(18,2)"


@dataclass(frozen=True)
class AnomalyConfig:
    input_dir: str  # arriving JSONL shards of ORDER_STREAM_SCHEMA
    state_dir: str  # versioned parquet day table: v=<batch_id>/(day, rev)
    report_dir: str  # derived anomaly report (rewritten each batch)
    checkpoint_dir: str
    z_threshold: float = 2.0
    max_files_per_trigger: int | None = None


def _read_days(spark: SparkSession, cfg: AnomalyConfig) -> DataFrame:
    versions = _committed_versions(spark, cfg.state_dir)
    if not versions:
        return spark.createDataFrame([], DAY_SCHEMA)
    return spark.read.parquet(_version_path(cfg.state_dir, versions[-1]))


def _zscore_report(days: DataFrame, z_threshold: float) -> DataFrame:
    """q149's closed-form moments over the day table: decimal-exact
    Σrev and Σrev², variance from (ss − tot²/n)/(n−1) — deterministic
    regardless of fold order. n ≤ 2 days yields no report rows (sample
    variance undefined/degenerate)."""
    s = days.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev").cast("double").alias("tot"),
        F.sum(F.col("rev") * F.col("rev")).cast("double").alias("ss"),
    )
    j = days.crossJoin(F.broadcast(s)).filter(F.col("n") >= 3)
    mu = F.col("tot") / F.col("n")
    sigma = F.sqrt(
        (F.col("ss") - F.col("tot") * F.col("tot") / F.col("n")) / (F.col("n") - 1)
    )
    z = (F.col("rev").cast("double") - mu) / sigma
    return j.select(
        "day",
        F.col("rev").cast("double").alias("rev"),
        F.round(z, 6).alias("zscore"),
        F.when(F.abs(z) >= z_threshold, F.lit(1)).otherwise(F.lit(0))
        .cast("bigint").alias("is_anomaly"),
    )


def read_report(spark: SparkSession, cfg: AnomalyConfig) -> DataFrame:
    """Latest published report; empty ONLY when none exists yet. A
    transient read error must propagate, not silently present an empty
    report (the failure mode ADVICE r2 flagged on the sketch reader)."""
    from sales_data_pipeline_spark.pipeline.fs import path_exists

    if not path_exists(spark, cfg.report_dir):
        return spark.createDataFrame(
            [], "day string, rev double, zscore double, is_anomaly bigint"
        )
    return spark.read.parquet(cfg.report_dir)


def run_revenue_anomalies(spark: SparkSession, cfg: AnomalyConfig) -> None:
    """Drain available shards (Trigger.AvailableNow); see module doc."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        versions = _committed_versions(spark, cfg.state_dir)
        if versions and versions[-1] >= batch_id:
            return  # already folded (crash between commit and checkpoint)
        delta = batch.groupBy(
            F.substring("order_date", 1, 10).alias("day")
        ).agg(F.sum(F.col("total_price").cast("decimal(18,2)")).alias("rev"))
        merged = (
            _read_days(spark, cfg).unionByName(delta)
            .groupBy("day")
            .agg(F.sum("rev").cast("decimal(18,2)").alias("rev"))
        )
        rows = merged.collect()  # one row per calendar day — bounded
        spark.createDataFrame(rows, DAY_SCHEMA) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(_version_path(cfg.state_dir, batch_id))
        for old in versions:
            delete_path(spark, _version_path(cfg.state_dir, old), recursive=True)
        # derived report: recomputed from the committed day table —
        # rewriting it on retry is idempotent
        _zscore_report(_read_days(spark, cfg), cfg.z_threshold) \
            .coalesce(1).write.mode("overwrite").parquet(cfg.report_dir)

    reader = (
        spark.readStream.schema(ORDER_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.jsonl")
    )
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    stream = reader.json(cfg.input_dir)
    (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
