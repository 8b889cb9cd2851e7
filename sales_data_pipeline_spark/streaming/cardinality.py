"""Streaming rolling distinct count: HyperLogLog registers maintained
across micro-batches — the cardinality twin of
streaming/heavy_hitters.py (count-min for frequencies, HLL for
distincts; same reason both exist as TABLES: mergeable across runs).

The exact streaming answer ("how many distinct users/keys ever seen")
needs unbounded state; the sketch answer needs ≤ 2^p register rows
forever. Each micro-batch builds its own partial register table
(operators/sketch.hll_build — one bounded aggregation) and folds it
into the persisted table with the HLL monoid: per-register MAX —
associative, commutative and IDEMPOTENT. That last property is the
interesting upgrade over the count-min fold: re-merging the same
partial cannot change a max, so the versioned-commit protocol's
skip-vs-fold decision protects nothing here numerically — it is kept
anyway for storage hygiene and so both sketch streams behave
identically under crash-retry (analysis in heavy_hitters.py's module
docstring; the version/_SUCCESS machinery is imported from there —
one implementation, two sketches).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_spark.operators.sketch import hll_build, hll_estimate
from sales_data_pipeline_spark.pipeline.fs import delete_path
from sales_data_pipeline_spark.streaming.heavy_hitters import (
    _committed_versions,
    _version_path,
)

HLL_SCHEMA = "idx int, rho int"
KEY_STREAM_SCHEMA = "doc_id long, text string"


@dataclass(frozen=True)
class RollingDistinctConfig:
    input_dir: str  # arriving JSONL shards of (doc_id, text)
    sketch_dir: str  # versioned parquet: v=<batch_id>/(idx, rho)
    checkpoint_dir: str
    key_col: str = "doc_id"  # column whose distinct count is tracked
    p: int = 12
    max_files_per_trigger: int | None = None


def read_registers(spark: SparkSession, cfg: RollingDistinctConfig) -> DataFrame:
    """Latest committed register table (empty if no batch has landed)."""
    versions = _committed_versions(spark, cfg.sketch_dir)
    if not versions:
        return spark.createDataFrame([], HLL_SCHEMA)
    return spark.read.parquet(_version_path(cfg.sketch_dir, versions[-1]))


def merge_registers(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-register MAX — the HLL monoid (associative, commutative,
    idempotent)."""
    return (
        a.unionByName(b)
        .groupBy("idx")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def rolling_distinct_estimate(
    spark: SparkSession, cfg: RollingDistinctConfig
) -> float:
    """Current distinct-count estimate from the persisted registers."""
    return float(
        hll_estimate(read_registers(spark, cfg), p=cfg.p).collect()[0].estimate
    )


def run_rolling_distinct(spark: SparkSession, cfg: RollingDistinctConfig) -> None:
    """Drain available input shards (Trigger.AvailableNow), folding each
    micro-batch's partial registers into the persisted table. Same
    versioned-commit protocol as run_heavy_hitters; additionally safe
    because the max-fold is idempotent."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        versions = _committed_versions(spark, cfg.sketch_dir)
        if versions and versions[-1] >= batch_id:
            return  # already folded (see heavy_hitters crash analysis)
        partial = hll_build(batch, cfg.key_col, p=cfg.p)
        merged = merge_registers(read_registers(spark, cfg), partial)
        rows = merged.collect()  # ≤ 2^p rows, bounded by construction
        spark.createDataFrame(rows, HLL_SCHEMA) \
            .coalesce(1).write.mode("overwrite") \
            .parquet(_version_path(cfg.sketch_dir, batch_id))
        for old in versions:
            delete_path(spark, _version_path(cfg.sketch_dir, old), recursive=True)

    reader = (
        spark.readStream.schema(KEY_STREAM_SCHEMA)
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
