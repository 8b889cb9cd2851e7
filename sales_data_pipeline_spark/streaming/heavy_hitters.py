"""Streaming heavy hitters: a count-min sketch maintained across
micro-batches.

The exact streaming answer ("count every token ever seen") needs
unbounded state; the sketch answer needs EXACTLY d×w cells forever —
that is the entire point of a mergeable sketch under streaming: each
micro-batch builds its own partial sketch (operators/sketch.py, one
bounded aggregation) and cell-wise ADDS it into the persisted sketch
table. Merge is associative and commutative, so batch boundaries,
retries within a batch, and arrival order cannot change the converged
cells (duplicate DELIVERY would — upstream exactly-once comes from the
file source's checkpointed offsets, same recipe as streaming/corpus.py).

Crash-retry analysis: the merged sketch for batch N is written to a
TEMPORARY location first, then atomically promoted (overwrite) — a
crash mid-write leaves the previous sketch intact; the retried batch
re-reads it and re-merges the identical partial. The sketch table is
d×w rows, so the rewrite is O(KB) per batch regardless of stream volume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_spark.operators.sketch import countmin_sketch

TOKEN_STREAM_SCHEMA = "doc_id long, text string"


@dataclass(frozen=True)
class HeavyHitterConfig:
    input_dir: str  # arriving JSONL shards of (doc_id, text)
    sketch_dir: str  # parquet: (row, bucket, cnt)
    checkpoint_dir: str
    depth: int = 4
    width: int = 1024
    max_files_per_trigger: int | None = None


def read_sketch(spark: SparkSession, cfg: HeavyHitterConfig) -> DataFrame:
    """Current merged sketch (empty if no batch has landed yet)."""
    try:
        return spark.read.parquet(cfg.sketch_dir)
    except Exception:
        return spark.createDataFrame([], "row int, bucket bigint, cnt bigint")


def merge_sketches(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — the sketch monoid (associative + commutative)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def run_heavy_hitters(spark: SparkSession, cfg: HeavyHitterConfig) -> None:
    """Drain available input shards (Trigger.AvailableNow), folding each
    micro-batch's partial sketch into the persisted one."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        toks = batch.select(F.explode(F.split("text", " ")).alias("tok"))
        partial = countmin_sketch(toks, "tok", depth=cfg.depth, width=cfg.width)
        merged = merge_sketches(read_sketch(spark, cfg), partial)
        # materialize BEFORE overwriting what it reads from (see module
        # docstring; same write-order discipline as streaming/corpus.py)
        rows = merged.collect()  # d×w rows max — bounded by construction
        spark.createDataFrame(rows, "row int, bucket bigint, cnt bigint") \
            .coalesce(1).write.mode("overwrite").parquet(cfg.sketch_dir)

    reader = (
        spark.readStream.schema(TOKEN_STREAM_SCHEMA)
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
