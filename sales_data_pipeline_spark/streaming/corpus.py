"""Streaming corpus curation: exactly-once incremental dedup.

The batch operator (operators/dedup.incremental_dedup) dedups a NEW
batch against a fingerprint index; this module runs that loop under
Structured Streaming so a continuously-arriving corpus (crawl shards
landing in a directory) is curated exactly once per document:

- the file source's checkpointed offset log gives each shard
  exactly-once processing across runs and crashes (same recipe as
  streaming/incremental.py — no side-channel state database);
- foreachBatch dedups the micro-batch against the on-disk fingerprint
  index, lands the survivors under their batch's own partition, and
  appends their fingerprints to the index — the index is the only
  state, and it is 16 bytes/doc, not the corpus.

Crash-retry analysis (the write ORDER matters):
  survivors are materialized (persist + count) BEFORE any write — the
  two writes must not recompute the plan, because the second would
  re-read an index that already contains this batch's fingerprints and
  silently produce nothing. Then:
  1. curated docs go to ``ingest_batch=<batch id>`` with dynamic
     partition overwrite — a retried batch overwrites its own output,
     never duplicating it;
  2. fingerprints append AFTER. Crash between 1 and 2 → the retry
     recomputes identical survivors (index unchanged) and overwrites
     the same partition. Crash after 2 → the retry finds its own
     fingerprints in the index, survivors come back empty, and the
     early return leaves the already-written partition intact.
  Either way the curated store converges to exactly-once; duplicate
  fingerprint rows in the index are harmless (anti-join semantics).

At 100 TB the index join is the only shuffle, keyed by fingerprint;
bucket the index table by ``fp`` to make batch ingestion shuffle only
the batch (see incremental_dedup's docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_spark.operators.dedup import incremental_dedup
from sales_data_pipeline_spark.operators.text import fingerprint

DOC_SCHEMA = "doc_id long, text string"


@dataclass(frozen=True)
class CorpusStreamConfig:
    input_dir: str  # arriving JSONL shards of (doc_id, text)
    curated_dir: str  # parquet, partitioned by ingest_batch
    index_dir: str  # parquet: one `fp` column
    checkpoint_dir: str
    max_files_per_trigger: int | None = None


def _index(spark: SparkSession, cfg: CorpusStreamConfig) -> DataFrame:
    try:
        return spark.read.parquet(cfg.index_dir)
    except Exception:  # first batch: no index yet
        return spark.createDataFrame([], "fp string")


def read_curated(spark: SparkSession, cfg: CorpusStreamConfig) -> DataFrame:
    return (
        spark.read.option("basePath", cfg.curated_dir)
        .parquet(cfg.curated_dir)
        .drop("ingest_batch")
    )


def run_corpus_stream(spark: SparkSession, cfg: CorpusStreamConfig) -> None:
    """Process all currently-available shards (availableNow trigger) and
    stop — the cron-style incremental invocation. Long-running services
    drop the trigger for continuous processing."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    stream = reader.json(cfg.input_dir)

    def _process(batch: DataFrame, batch_id: int) -> None:
        survivors = incremental_dedup(batch, _index(spark, cfg)).persist()
        try:
            if survivors.count() == 0:
                return
            (
                survivors.withColumn("ingest_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(cfg.curated_dir)
            )
            survivors.select(fingerprint("text").alias("fp")).distinct().write.mode(
                "append"
            ).parquet(cfg.index_dir)
        finally:
            survivors.unpersist()

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
