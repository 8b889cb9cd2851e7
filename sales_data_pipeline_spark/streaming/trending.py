"""Trending tokens over event-time windows — the recency-aware
complement to streaming/heavy_hitters.py (whose count-min sketch ranks
ALL-TIME heavy hitters; trending asks "what is hot THIS window").

Shape: token explode (map-only, codegen) → watermarked tumbling-window
count aggregation → APPEND-mode parquet sink. Append mode means a
(window, token) row is emitted exactly once, when the watermark passes
the window end — so the sink holds only FINALIZED windows and re-runs
never rewrite history (same exactly-once recipe as
streaming/events.hourly_event_rollup, which this composes with a
fan-out stage). Top-k per window is deliberately NOT computed in the
stream: ranking needs a window function over completed groups, which
append-mode streaming cannot express before finalization — it runs as
a trivial batch query over the (tiny: windows × vocab) sink table via
``trending_topk``.

State is bounded by the watermark: in-flight (window, token) groups
only — vocab × (watermark/window + 1) rows regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_EVENT_SCHEMA = "doc_id long, ts timestamp, text string"


def windowed_token_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming (window_start, window_end, tok, n) — append-ready."""
    toks = stream.withWatermark(ts_col, watermark).select(
        F.col(ts_col), F.explode(F.split(text_col, " ")).alias("tok")
    )
    return (
        toks.groupBy(F.window(ts_col, window).alias("w"), "tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tok",
            "n",
        )
    )


def run_trending(
    spark: SparkSession,
    input_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain available JSONL shards; finalized windows append to the
    parquet sink exactly once."""
    reader = (
        spark.readStream.schema(TOKEN_EVENT_SCHEMA)
        .option("pathGlobFilter", "*.jsonl")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(input_dir)
    (
        windowed_token_counts(stream, window, watermark)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def trending_topk(spark: SparkSession, sink_dir: str, k: int = 3) -> DataFrame:
    """Top-k tokens per finalized window (count desc, token asc ties) —
    a batch window over the windows×vocab sink table."""
    from pyspark.sql import Window

    df = spark.read.parquet(sink_dir)
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), F.asc("tok"))
    return (
        df.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("window_start", "window_end", "tok", "n", "rank")
    )
