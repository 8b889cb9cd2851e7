"""Binary-file source for multimodal payload ingestion.

The multimodal operators (operators/multimodal.py) expect media as
opaque ``binary`` columns with typed metadata — but the reference
pipeline's ingestion surface is file-shaped (S3 prefixes of CSVs,
SURVEY §2a). This closes the gap for media: ingest a directory/prefix
of raw media files (images, audio, arbitrary blobs) AS a DataFrame
using Spark's built-in ``binaryFile`` format — distributed listing +
read, no driver-side file loop, no Python I/O. Each file becomes one
row: (path, modificationTime, length, content BINARY).

Scale notes (100 TB of media):
- ``pathGlobFilter`` pushes the extension filter into the FILE LISTING
  (files that don't match are never opened — cheaper than reading
  then filtering);
- one file = one row = one task unit; Spark packs small files into
  shared tasks via ``maxPartitionBytes``/``openCostInBytes``, so
  millions of thumbnails don't become millions of tasks — but a
  single 50 GB video is still ONE row that must fit in executor
  memory. ``max_bytes`` guards against that: oversized files are
  dropped to a quarantine-style listing instead of OOMing the stage
  (length is metadata — the filter prunes BEFORE content is read);
- recursiveFileLookup walks nested prefixes (dataset shards usually
  nest by date/source).

The decode step stays in operators/multimodal.py (Arrow-batched
mapInPandas over the ``content`` column); this module only lands
bytes + metadata into the engine's data model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read a prefix of raw files as (path, mod_time, length, content).

    ``glob`` e.g. ``*.wav`` filters at listing time; ``max_bytes``
    drops files whose DECLARED length exceeds the bound (metadata
    filter — oversized payloads are never materialized)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path).select(
        F.col("path"),
        F.col("modificationTime").alias("mod_time"),
        F.col("length"),
        F.col("content"),
    )
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def oversized_listing(
    spark: SparkSession,
    path: str,
    max_bytes: int,
    glob: str | None = None,
) -> DataFrame:
    """The complement of ``read_binary_files(max_bytes=...)``: paths
    whose length exceeds the bound, WITHOUT reading their content —
    the quarantine report for media too large to process in-row.
    (Spark reads binaryFile content lazily per-column; selecting only
    metadata columns never loads the bytes.)"""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.option("recursiveFileLookup", "true").load(path)
    return df.filter(F.col("length") > max_bytes).select(
        "path", F.col("modificationTime").alias("mod_time"), "length"
    )
