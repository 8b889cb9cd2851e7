"""XML source/sink (Spark's built-in `xml` format, native since 4.0 —
the spark-xml package folded into core).

Extends the engine's source surface beyond the reference's CSV/JDBC
(SURVEY §2a): B2B feeds and legacy exports still arrive as XML, and the
native reader keeps parsing JVM-side (no Python row handling), supports
explicit schemas (same contract-first discipline as sources/csv.py — no
inferSchema double scan when the contract is known), and predicate/
column pruning downstream of the parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read XML documents; each ``row_tag`` element becomes a row.
    Pass ``schema`` (DDL string) for the contract-first single pass —
    omitting it costs an inference scan, exactly like CSV."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str,
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as XML (one ``row_tag`` element per row under
    ``root_tag`` per file). Same parallel-writer semantics as any
    columnar sink — one file per partition."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )
