"""Table catalog over the parquet star schema.

The reference hand-rolls its inputs (boto3 list/download + per-file CSV
reads, reference: src/main/read/aws_read.py:7-23); here the catalog is a
thin typed registry: one ``spark.read.parquet`` relation per table, all
registered as temp views so both the DataFrame and ``spark.sql`` surfaces
see the same names. Scans stay lazy — Catalyst prunes columns and pushes
predicates into the parquet reader per-query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Driver-provided TPC-H-ish star schema + events stream table +
# LLM-data-pipeline tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough to broadcast in joins at any realistic scale factor
# (regions/nations are bounded domains; supplier here is tiny). customer
# and part grow with SF — never force-broadcast those.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet relation for one table (types normalized)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # must hold even on a caller-built session (the driver makes its
        # own); runtime-settable SQL conf, so set it at read time too
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk, surfaced as long nanos via
        # nanosAsLong (session.py); truncate to micros — the same thing
        # DuckDB/Arrow do when narrowing ns → us.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """All tables as a dict; optionally registered as temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
