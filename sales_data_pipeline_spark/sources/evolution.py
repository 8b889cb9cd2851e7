"""Schema-evolution parquet reads under an explicit contract.

A 100 TB dataset is never written by one schema version: columns get
added, widened, and (wrongly) narrowed across years of files. Spark's
``mergeSchema`` unions the file schemas but leaves the result at the
mercy of whatever landed on disk; this module puts a CONTRACT on top —
the reference repo's CSV schema-contract discipline
(src/main/utility — explicit StructType, reject-don't-guess), applied
to the parquet-evolution problem it never had to face.

Rules (each tested):
- missing contract column in old files → typed NULL after the merge
  (mergeSchema already yields this; the contract pins the TYPE);
- on-disk type differs from contract → cast ONLY if lossless-widening
  (int→bigint, float→double, int→double, any→string per explicit
  allowlist); anything else raises at PLAN time with the column named
  — silent narrowing (bigint file read through an int contract) is
  data corruption, not evolution;
- extra on-disk columns → dropped (the contract IS the projection;
  column pruning still reaches the scan);
- order/case: contract order wins, matching is case-sensitive like
  the rest of this codebase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lossless widenings we perform silently (source type -> allowed targets)
_WIDENINGS: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType, T.DoubleType, T.StringType),
    T.ShortType: (T.IntegerType, T.LongType, T.DoubleType, T.StringType),
    T.IntegerType: (T.LongType, T.DoubleType, T.StringType),
    T.LongType: (T.StringType,),
    T.FloatType: (T.DoubleType, T.StringType),
    T.DoubleType: (T.StringType,),
    T.DateType: (T.TimestampType, T.StringType),
}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    return isinstance(dst, _WIDENINGS.get(type(src), ()))


def read_parquet_evolved(
    spark: SparkSession, path: str, contract: T.StructType
) -> DataFrame:
    """Merge-schema read of ``path`` aligned to ``contract`` (see
    module docstring for the rules). Raises ValueError naming every
    offending column before any job runs."""
    raw = spark.read.option("mergeSchema", "true").parquet(path)
    on_disk = {f.name: f.dataType for f in raw.schema.fields}
    problems: list[str] = []
    cols = []
    for field in contract.fields:
        if field.name not in on_disk:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        src = on_disk[field.name]
        if src == field.dataType:
            cols.append(F.col(field.name))
        elif _can_widen(src, field.dataType):
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            problems.append(
                f"{field.name}: on-disk {src.simpleString()} cannot be "
                f"losslessly read as contract {field.dataType.simpleString()}"
            )
    if problems:
        raise ValueError(
            "schema evolution contract violation (narrowing is corruption, "
            "not evolution): " + "; ".join(problems)
        )
    return raw.select(*cols)
