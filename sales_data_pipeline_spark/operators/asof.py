"""As-of (most-recent-prior) join — an operator Spark's DataFrame API
lacks, composed from built-ins (SURVEY §2c notes the reference has no
range/as-of joins; this is the standard extension a time-series /
event-enrichment workload needs).

Semantics (matching DuckDB/kdb ASOF JOIN, strictly-prior variant
configurable): for each left row, attach the single right row with the
largest right timestamp ≤ (or <) the left timestamp, within the same
equi-key group. Null right columns when no prior right row exists
(LEFT ASOF JOIN).

Plan shape — ONE shuffle, no UDF, no per-key iteration:
  union(tagged left, tagged right)
  → window last_value(right payload) IGNORE NULLS
      over (partition by key order by ts, side rows unbounded preceding..current)
  → keep left rows.
The window sort co-sorts both sides once; cost is O(n log n) per key
group, the same as the sort-merge join Spark would run for an equality
join on (key). Skewed keys split via AQE or a coarse time-bucket salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """LEFT ASOF join: latest right row with right_ts ≤ left_ts per key.

    ``strict=True`` uses right_ts < left_ts (excludes simultaneous
    rows). Right payload columns come back as ``{col}{suffix}`` plus
    ``{right_ts}{suffix}``. Ties on right_ts resolve to the row that
    sorts last on the payload struct (deterministic)."""
    # side flag orders right rows before left rows at equal timestamps
    # for the non-strict variant (so an equal-ts right row IS visible),
    # and after them for strict (so it is NOT).
    right_rank = 0 if not strict else 2
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(right_rank).alias("__side"),
        payload.alias("__p"),
        F.lit(None).cast("long").alias("__rowid"),
    )
    l_cols = [F.col(c) for c in left.columns]
    lf = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.monotonically_increasing_id().alias("__rowid"),
        *l_cols,
    )
    merged = r.select(
        "__k", "__t", "__side", "__p", "__rowid",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    ).unionByName(lf)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"), F.col("__p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = matched.filter(F.col("__rowid").isNotNull()).select(
        *left.columns,
        F.col("__last.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__last.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
