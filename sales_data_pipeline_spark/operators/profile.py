"""Table profiling: the one-pass data-quality scorecard (null counts,
distinct cardinalities, value ranges per column).

The reference validates its inputs implicitly (schema contract +
quarantine on column-count mismatch, reference:
src/main/transformations/main.py's less/extra-column branches); a real
lake pipeline profiles every load and alerts on drift. This is the
Deequ/`ANALYZE TABLE`-shaped primitive, expressed as ONE aggregation
job over the table.

Scale notes: with ``exact_distinct=True`` Spark plans the multiple
COUNT(DISTINCT) via a single Expand — each input row is replicated
(#distinct-aggs + 1)× map-side with a grouping id, still one pass over
the data and one shuffle round, but the expansion factor is the column
count. That is the honest price of exact cardinalities and it is fine
for scheduled profiling; at 100 TB interactive use flip
``exact_distinct=False`` and every column's cardinality comes from an
HLL±5% partial in one non-expanded pass (the catalog query keeps exact
so DuckDB can hash-match it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile in long form: (col_name, n_rows, n_null,
    n_distinct, min_val, max_val), one output row per profiled column.

    ``n_distinct`` excludes NULLs (SQL COUNT(DISTINCT) semantics);
    ``min_val``/``max_val`` are computed in the column's native type
    (so numeric order, not lexicographic) and cast to string only for
    the uniform output schema. Callers profiling float/timestamp
    columns who need engine-portable strings should pre-cast to
    decimal / second-truncated timestamps (float-to-string and
    sub-second formats differ across engines).

    Plan: ONE df.agg(...) — every metric is a partial-aggregating
    expression, so the table is scanned once; the long-form pivot is a
    map-only inline() over the single result row."""
    cols = list(cols if cols is not None else df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        col = F.col(c)
        nd = F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)
        aggs += [
            F.coalesce(F.sum(col.isNull().cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias(f"__null_{c}"),
            nd.cast("bigint").alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return row.select(F.inline(structs))
