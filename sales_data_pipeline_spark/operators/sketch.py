"""Mergeable sketches as DataFrame programs.

A sketch is the scale answer when the exact structure (a full token
count table, a distinct set) is itself too big to shuffle: bounded
memory, one pass, and — the property that matters on a cluster —
MERGEABLE: per-partition sketches combine associatively, so Spark's
partial aggregation builds them map-side and the shuffle carries only
d×w cells, independent of data size.

The hash family here is md5-derived (first 13 hex digits → 52-bit int,
mod width) — deliberately engine-portable so a SQL oracle can rebuild
the identical sketch; swap xxhash64(seed) in production for ~10× hash
throughput (same plan, same guarantees).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row`` hash bucket of a string column (md5-based, portable)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), col)), 1, 13), 16, 10
    ).cast("bigint")
    return (h % width).alias(f"b{row}")


def countmin_sketch(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005, public
    algorithm) over a (possibly weighted) item stream: ``depth`` hash
    rows × ``width`` buckets, cell = total count of items hashing
    there. Returns (row, bucket, cnt) — the sparse sketch (absent cell
    = 0). ONE aggregation: the explode to ``depth`` rows happens
    map-side and partial aggregation collapses each partition to at
    most d×w cells before the shuffle, so shuffle volume is bounded by
    d×w×partitions regardless of item count — the whole point at
    100 TB, where an exact token-count table would itself be TB-scale."""
    c = F.col(item_col)
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    pairs = items.select(
        F.posexplode(
            F.array(*[_cm_bucket(c, r, width) for r in range(depth)])
        ).alias("row", "bucket"),
        w.alias("__w"),
    )
    return pairs.groupBy("row", "bucket").agg(F.sum("__w").alias("cnt"))


def countmin_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each query item's count from the sketch:
    min over rows of the addressed cells (classic CM guarantee:
    estimate ≥ true count; overcount ≤ εN with prob 1−δ for
    w = e/ε, d = ln 1/δ). The sketch side is d×w rows at most —
    broadcast it; the lookup is then a map-side join however many
    query items arrive."""
    c = F.col(item_col)
    addressed = queries.select(
        c,
        F.posexplode(
            F.array(*[_cm_bucket(c, r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    joined = addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est"))
    )
