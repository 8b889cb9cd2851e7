"""Dimension-maintenance merges — the MERGE/upsert semantics the
reference lacks (its JDBC sink is full-table idempotent overwrite:
/root/reference/src/main/write/database_write.py:8-17 truncate+rewrite).
At 100 TB you cannot rewrite the world per batch; you apply a small
change-batch against a big base.

Both operators are built around ONE broadcast join: a CDC/change batch
is small by definition, so the base table — the 100 TB side — is never
shuffled. ``broadcast_changes=False`` opts out for the rare huge-batch
case (AQE then picks the strategy from runtime sizes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _marker(changes: DataFrame, keys: Sequence[str], broadcast: bool) -> DataFrame:
    m = changes.select(*keys).distinct().withColumn("__matched", F.lit(1))
    return F.broadcast(m) if broadcast else m


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    broadcast_changes: bool = True,
) -> DataFrame:
    """Latest-wins MERGE: change rows replace base rows with the same
    key; unmatched base rows pass through; new keys insert. Columns of
    ``changes`` must match ``base`` by name.

    Plan: one left_anti join of base against the change keys + union —
    the anti join's build side is the broadcast change batch, so base
    streams through map-side with no shuffle anywhere (anti joins are
    insensitive to build-side duplicates, so the keys need no distinct
    aggregation either: the whole merge is shuffle-free)."""
    key_df = changes.select(*keys)
    keep = base.join(
        F.broadcast(key_df) if broadcast_changes else key_df,
        list(keys),
        "left_anti",
    )
    return keep.unionByName(changes)


def scd2_merge(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    version_col: str = "version",
    current_col: str = "is_current",
    base_version: int = 0,
    batch_version: int = 1,
    broadcast_changes: bool = True,
) -> DataFrame:
    """History-keeping (SCD type-2) MERGE: every base row is retained —
    rows superseded by the change batch are closed out
    (``is_current=false``), untouched rows stay current, and every
    change row (update or insert) lands as the current
    ``batch_version``. Deterministic version numbers instead of wall-
    clock validity timestamps keep the result bit-reproducible (the
    caller maps versions to batch timestamps in its own audit table —
    same design as pipeline/state.py's append-only log).

    Plan: one broadcast left join (marker) + union; the 100 TB base is
    read once and never shuffled."""
    tagged = (
        base.join(_marker(changes, keys, broadcast_changes), list(keys), "left")
        .withColumn(version_col, F.lit(base_version).cast("int"))
        .withColumn(current_col, F.col("__matched").isNull())
        .drop("__matched")
    )
    incoming = changes.withColumn(
        version_col, F.lit(batch_version).cast("int")
    ).withColumn(current_col, F.lit(True))
    return tagged.unionByName(incoming)
