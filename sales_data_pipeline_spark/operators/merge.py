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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Keyed diff of two snapshots of the same table — the CDC census
    that answers "what changed between yesterday's and today's load":
    every key classified as ``added`` / ``removed`` / ``changed`` /
    ``unchanged``, with the exact list of differing columns (NULL-safe
    comparison, so NULL→value and value→NULL both count as changes).

    Output: keys, ``status``, ``changed_cols`` (comma-joined in
    ``compare_cols`` order), and ``{c}_old`` / ``{c}_new`` for every
    compared column (the CDC payload downstream appliers need).

    Plan: ONE full-outer shuffle join on the key — unavoidable, since
    adds and removes both require the unmatched sides. At 100 TB the
    two snapshots are successive loads of the same table: store them
    bucketed by the key and the exchange disappears entirely
    (operators/scale.py bucketed-join pattern); the classification
    itself is pure post-join expression work."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys and c in old.columns]
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, list(keys), "full_outer")
    diffs = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        status.alias("status"),
        F.when(status == "changed", F.concat_ws(",", diffs))
        .otherwise(F.lit(""))
        .alias("changed_cols"),
        *[F.col(f"__o_{c}").alias(f"{c}_old") for c in compare_cols],
        *[F.col(f"__n_{c}").alias(f"{c}_new") for c in compare_cols],
    )
    return out if include_unchanged else out.filter(F.col("status") != "unchanged")


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


def apply_cdc_log(
    base: DataFrame,
    log: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    version_cols: Sequence[str] = ("version",),
    broadcast_log: bool = True,
) -> DataFrame:
    """Apply an ordered change-data-capture log (op ∈ {I,U,D}) onto a
    base snapshot: per key, the HIGHEST-version log row wins — I/U
    upsert the row's payload, D deletes the key; keys absent from the
    log pass through untouched. This is the replication-consumer half
    of the CDC story (snapshot_diff PRODUCES such a log; scd2_merge
    keeps history instead of collapsing it).

    Semantics pinned deliberately:
    - version_cols must form a TOTAL order per key (ts alone is not —
      pass (ts, change_id)); max_by over a version struct picks the
      winner in one aggregation, no window sort;
    - a D followed by a later I resurrects the key (only the FINAL op
      matters — intermediate history collapses, which is exactly what
      "apply the log" means for a snapshot consumer);
    - payload columns of ``log`` must match ``base`` by name (D rows
      may carry nulls — the payload is never read for deletes).

    Plan: the log collapses to one row per touched key via a keyed
    max_by aggregation (map-side combinable); the collapsed set —
    small relative to base in any realistic CDC batch — broadcasts
    into one anti join (evict touched keys from base) + one union of
    the surviving upserts. Base itself never shuffles, the merge_upsert
    contract."""
    payload = [c for c in base.columns]
    # Column-API max_by (never SQL-text interpolation of names: a
    # payload column like `order value` or `from` would break or
    # misparse an F.expr string)
    value_struct = F.struct(
        *[F.col(op_col)],
        *[F.col(c) for c in payload if c not in keys],
    )
    ver_struct = F.struct(*[F.col(c) for c in version_cols])
    collapsed = (
        log.groupBy(*keys)
        .agg(F.max_by(value_struct, ver_struct).alias("__win"))
        .select(*keys, "__win.*")
    )
    finals = collapsed.filter(F.col(op_col) != "D").select(*payload)
    touched = collapsed.select(*keys)
    keep = base.join(
        F.broadcast(touched) if broadcast_log else touched,
        list(keys),
        "left_anti",
    )
    return keep.unionByName(finals)


def incremental_agg_refresh(
    old_agg: DataFrame,
    delta_rows: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str | None = None,
    drop_empty: bool = True,
    broadcast_delta: bool = True,
    new_keys: bool = True,
) -> DataFrame:
    """Materialized-aggregate maintenance: fold a (small) batch of new
    fact rows into an existing grouped-SUM aggregate WITHOUT
    recomputing it — the incremental-view-maintenance move that turns
    "rebuild the 100 TB mart nightly" into "merge tonight's partition".
    Works for any commutative-monoid measures (SUM/COUNT here);
    RETRACTIONS are just negative delta rows (a correction batch
    subtracts), which plain re-aggregation cannot express without a
    full rebuild.

    Plan (the apply_cdc_log discipline): the delta collapses to one
    row per touched key (map-side combinable), then the OLD
    AGGREGATE'S ROWS NEVER SHUFFLE — touched groups update via a
    broadcast LEFT join (measure = old + delta), untouched groups
    stream through unchanged, and delta-only keys append via an anti
    join of the tiny delta against the old KEY PROJECTION (the old
    side is NOT broadcast there — collecting a 10⁸-group mart's keys
    to the driver is exactly the inversion the small-side contract
    forbids; the anti join shuffles pruned keys only, and AQE picks
    the strategy. Pass ``new_keys=False`` when the delta is known to
    touch only existing groups — e.g. a late-data correction batch —
    and that probe disappears entirely).

    ``count_col``: if the column EXISTS in ``delta_rows`` it is SUMMED
    (so retraction batches carry explicit ±counts, e.g. −1 per
    retracted row); otherwise each delta row counts +1. With
    ``drop_empty`` a group whose count reaches 0 disappears — the
    retraction-to-deletion rule. Exactness: decimal/integer measures
    stay exact under + (the engine's money convention); do NOT use
    this for non-monoid measures (avg must be carried as sum+count)."""
    if not sum_cols and count_col is None:
        raise ValueError("nothing to maintain: no sum_cols, no count_col")
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_col is not None:
        if count_col in delta_rows.columns:
            aggs.append(F.sum(count_col).cast("bigint").alias(count_col))
        else:
            aggs.append(F.count(F.lit(1)).cast("bigint").alias(count_col))
    d = delta_rows.groupBy(*keys).agg(*aggs)
    d_b = F.broadcast(d) if broadcast_delta else d
    measures = list(sum_cols) + ([count_col] if count_col else [])
    d_renamed = d_b.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in measures]
    )
    updated = old_agg.join(d_renamed, list(keys), "left").select(
        *keys,
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
            for c in measures
        ],
    )
    if new_keys:
        fresh = d.join(
            old_agg.select(*keys), list(keys), "left_anti"
        ).select(*keys, *measures)
        out = updated.unionByName(fresh)
    else:
        out = updated
    if count_col is not None and drop_empty:
        out = out.filter(F.col(count_col) != 0)
    return out
