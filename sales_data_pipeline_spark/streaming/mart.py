"""Streaming mart maintenance — the streaming face of
operators/incremental.py.

A continuously-maintained aggregate mart over an event stream should
NOT live in the streaming state store: the mart must be queryable by
outside readers between micro-batches, survive a checkpoint wipe, and
hold exact (decimal/bigint) measures. The right shape is
``foreachBatch``: each micro-batch is aggregated alone (one pass over
delta-sized data) and folded into the externally-stored mart with
``merge_partial_aggregates`` — mart-cardinality work per batch, never a
re-scan of history.

Two failure modes are handled structurally:

- **Replayed batches.** foreachBatch is at-least-once: after a crash
  the engine re-runs the last batch with the SAME batch_id. The fold is
  additive, so re-applying a batch would double-count. Each applied
  batch therefore publishes the whole folded mart as an immutable
  versioned directory ``<mart>/b{batch_id}``; a replay of an
  already-published id is detected by existence and skipped — the
  publish itself is the idempotency ledger, no side meta-file to drift.
- **Torn writes.** The new version is written to ``_staging_b{id}``
  and moved into place with one FS rename (the same staging-swap
  contract as sources/jdbc.write_jdbc_atomic); readers resolve the
  latest COMMITTED version (max b-dir) and never see a half-written
  mart. Stale staging debris from a crash is overwritten on replay.

Retention keeps the trailing ``keep_versions`` marts (time travel for
reconciliation — q256-style fingerprint checks between versions) and
prunes the rest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from sales_data_pipeline_spark.operators.incremental import (
    aggregate_partial,
    merge_partial_aggregates,
)
from sales_data_pipeline_spark.pipeline.fs import delete_path, path_exists


def _versions(spark: SparkSession, mart_path: str) -> list[int]:
    from sales_data_pipeline_spark.pipeline.fs import _fs

    jvm, fs, p = _fs(spark, mart_path)
    if not fs.exists(p):
        return []
    out = []
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("b") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def read_mart(spark: SparkSession, mart_path: str) -> DataFrame | None:
    """Latest committed mart version, or None before the first batch."""
    versions = _versions(spark, mart_path)
    if not versions:
        return None
    return spark.read.parquet(f"{mart_path}/b{versions[-1]}")


def apply_mart_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    mart_path: str,
    keys: Sequence[str],
    measures: dict[str, object],
    keep_versions: int = 3,
) -> bool:
    """Fold one micro-batch into the external mart. Returns False when
    the batch_id was already published (crash replay) — the skip that
    makes the at-least-once engine exactly-once at the mart."""
    from sales_data_pipeline_spark.pipeline.fs import _fs

    final = f"{mart_path}/b{batch_id}"
    if path_exists(spark, final):
        return False
    partial = aggregate_partial(batch_df, keys, measures)
    prev = read_mart(spark, mart_path)
    mart = (
        partial
        if prev is None
        else merge_partial_aggregates([prev, partial], keys)
    )
    staging = f"{mart_path}/_staging_b{batch_id}"
    mart.write.mode("overwrite").parquet(staging)
    jvm, fs, staging_p = _fs(spark, staging)
    if not bool(fs.rename(staging_p, jvm.org.apache.hadoop.fs.Path(final))):
        # Hadoop rename signals failure by returning false (missing dest
        # parent, a concurrent replay that created `final` between the
        # path_exists probe and this rename, checksum-FS quirks). The
        # batch was NOT published: clean staging, keep old versions, and
        # either defer to the concurrent winner or surface the failure —
        # never count the batch as applied.
        delete_path(spark, staging, recursive=True)
        if path_exists(spark, final):
            return False
        raise RuntimeError(f"mart publish rename failed: {staging} -> {final}")
    for v in _versions(spark, mart_path)[:-keep_versions] if keep_versions else []:
        delete_path(spark, f"{mart_path}/b{v}", recursive=True)
    return True


def mart_maintainer(
    mart_path: str,
    keys: Sequence[str],
    measures: dict[str, object],
    keep_versions: int = 3,
):
    """The ``foreachBatch`` callable: wire as
    ``stream.writeStream.foreachBatch(mart_maintainer(...))``."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_mart_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            mart_path,
            keys,
            measures,
            keep_versions=keep_versions,
        )

    return _apply
