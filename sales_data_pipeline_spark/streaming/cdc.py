"""Streaming CDC consumer: maintain a queryable snapshot from a change
stream.

The batch operator ``operators/merge.py apply_cdc_log`` folds one change
batch onto one snapshot; this module runs that fold CONTINUOUSLY over an
arriving change stream (parquet shards of I/U/D rows), keeping a
materialized snapshot that downstream batch queries read at any time —
the replication-consumer topology (Debezium-style source → snapshot
table) the reference's A/I staging machine is a degenerate single-table
case of (SURVEY §2a S14).

Exactly-once contract (the heavy_hitters versioned-commit pattern,
streaming/heavy_hitters.py): batch N writes the NEW snapshot to its own
immutable path ``snapshot_dir/v=<N>``; a version counts as committed
only once its parquet ``_SUCCESS`` marker exists. On a foreachBatch
retry the fold is SKIPPED when the latest committed version already
covers the redelivered batch_id — re-applying the same change batch to
a snapshot that already absorbed it would double nothing here
(latest-wins is idempotent per key), but skipping keeps the version
chain linear and the write path crash-safe either way. Old versions are
pruned beyond ``keep_versions`` (time-travel window for free).

Scale: per batch ONE apply_cdc_log plan — the snapshot side never
shuffles (plan-asserted in the batch tests); the rewrite cost is a full
snapshot copy per batch, the honest cost of a parquet-backed snapshot
(a table format with row-level MERGE would amortize it; parquet is what
this sandbox has — the versioned layout is exactly what Delta/Iceberg
do underneath).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from sales_data_pipeline_spark.operators.merge import apply_cdc_log

_VERSION_PREFIX = "v="

CDC_STREAM_SCHEMA = (
    "k long, op string, v double, ver bigint, seq bigint"
)


@dataclass(frozen=True)
class CdcConfig:
    input_dir: str  # arriving parquet shards of CDC_STREAM_SCHEMA rows
    snapshot_dir: str  # versioned parquet: v=<batch_id>/<snapshot rows>
    checkpoint_dir: str
    keep_versions: int = 3
    max_files_per_trigger: int | None = None


def _committed_versions(spark: SparkSession, root_dir: str) -> list[int]:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(root_dir)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return []
    versions = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(_VERSION_PREFIX)):
            continue
        try:
            v = int(name[len(_VERSION_PREFIX):])
        except ValueError:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        if fs.exists(marker):
            versions.append(v)
    return sorted(versions)


def _version_path(root_dir: str, batch_id: int) -> str:
    return f"{root_dir}/{_VERSION_PREFIX}{batch_id}"


def read_snapshot(
    spark: SparkSession,
    cfg: CdcConfig,
    base: DataFrame | None = None,
    version: int | None = None,
) -> DataFrame:
    """Latest committed snapshot (the seed ``base`` — or empty — before
    any batch commits). ``version`` time-travels to a specific still-
    retained committed version (the keep_versions window) — the
    as-of-batch read Delta/Iceberg expose as VERSION AS OF."""
    versions = _committed_versions(spark, cfg.snapshot_dir)
    if version is not None:
        if version not in versions:
            raise ValueError(
                f"version {version} not committed/retained; have {versions}"
            )
        return spark.read.parquet(_version_path(cfg.snapshot_dir, version))
    if not versions:
        if base is not None:
            return base
        return spark.createDataFrame([], "k long, v double")
    return spark.read.parquet(_version_path(cfg.snapshot_dir, versions[-1]))


def run_cdc_consumer(
    spark: SparkSession, cfg: CdcConfig, base: DataFrame
) -> None:
    """Drain available change shards (Trigger.AvailableNow), folding
    each micro-batch onto the persisted snapshot via apply_cdc_log."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        versions = _committed_versions(spark, cfg.snapshot_dir)
        if versions and versions[-1] >= batch_id:
            # already-folded batch (foreachBatch retry, or a checkpoint
            # reset replaying the same change shards from scratch).
            # Same DETERMINISTIC-REPLAY contract as heavy_hitters: skip
            # is decided by batch id alone, which is only safe because
            # a reset checkpoint over the same input dir re-delivers
            # the same files in the same order under the same trigger
            # sizing — batch N carries exactly the data already folded
            # into v=N, and genuinely NEW shards land in later batches
            # with ids past the committed head. Do not change
            # max_files_per_trigger when restarting from a wiped
            # checkpoint against a retained snapshot.
            return
        current = read_snapshot(spark, cfg, base)
        new = apply_cdc_log(
            current,
            batch.select("k", "op", "v", "ver", "seq"),
            keys=["k"],
            op_col="op",
            version_cols=("ver", "seq"),
        )
        new.write.mode("overwrite").parquet(
            _version_path(cfg.snapshot_dir, batch_id)
        )
        # prune old committed versions beyond the retention window
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        for old in _committed_versions(spark, cfg.snapshot_dir)[
            : -cfg.keep_versions
        ]:
            p = jvm.org.apache.hadoop.fs.Path(
                _version_path(cfg.snapshot_dir, old)
            )
            p.getFileSystem(conf).delete(p, True)

    reader = (
        spark.readStream.schema(CDC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
    )
    if cfg.max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", cfg.max_files_per_trigger
        )
    stream = reader.parquet(cfg.input_dir)
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
