"""Round-7 ADVICE fixes, each pinned by a covering test:

1. streaming/mart.py apply_mart_batch checks the Hadoop rename result —
   a failed publish raises (or defers to a concurrent winner) instead of
   silently counting the batch and running retention.
2. pipeline/export.py fingerprints the STAGED parquet, so the sealed
   manifest describes the published bytes even for a nondeterministic
   input DataFrame.
3. q283's noise boolean is an independent theorem (noise has no core
   ε-neighbor, via eps_pairs anti-probe), not a contrapositive replica.
4. q270 treats empty / whitespace-only documents as trivially lossless
   and its oracle counts words from the trimmed split.
5. q276 exports to a per-process path — concurrent same-SF runs cannot
   race on one directory.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _mart_measures():
    return {
        "n_events": F.count(F.lit(1)).cast("bigint"),
        "total": F.sum(F.col("value").cast("decimal(12,2)")),
    }


# ---------------------------------------------------------------------------
# 1. mart publish rename failure
# ---------------------------------------------------------------------------


class _RenameIntercept:
    """Wraps the JVM FileSystem: rename runs a hook, everything else
    delegates (delete/exists/listStatus keep working mid-test)."""

    def __init__(self, fs, hook):
        self._fs = fs
        self._hook = hook

    def rename(self, src, dst):
        return self._hook(self._fs, src, dst)

    def __getattr__(self, name):
        return getattr(self._fs, name)


def _patch_fs(monkeypatch, hook):
    from sales_data_pipeline_spark.pipeline import fs as fsmod

    real = fsmod._fs

    def fake(spark_, path):
        jvm, fs, p = real(spark_, path)
        return jvm, _RenameIntercept(fs, hook), p

    monkeypatch.setattr(fsmod, "_fs", fake)


def test_mart_publish_rename_failure_raises_and_keeps_state(
    spark, tmp_path, monkeypatch
):
    from sales_data_pipeline_spark.pipeline.fs import path_exists
    from sales_data_pipeline_spark.streaming.mart import _versions, apply_mart_batch

    mart_path = str(tmp_path / "mart")
    batch = spark.createDataFrame(
        [("click", 1.0), ("view", 2.0)], "event_type string, value double"
    )
    assert apply_mart_batch(spark, batch, 0, mart_path, ["event_type"], _mart_measures())

    _patch_fs(monkeypatch, lambda fs, s, d: False)
    with pytest.raises(RuntimeError, match="rename failed"):
        apply_mart_batch(
            spark, batch, 1, mart_path, ["event_type"], _mart_measures(), keep_versions=1
        )
    monkeypatch.undo()
    # the failed batch was NOT counted: b0 survives (retention never ran),
    # no b1 exists, and the staging debris was cleared
    assert _versions(spark, mart_path) == [0]
    assert not path_exists(spark, f"{mart_path}/_staging_b1")
    # a healthy retry then publishes normally
    assert apply_mart_batch(spark, batch, 1, mart_path, ["event_type"], _mart_measures())
    assert _versions(spark, mart_path) == [0, 1]


def test_mart_publish_lost_race_defers_to_winner(spark, tmp_path, monkeypatch):
    """rename=false because a concurrent replay created `final` between
    the path_exists probe and the rename: the loser returns False (batch
    already published) instead of raising or double-counting."""
    from sales_data_pipeline_spark.streaming.mart import _versions, apply_mart_batch

    mart_path = str(tmp_path / "mart")
    batch = spark.createDataFrame([("click", 1.0)], "event_type string, value double")
    assert apply_mart_batch(spark, batch, 0, mart_path, ["event_type"], _mart_measures())

    def lose_race(fs, src, dst):
        fs.mkdirs(dst)  # the concurrent winner publishes first
        return False

    _patch_fs(monkeypatch, lose_race)
    assert (
        apply_mart_batch(spark, batch, 1, mart_path, ["event_type"], _mart_measures())
        is False
    )
    monkeypatch.undo()
    assert _versions(spark, mart_path) == [0, 1]


# ---------------------------------------------------------------------------
# 2. export manifest fingerprints describe the published bytes
# ---------------------------------------------------------------------------


def test_export_manifest_matches_published_for_nondeterministic_input(
    spark, tmp_path
):
    """uuid() re-evaluates differently per job: a manifest computed by
    re-running the input df would disagree with the published shards;
    fingerprinting the staged parquet must keep them in lockstep."""
    from sales_data_pipeline_spark.pipeline.export import (
        verify_export,
        write_training_shards,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), F.expr("uuid()").alias("payload")
    )
    out = str(tmp_path / "export_nondet")
    man = write_training_shards(spark, df, out, n_shards=4)
    assert man["total_rows"] == 200
    checks = verify_export(spark, out).collect()
    assert len(checks) == 4
    assert all(r.rows_match and r.fp_match for r in checks), checks


# ---------------------------------------------------------------------------
# 3. q283's independent noise theorem (eps_pairs probe)
# ---------------------------------------------------------------------------


def _pts_df(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id bigint, vec array<double>",
    )


def test_eps_pairs_matches_brute_force_and_handles_empty_left(spark):
    import random

    from sales_data_pipeline_spark.operators.dbscan import eps_pairs

    rnd = random.Random(7)
    pts = {i: (rnd.uniform(0, 1), rnd.uniform(0, 1)) for i in range(40)}
    eps = 0.22
    want = {
        (a, b)
        for a in pts
        for b in pts
        if round(sum((x - y) ** 2 for x, y in zip(pts[a], pts[b])), 9) <= eps * eps
    }
    df = _pts_df(spark, pts)
    got = {
        (r.a_id, r.b_id)
        for r in eps_pairs(df, df, eps=eps, dims=2).collect()
    }
    assert got == want
    empty = df.filter(F.lit(False))
    assert eps_pairs(empty, df, eps=eps, dims=2).count() == 0


def test_q283_noise_probe_catches_missed_border_attachment(spark):
    """The defect class the old contrapositive boolean was blind to: a
    border point mislabeled as noise. The eps_pairs(noise, core) probe
    must light up for the planted defect and stay dark for true noise."""
    from sales_data_pipeline_spark.operators.dbscan import dbscan, eps_pairs

    # dense blob of cores around the origin, one border point within eps
    # of a core but itself sparse, one far-away true-noise point
    pts = {
        0: (0.00, 0.00),
        1: (0.01, 0.00),
        2: (0.00, 0.01),
        3: (0.01, 0.01),
        4: (0.02, 0.00),
        10: (0.115, 0.00),  # border: within eps=0.1 of core 4 only (2 < min_pts)
        99: (5.00, 5.00),  # true noise
    }
    df = _pts_df(spark, pts)
    out = dbscan(df, eps=0.1, min_pts=5)
    by_id = {r.vec_id: r for r in out.collect()}
    assert by_id[10].cluster >= 0 and not by_id[10].is_core
    assert by_id[99].cluster == -1

    core_pts = df.join(out.filter(F.col("is_core")).select("vec_id"), "vec_id")
    true_noise = df.join(
        out.filter(F.col("cluster") == -1).select("vec_id"), "vec_id"
    )
    assert eps_pairs(true_noise, core_pts, eps=0.1, dims=2).count() == 0
    # plant the defect: pretend the border point was left as noise
    fake_noise = true_noise.unionByName(df.filter(F.col("vec_id") == 10))
    assert eps_pairs(fake_noise, core_pts, eps=0.1, dims=2).count() > 0


# ---------------------------------------------------------------------------
# 4. q270 empty-document losslessness (engine + oracle parity)
# ---------------------------------------------------------------------------


def test_q270_empty_and_whitespace_docs_are_lossless(spark, tmp_path):
    import duckdb

    from sales_data_pipeline_spark.plans import QUERIES
    from sales_data_pipeline_spark.testing import compare_frames

    rows = [(i, "src0", f"alpha beta gamma {i % 3} alpha beta") for i in range(12)]
    rows += [
        (100, "edge", ""),  # empty: bpe_apply drops it -> trivially lossless
        (101, "edge", "   "),  # whitespace-only
        (102, "edge", "\t\n \n"),  # exotic whitespace
        (103, "edge", "  alpha beta  "),  # edge whitespace, real words
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    sf_dir = str(tmp_path / "sf_edge")
    os.makedirs(sf_dir, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    q = QUERIES["q270_bpe_lossless_audit"]
    got = q.fn(spark, sf_dir).toPandas()
    assert bool(got.loc[got["source"] == "edge", "all_lossless"].iloc[0])

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    want = con.execute(q.oracle).df()
    problems = compare_frames(got, want)
    assert not problems, "; ".join(problems)


# ---------------------------------------------------------------------------
# 5. q276 export path is per-process
# ---------------------------------------------------------------------------


def test_q276_export_path_carries_pid(spark, sf_dir):
    import tempfile

    from sales_data_pipeline_spark.plans import QUERIES

    q = QUERIES["q276_training_export_audit"]
    row = q.fn(spark, sf_dir).collect()[0]
    assert row.all_rows_match and row.all_fp_match
    tag = os.path.basename(os.path.normpath(sf_dir))
    expected = os.path.join(
        tempfile.gettempdir(), f"spark_graft_export_{tag}_{os.getpid()}"
    )
    assert os.path.isdir(expected)
