"""Invariants of the scaling-data generator (tools/scaling.py) — the
protocol behind SCALING.json's measured curve. If generation were
subtly wrong (lost rows, broken FKs, cross-replica duplicate leakage),
the curve's ratios would be measuring the wrong workload; these pin the
three properties the SCALING.md protocol claims, at test scale
(sf0.001 × 3 replicas)."""

from __future__ import annotations

import sys
import os

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gen_dir(spark, tmp_path_factory):
    from scaling import generate

    dst = str(tmp_path_factory.mktemp("scalegen") / "sf3x")
    generate(src_dir=SRC, dst_dir=dst, n_replicas=3, spark=spark)
    return dst


def test_generate_rejects_replicas_beyond_flip_scheme(tmp_path):
    """The signed-flip scheme uses only the low 4 bits of the replica
    index: replica 16 would get an empty flip set and silently
    reproduce the identical-copy replication bug (r8 ADVICE). The
    invariant must be enforced where the flips are computed, not by
    the incidental _PREFIX lookup failure at r >= 10."""
    from scaling import generate

    with pytest.raises(ValueError, match="n_replicas=11 > 10"):
        generate(src_dir=SRC, dst_dir=str(tmp_path / "x"), n_replicas=11)


def test_counts_scale_exactly_and_dims_stay_fixed(spark, gen_dir):
    for t in ("lineitem", "orders", "customer", "documents", "events"):
        a = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        b = spark.read.parquet(f"{gen_dir}/{t}.parquet").count()
        assert b == 3 * a, t
    for t in ("nation", "region"):
        a = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        assert spark.read.parquet(f"{gen_dir}/{t}.parquet").count() == a, t


def test_replica_zero_is_identity_superset(spark, gen_dir):
    """Replica 0 must be the source rows byte-for-byte, so sf-small
    results embed in sf-big (the 'strict superset' claim)."""
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    rep0 = spark.read.parquet(f"{gen_dir}/documents.parquet").filter(
        F.col("doc_id") < 10_000_000
    )
    assert rep0.exceptAll(src).count() == 0
    assert src.exceptAll(rep0).count() == 0


def test_fk_consistency_no_orphans(spark, gen_dir):
    """Key shifts must be FK-consistent: every lineitem order/part key
    resolves, every order's customer resolves — a broken shift would
    quietly empty the join-heavy queries at sf1."""
    li = spark.read.parquet(f"{gen_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{gen_dir}/orders.parquet")
    part = spark.read.parquet(f"{gen_dir}/part.parquet")
    cust = spark.read.parquet(f"{gen_dir}/customer.parquet")
    assert li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").count() == 0
    assert li.join(part, li.l_partkey == part.p_partkey, "left_anti").count() == 0
    assert orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").count() == 0


def test_duplicate_structure_is_replica_disjoint(spark, gen_dir):
    """The 'duplicate rate constant' claim: document token spaces are
    disjoint across replicas (zero shared shingles → zero cross-replica
    near-dups), and part-name edit distance across replicas exceeds
    q250's k=2 (prefix distance 3)."""
    docs = spark.read.parquet(f"{gen_dir}/documents.parquet")
    toks = docs.select(
        (F.col("doc_id") / 10_000_000).cast("int").alias("rep"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).distinct()
    cross = (
        toks.groupBy("tok")
        .agg(F.count_distinct("rep").alias("n_reps"))
        .filter(F.col("n_reps") > 1)
    )
    assert cross.count() == 0
    part = spark.read.parquet(f"{gen_dir}/part.parquet").select(
        (F.col("p_partkey") / 10_000_000).cast("int").alias("rep"), "p_name"
    )
    a = part.filter(F.col("rep") == 0).select(F.col("p_name").alias("na"))
    b = part.filter(F.col("rep") == 1).select(F.col("p_name").alias("nb"))
    # sample-bounded exact check: no cross-replica pair within lev<=2
    close = (
        a.limit(200)
        .crossJoin(b.limit(200))
        .filter(F.levenshtein("na", "nb") <= 2)
    )
    assert close.count() == 0


def test_second_decade_generation_composes(spark, gen_dir, tmp_path):
    """measure_decade builds sf10 by re-running generate ON sf1 with a
    10× stride — composition must keep the invariants: exact count
    multiplication, replica-0 identity (sf1 embeds in sf10), and key
    disjointness across the SECOND decade's replicas (stride 100M clears
    the first decade's whole key span)."""
    from scaling import generate

    dst = str(tmp_path / "decade2")
    generate(
        src_dir=gen_dir, dst_dir=dst, n_replicas=2, spark=spark,
        stride=100_000_000, tag="s",
    )
    for t in ("lineitem", "documents", "events"):
        a = spark.read.parquet(f"{gen_dir}/{t}.parquet").count()
        assert spark.read.parquet(f"{dst}/{t}.parquet").count() == 2 * a, t
    src = spark.read.parquet(f"{gen_dir}/documents.parquet")
    two = spark.read.parquet(f"{dst}/documents.parquet")
    rep0 = two.filter(F.col("doc_id") < 100_000_000)
    assert rep0.exceptAll(src).count() == 0
    assert src.exceptAll(rep0).count() == 0
    # disjoint key spaces between the decade-2 replicas
    assert (
        two.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )
    # cross-replica duplicate leakage stays zero one decade up: the
    # token remap suffixes again, so no exact-duplicate text group can
    # span the decade-2 replicas
    leak = (
        two.select(
            "text",
            (F.col("doc_id") >= 100_000_000).cast("int").alias("rep"),
        )
        .groupBy("text")
        .agg(F.countDistinct("rep").alias("n_reps"))
        .filter(F.col("n_reps") > 1)
        .count()
    )
    assert leak == 0


# ---------------------------------------------------------------------------
# subset-merge invariants of the SCALING artifacts (ADVICE r8, medium):
# a query that newly FAILS a subset re-measure must drop its stale
# success entry AND keep its fresh error — the r7 code did the reverse,
# silently reporting the old timing as current and deleting the fresh
# error record.
# ---------------------------------------------------------------------------


def _prev_artifact():
    return {
        "queries": {
            "q_refail": {"sf1_sec": 1.0, "sf10_sec": 2.0, "ratio": 2.0,
                         "superlinear": False},
            "q_untouched": {"sf1_sec": 5.0, "sf10_sec": 9.0, "ratio": 1.8,
                            "superlinear": False},
            "q_regreen": {"sf1_sec": 3.0, "sf10_sec": 4.0, "ratio": 1.33,
                          "superlinear": False},
        },
        "errors": {
            "sf1": {"q_stale_err": "old boom"},
            "sf10": {"q_regreen": "old oom"},
        },
    }


def test_merge_fresh_failure_drops_stale_success_and_keeps_fresh_error():
    from scaling import _merge_artifact

    queries, errors = _merge_artifact(
        _prev_artifact(),
        ["q_refail"],
        "sf1", "sf10",
        t_small={"q_refail": 1.1}, t_big={},          # failed the big side
        rows_small={"q_refail": 10}, rows_big={},
        err_small={}, err_big={"q_refail": "fresh oom"},
    )
    assert "q_refail" not in queries            # stale timing dropped
    assert errors["sf10"]["q_refail"] == "fresh oom"   # fresh error kept
    # fresh success on the small side clears nothing it shouldn't
    assert "q_refail" not in errors["sf1"]
    # out-of-subset entries survive untouched
    assert queries["q_untouched"]["sf1_sec"] == 5.0
    assert errors["sf1"]["q_stale_err"] == "old boom"


def test_merge_fresh_green_clears_stale_error_and_updates_entry():
    from scaling import _merge_artifact

    queries, errors = _merge_artifact(
        _prev_artifact(),
        ["q_regreen"],
        "sf1", "sf10",
        t_small={"q_regreen": 2.0}, t_big={"q_regreen": 5.0},
        rows_small={"q_regreen": 7}, rows_big={"q_regreen": 70},
        err_small={}, err_big={},
    )
    assert queries["q_regreen"]["sf1_sec"] == 2.0
    assert queries["q_regreen"]["sf10_sec"] == 5.0
    assert queries["q_regreen"]["ratio"] == 2.5
    assert queries["q_regreen"]["row_ratio"] == 10.0
    assert "q_regreen" not in errors["sf10"]    # stale error cleared
    assert errors["sf1"] == {"q_stale_err": "old boom"}


def test_merge_full_run_ignores_prev():
    from scaling import _merge_artifact

    queries, errors = _merge_artifact(
        None,
        ["q_a"],
        "sf0.1", "sf1",
        t_small={"q_a": 1.0}, t_big={"q_a": 30.0},
        rows_small={"q_a": 1}, rows_big={"q_a": 1},
        err_small={}, err_big={},
    )
    assert set(queries) == {"q_a"}
    assert queries["q_a"]["superlinear"] is True   # 30x > 12x budget
    assert errors == {"sf0.1": {}, "sf1": {}}


def test_embeddings_flip_is_isometric_within_and_disjoint_across(spark, gen_dir):
    """r8 generator fix: embeddings replicate via per-replica signed
    dimension flips. Invariants: (a) replica 0 is the identity; (b)
    every replica's within-replica pairwise-distance multiset equals
    replica 0's BITWISE (sign flips are float-exact isometries — the
    ε-graph/density structure is the same per replica); (c) no vector
    coincides with its own copy in another replica (the identical-copy
    replication this replaces densified the ε-pair graph ~100×/decade
    and produced a fake 22.6× DBSCAN 'superlinearity' at sf10)."""
    import itertools
    import math

    rows = (
        spark.read.parquet(f"{gen_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    by_rep: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_rep.setdefault(r.vec_id // 10_000_000, {})[
            r.vec_id % 10_000_000
        ] = r.embedding
    src = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SRC}/embeddings.parquet").collect()
    }
    assert by_rep[0] == src  # (a) identity replica

    def dist_multiset(vecs: dict) -> list[float]:
        ids = sorted(vecs)
        return sorted(
            math.dist(vecs[a], vecs[b])
            for a, b in itertools.combinations(ids, 2)
        )

    d0 = dist_multiset(by_rep[0])
    for rep in (1, 2):
        assert dist_multiset(by_rep[rep]) == d0  # (b) bitwise isometry
        coincident = sum(
            1 for k, v in by_rep[rep].items() if v == by_rep[0][k]
        )
        assert coincident == 0, coincident  # (c) no identical copies
