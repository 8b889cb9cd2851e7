"""Grid-partitioned DBSCAN (operators/dbscan.py) vs an exact O(n²)
reference with identical conventions (self-inclusive neighbor counts,
min-id cluster labels, border→min core cluster, noise = -1)."""

from __future__ import annotations

import math
import random

import pytest

from sales_data_pipeline_spark.operators.dbscan import dbscan


def _ref_dbscan(pts: dict[int, tuple], eps: float, min_pts: int):
    ids = sorted(pts)
    def d2(a, b):
        return round(sum((x - y) ** 2 for x, y in zip(pts[a], pts[b])), 9)
    nb = {
        i: [j for j in ids if d2(i, j) <= eps * eps] for i in ids
    }
    core = {i for i in ids if len(nb[i]) >= min_pts}
    # union-find over core-core edges
    parent = {i: i for i in core}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for i in core:
        for j in nb[i]:
            if j in core and j != i:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    cluster = {}
    for i in core:
        comp = [j for j in core if find(j) == find(i)]
        cluster[i] = min(comp)
    out = {}
    for i in ids:
        if i in core:
            out[i] = (cluster[i], True)
        else:
            reach = [cluster[j] for j in nb[i] if j in core]
            out[i] = (min(reach) if reach else -1, False)
    return out


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id bigint, vec array<double>",
    )
    return {
        r.vec_id: (r.cluster, r.is_core)
        for r in dbscan(df, eps=eps, min_pts=min_pts).collect()
    }


def test_dbscan_two_blobs_and_noise(spark):
    pts = {}
    # blob A around (0,0), blob B around (10,10), 2 noise points
    for i in range(8):
        pts[i] = (0.1 * (i % 3), 0.1 * (i // 3))
    for i in range(8, 16):
        pts[i] = (10 + 0.1 * (i % 3), 10 + 0.1 * ((i - 8) // 3))
    pts[100] = (5.0, 5.0)
    pts[101] = (-7.0, 3.0)
    got = _run(spark, pts, eps=0.5, min_pts=4)
    want = _ref_dbscan(pts, 0.5, 4)
    assert got == want
    clusters = {c for c, _ in got.values() if c >= 0}
    assert len(clusters) == 2
    assert got[100] == (-1, False) and got[101] == (-1, False)


def test_dbscan_matches_reference_on_random_layouts(spark):
    rng = random.Random(17)
    for trial in range(3):
        pts = {
            i: (rng.uniform(0, 4), rng.uniform(0, 4)) for i in range(60)
        }
        eps, mp = 0.6, 3
        assert _run(spark, pts, eps, mp) == _ref_dbscan(pts, eps, mp), trial


def test_dbscan_chain_links_through_cores_only(spark):
    """A chain of core points merges into ONE cluster across many grid
    cells; a border point touching two clusters takes the min id."""
    pts = {i: (0.4 * i, 0.0) for i in range(10)}      # chain, eps=0.5
    pts[50] = (0.4 * 4 + 0.2, 0.3)                    # extra density
    got = _run(spark, pts, eps=0.5, min_pts=3)
    want = _ref_dbscan(pts, 0.5, 3)
    assert got == want
    assert len({c for c, _ in got.values() if c >= 0}) == 1


def test_dbscan_cross_cell_pairs_found(spark):
    """Two points 0.99·eps apart but in DIFFERENT grid cells must still
    pair (the adjacent-cell replication is the whole point)."""
    pts = {0: (0.99, 0.0), 1: (1.01, 0.0), 2: (1.03, 0.0)}
    got = _run(spark, pts, eps=0.05, min_pts=2)
    want = _ref_dbscan(pts, 0.05, 2)
    assert got == want
    assert got[0][0] >= 0 and got[0][0] == got[1][0]


def test_dbscan_3d_and_guards(spark):
    rng = random.Random(5)
    pts = {i: (rng.random(), rng.random(), rng.random()) for i in range(30)}
    assert _run(spark, pts, 0.3, 3) == _ref_dbscan(pts, 0.3, 3)

    df = spark.createDataFrame(
        [(0, [0.0] * 8)], "vec_id bigint, vec array<double>"
    )
    with pytest.raises(ValueError, match="low-dimensional"):
        dbscan(df, eps=0.5, min_pts=3)
    with pytest.raises(ValueError, match="eps"):
        dbscan(df, eps=0.0, min_pts=3)
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(df, eps=0.5, min_pts=0)


def test_eps_pairs_candidate_guard_fires_and_is_transparent(spark):
    """r9 density-saturation guard (SCALING.md wave 3: the ε-graph grew
    99.2× for 10× points once mean cell occupancy crossed 1): the
    cell-granular candidate estimate must (a) not change output when
    under budget, (b) die naming the density-independent tiers when
    over, and (c) stay lazy — constructing/explaining the guarded plan
    runs no Spark job."""
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.operators.dbscan import eps_pairs

    # 40 points clustered in one ε-cell: candidates ≈ 40×40
    pts = [(i, [0.01 * (i % 5), 0.01 * (i // 5)]) for i in range(40)]
    df = spark.createDataFrame(pts, "vec_id bigint, vec array<double>")

    # None = unguarded opt-out; the DEFAULT is guarded since r10
    free = {
        (r.a_id, r.b_id)
        for r in eps_pairs(
            df, df, eps=1.0, dims=2, max_candidate_pairs=None
        ).collect()
    }
    default_guarded = {
        (r.a_id, r.b_id) for r in eps_pairs(df, df, eps=1.0, dims=2).collect()
    }
    guarded = {
        (r.a_id, r.b_id)
        for r in eps_pairs(
            df, df, eps=1.0, dims=2, max_candidate_pairs=1_000_000
        ).collect()
    }
    # transparent under budget, through both the default and an explicit one
    assert guarded == free == default_guarded and len(free) == 1600

    over = eps_pairs(df, df, eps=1.0, dims=2, max_candidate_pairs=100)
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_candidate_pairs"):
        over.collect()

    # lazy: explain runs no job (a plan-time .first()/count() would)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    lazy_df = eps_pairs(df, df, eps=1.0, dims=2, max_candidate_pairs=100)
    lazy_df.explain()
    after = tracker.getJobIdsForGroup(None)
    assert before == after


@pytest.mark.parametrize(
    "qname", ["q280_dbscan_census", "q283_dbscan_invariant_audit"]
)
def test_registered_dbscan_plans_fail_fast_past_density_knee(
    spark, tmp_path, qname
):
    """r10 (r9 verdict task 1): the density fence is DEFAULT-ON in the
    REGISTERED q280/q283 bodies, not just the operator — a saturated
    ε-space (every point in one cell → n² cell-local candidates, the
    regime the r9 sf10 campaign measured melting at ×99.2/decade) must
    die fast naming max_candidate_pairs, through the exact callables
    the driver runs. 12,000 identical vectors → 1.44e8 candidates >
    the 1e8 default budget."""
    from sales_data_pipeline_spark.operators.dbscan import (
        DEFAULT_MAX_CANDIDATE_PAIRS,
    )
    from sales_data_pipeline_spark.plans import QUERIES

    n = 12_000
    assert n * n > DEFAULT_MAX_CANDIDATE_PAIRS
    spark.createDataFrame(
        [(i, [0.5] * 8, 0) for i in range(n)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    with pytest.raises(Exception, match="max_candidate_pairs"):
        QUERIES[qname].fn(spark, str(tmp_path)).collect()


# --- dense_cell_clusters (q295: the served census past the fence) ----------


def test_dense_cell_clusters_hand_case(spark):
    """Hand-verifiable layout at eps=0.05: dense cells (0,0) n=5 and
    (1,0) n=4 are 8-adjacent (one cluster, 9 points), (5,5) n=6 is its
    own cluster, three isolated points stay sparse."""
    from sales_data_pipeline_spark.operators.dbscan import dense_cell_clusters

    pts = (
        [(0.01, 0.01), (0.02, 0.01), (0.03, 0.01), (0.01, 0.02), (0.02, 0.02)]
        + [(0.06, 0.01), (0.07, 0.01), (0.08, 0.01), (0.06, 0.02)]
        + [(0.26, 0.26), (0.27, 0.26), (0.28, 0.26),
           (0.26, 0.27), (0.27, 0.27), (0.28, 0.27)]
        + [(0.92, 0.92), (-0.42, 0.31), (0.52, -0.48)]
    )
    df = spark.createDataFrame(
        [(i, [x, y]) for i, (x, y) in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )
    r = dense_cell_clusters(
        df, eps=0.05, min_pts=4, vec_col="embedding"
    ).collect()[0]
    assert r.n_points == 18
    assert r.n_dense_cells == 3
    assert r.n_cell_clusters == 2
    assert r.largest_cluster_cells == 2
    assert r.largest_cluster_points == 9
    assert r.clustered_points == 15


def test_dense_cell_clusters_serves_past_the_fence(spark, tmp_path):
    """The round-11 contract, ε-family edition: the saturated corpus
    the registered exact tier refuses (12k identical vectors → 1.44e8
    cell-local candidates > the default budget) is answered by the
    cell census in bounded time — saturation REDUCES its work (one
    dense cell)."""
    from sales_data_pipeline_spark.operators.dbscan import (
        dbscan,
        dense_cell_clusters,
    )

    n = 12_000
    df = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="max_candidate_pairs"):
        dbscan(
            df.withColumnRenamed("embedding", "vec"),
            eps=0.05, min_pts=4, dims=2,
        ).write.format("noop").mode("overwrite").save()
    r = dense_cell_clusters(
        df, eps=0.05, min_pts=4, vec_col="embedding"
    ).collect()[0]
    assert r.n_points == n and r.n_dense_cells == 1
    assert r.n_cell_clusters == 1
    assert r.largest_cluster_points == n and r.clustered_points == n


def test_dense_cell_clusters_no_dense_cells(spark):
    """All-sparse input: empty census, zeros not nulls, no crash."""
    from sales_data_pipeline_spark.operators.dbscan import dense_cell_clusters

    df = spark.createDataFrame(
        [(0, [0.01, 0.01]), (1, [0.52, 0.52]), (2, [-0.42, -0.42])],
        "vec_id long, embedding array<float>",
    )
    r = dense_cell_clusters(
        df, eps=0.05, min_pts=4, vec_col="embedding"
    ).collect()[0]
    assert r.n_points == 3 and r.n_dense_cells == 0
    assert r.n_cell_clusters == 0
    assert (r.largest_cluster_cells, r.largest_cluster_points,
            r.clustered_points) == (0, 0, 0)


def test_dense_cell_clusters_rejects_unsupported_dims(spark):
    from sales_data_pipeline_spark.operators.dbscan import dense_cell_clusters

    df = spark.createDataFrame(
        [(0, [0.1, 0.2, 0.3])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dims=3 unsupported"):
        dense_cell_clusters(df, eps=0.05, vec_col="embedding", dims=3)
