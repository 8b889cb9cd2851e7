"""Connected components over a pair list — dedup clustering.

Near-dup detection (dedup.py) emits PAIRS; curation needs CLUSTERS
(keep one canonical doc per group of mutual near-dups, even when
A~B~C but A!~C directly). That grouping is connected components on the
pair graph — the step the reference has no counterpart for (its dedup
is `.distinct()` only, SURVEY §2d A3).

Algorithm: iterative min-label propagation with pointer jumping.
Each round every node takes the min label in its neighborhood
(one join + one groupBy), then labels shortcut through their own
labels (label := label(label), a second join) — the pointer-jumping
step that turns O(diameter) convergence into O(log diameter), the
same doubling trick as the classic MapReduce/Pregel CC algorithms.
Convergence is detected by a monotone invariant: labels only ever
decrease, so sum(label) is strictly decreasing until the fixpoint —
one cheap scalar per round, no row-level diff join.

Scale notes (100 TB): every round is two shuffles keyed by node id —
no step ever materializes a component's member list on one executor,
so giant components don't straggle. Lineage is truncated each round
with localCheckpoint (eager); without it the plan doubles per
iteration and planning time, not data, becomes the bottleneck. On a
real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
``checkpoint()`` for fault tolerance across executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster) for every node in ``pairs``; cluster = min node
    id of its connected component. Deterministic, order-independent."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.persist()
    labels = edges.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("label")
    )
    prev_sum: int | None = None
    for _ in range(max_iter):
        # min label over neighborhood (neighbors' labels via one join)
        nbr = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = labels.join(nbr, labels.node == nbr.u, "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label := min(label, label(label))
        hop = labels.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        labels = labels.join(hop, labels.label == hop.pnode, "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
            ).alias("label"),
        )
        labels = labels.localCheckpoint()
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select("node", F.col("label").alias("cluster"))
