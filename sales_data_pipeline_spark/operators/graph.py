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
so giant components don't straggle. Lineage is truncated each round:
pass ``checkpoint_dir`` on a real cluster for reliable checkpoints
that survive executor loss (the iterate-then-lose-an-executor failure
mode localCheckpoint cannot ride out); without it the default is
eager ``localCheckpoint`` — fine in local mode, where losing an
executor means losing the JVM anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when iteration exhausts max_iter before the label fixpoint
    — returning possibly-merged-incompletely clusters would silently
    corrupt downstream dedup decisions."""


def _truncate(
    df: DataFrame, checkpoint_dir: str | None, eager: bool = True
) -> DataFrame:
    """Per-round lineage truncation shared by every iterative operator:
    reliable checkpoint files under ``checkpoint_dir`` (survives
    executor loss on a cluster) or localCheckpoint (local mode).
    The caller must have called ``setCheckpointDir`` when a dir is
    given (each operator does, once, up front).

    ``eager=False`` (r12) defers the LOCAL checkpoint's materialization
    to the loop's own convergence action (or, for fixed-iteration
    loops, to the caller's first action): localCheckpoint persists its
    blocks during normal execution, so laziness is free and saves one
    full job per round. The RELIABLE path stays eager regardless — a
    lazy checkpoint() recomputes the RDD in a second job to write the
    checkpoint files, which costs more than the eager job it saves."""
    return (
        df.checkpoint(eager=True)
        if checkpoint_dir is not None
        else df.localCheckpoint(eager=eager)
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, cluster) for every node in ``pairs``; cluster = min node
    id of its connected component. Deterministic, order-independent.

    Input contract (r12): ``pairs`` should be DEDUPLICATED canonical
    pairs (each undirected edge once — the shape every pair operator in
    this catalog emits). Duplicated/reversed pairs stay CORRECT
    (min-aggregation is duplicate-insensitive, tested) but multiply
    per-round join volume; a caller with heavily duplicated pairs
    should dedup upstream once rather than pay that every round.

    ``checkpoint_dir`` switches per-round lineage truncation from
    localCheckpoint (executor-local blocks) to reliable checkpoint()
    files under that directory — required for fault tolerance on a
    multi-executor cluster. Raises ConvergenceError if ``max_iter``
    rounds pass without reaching the fixpoint (pointer jumping needs
    ~log2(diameter) rounds; 25 covers any realistic dedup graph —
    running out means the input is pathological, not that an
    almost-right answer should be returned)."""
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    # Symmetrize via ONE explode pass, not union (r12): union's two
    # branches each re-execute the whole upstream pair-producing plan
    # (for q49 that is the PPJoin verify join — measured as two
    # identical 1.2 MB exchange stages), where explode reads it once.
    # No distinct on the symmetrized list either: min-aggregation is
    # duplicate-insensitive, so dup edges only add rows to the per-round
    # join, while the distinct costs a full edge-sized shuffle up front.
    # Callers here emit canonical deduplicated a<b pairs; a caller with
    # heavily duplicated pairs should dedup upstream once.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("u"), F.col(dst).alias("v")
                    ),
                    F.struct(
                        F.col(dst).alias("u"), F.col(src).alias("v")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .persist()
    )
    # Round 0 is join-free (r12): with identity labels, the neighborhood
    # min is simply min(u, min over neighbors v) — ONE groupBy over the
    # edge list, which also yields the node set (every node of `pairs`
    # appears as a `u` after symmetrization), replacing the old
    # seed-labels distinct AND the first full propagate round.
    labels = edges.groupBy("u").agg(F.min("v").alias("__m")).select(
        F.col("u").alias("node"), F.least(F.col("u"), F.col("__m")).alias("label")
    )
    # Lazy localCheckpoint + sum in ONE action per round (r12): eager
    # truncation ran a materialization job and then a second job for
    # the convergence scalar; with eager=False the sum action both
    # materializes the checkpoint blocks and returns the scalar.
    labels = _truncate(labels, checkpoint_dir, eager=False)
    prev_sum = labels.agg(F.sum("label")).first()[0]
    converged = False
    for _ in range(max_iter):
        # min label over self + neighborhood: neighbors' labels via one
        # join, then ONE union+groupBy replaces the old
        # groupBy + left-join-back (one exchange fewer per round)
        contrib = edges.join(labels, edges.v == labels.node).select(
            F.col("u").alias("node"), F.col("label")
        )
        # persist m: it is BOTH sides of the pointer-jump self-join
        # below — without a materialization the propagate join +
        # groupBy would execute twice per round (freed right after the
        # round's one action)
        m = (
            contrib.unionByName(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        # pointer jump: label := min(label, label(label))
        hop = m.select(F.col("node").alias("pnode"), F.col("label").alias("plabel"))
        labels = m.join(hop, m.label == hop.pnode, "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
            ).alias("label"),
        )
        labels = _truncate(labels, checkpoint_dir, eager=False)
        cur_sum = labels.agg(F.sum("label")).first()[0]
        m.unpersist()
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    if not converged:
        raise ConvergenceError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            "(labels still decreasing); raise max_iter or inspect the input graph"
        )
    return labels.select("node", F.col("label").alias("cluster"))


def pagerank(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    damping: float = 0.85,
    iters: int = 10,
    undirected: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank (Brin & Page 1998, public algorithm) as a DataFrame
    iteration — the second iterative graph operator beside
    connected_components, sharing its scale shape: per iteration ONE
    join (rank × out-degree contribution) + ONE keyed aggregation, no
    driver-side state beyond the loop counter and one scalar
    (dangling mass). Edges are DEDUPLICATED (a repeated (a,b) pair
    must not inflate out-degree or double a contribution), the node
    set is the union of sources and sinks (a sink-only node gets a
    rank row and its incoming mass is counted), and dangling mass
    (rank sitting on nodes with no out-edges — possible only in
    directed inputs) is redistributed uniformly each iteration, the
    standard correction, so total rank mass is conserved at exactly
    1.0 in both modes.

    Deterministic: init 1/N for all nodes, fixed iteration count,
    double arithmetic over keyed aggregations (sum order may perturb
    last bits across partitionings — consumers round, as q128 does).
    ``checkpoint_dir`` switches per-round lineage truncation from
    localCheckpoint to reliable checkpoint() files (same contract as
    connected_components — required to survive executor loss on a
    real cluster). Returns (node, rank)."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    # loop-invariant: consumed twice per round (dangling anti-join +
    # contribution join) — persist once instead of re-aggregating the
    # edge list 2·iters times (r12)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # rank mass on dangling nodes (no out-edges): one bounded
        # 1-row frame, attached as a LAZY broadcast scalar (r12) — the
        # old driver-side .first() ran a full job per round, making the
        # fixed-iteration loop 2·iters jobs; with the scalar in-plan
        # and lazy truncation the WHOLE loop runs inside the caller's
        # first action (same IEEE double arithmetic, bitwise-identical
        # ranks — Python float division == Spark double division)
        dangling = (
            ranks.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
            )
        )
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = _truncate(
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_mass", F.lit(0.0))
                        + F.col("__dangling") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            ),
            # truncate lineage per round (same discipline as
            # connected_components): an un-checkpointed loop builds a
            # 2·iters-join plan that analysis alone chokes on
            checkpoint_dir,
            eager=False,
        )
    # ONE materialization for the whole lazy loop (r12): every round's
    # localCheckpoint blocks persist during this single job (the old
    # shape ran 2 jobs per round — dangling .first() + eager
    # checkpoint), after which the static caches can be released.
    ranks.count()
    out = ranks
    e.unpersist()
    nodes.unpersist()
    deg.unpersist()
    return out


def bfs_hops(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    sources: DataFrame | None = None,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Multi-source BFS over an undirected pair graph: for every
    reachable node, the hop distance to its nearest source and which
    source that is. Returns (node, root, hops); ties (two sources at
    equal distance) break to the smaller root id — deterministic.

    ``sources`` is a one-column DataFrame of node ids (column name
    ``node``); default = each connected component's minimum node id
    (via connected_components), which makes ``root`` the component's
    canonical representative and ``hops`` the distance to it — the
    "how far from the canonical doc" diagnostic for near-dup clusters.

    Shape per round: one edge join + one keyed min-aggregation —
    identical to connected_components' round cost, but WITHOUT pointer
    jumping (distances grow +1 per hop; shortcutting would corrupt
    them), so convergence is O(diameter) rounds, not O(log diameter).
    Near-dup graphs have tiny diameters (clusters are near-cliques);
    for long-chain graphs raise ``max_iter``. Convergence is detected
    by the monotone pair (n_reached, Σhops): reached only grows, and
    at fixed reach the hop sum only decreases. Raises ConvergenceError
    when the budget is exhausted. ``checkpoint_dir`` = reliable
    per-round lineage truncation, same contract as the other graph
    operators.

    Input contract (r12, same as connected_components): pass
    deduplicated canonical pairs. Duplicated/reversed edges remain
    CORRECT (min-agg semantics, tested) but multiply per-round join
    volume — dedup upstream once if your pair source emits them."""
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)


    # explode symmetrization, no distinct (r12): the struct-min
    # aggregation per round is duplicate-insensitive, and the union
    # re-executed the pair-producing subtree twice (the CC lesson)
    e = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .persist()
    )
    if sources is None:
        sources = (
            connected_components(pairs, src=src, dst=dst, max_iter=max_iter,
                                 checkpoint_dir=checkpoint_dir)
            .select(F.col("cluster").alias("node"))
            .distinct()
        )
    labels = sources.select(
        "node",
        F.struct(
            F.lit(0).cast("bigint").alias("hops"),
            F.col("node").alias("root"),
        ).alias("best"),
    )
    prev: tuple | None = None
    converged = False
    for _ in range(max_iter):
        grown = (
            e.join(labels, e.v == labels.node)
            .select(
                F.col("u").alias("node"),
                F.struct(
                    (F.col("best.hops") + F.lit(1)).alias("hops"),
                    F.col("best.root").alias("root"),
                ).alias("best"),
            )
        )
        labels = _truncate(
            labels.unionByName(grown)
            .groupBy("node")
            .agg(F.min("best").alias("best")),
            checkpoint_dir,
            eager=False,  # the convergence agg below materializes it
        )
        cur = tuple(
            labels.agg(
                F.count(F.lit(1)), F.sum(F.col("best.hops"))
            ).first()
        )
        if cur == prev:
            converged = True
            break
        prev = cur
    e.unpersist()
    if not converged:
        raise ConvergenceError(
            f"bfs_hops: no fixpoint after {max_iter} rounds — the graph's "
            "diameter exceeds the budget; raise max_iter"
        )
    return labels.select(
        "node", F.col("best.root").alias("root"), F.col("best.hops").alias("hops")
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    iters: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007, public algorithm): every node starts with its own id
    as label; each round it adopts the label held by the PLURALITY of
    its neighbors. Where connected_components answers "which docs are
    transitively linked at all", LPA answers the finer "which docs
    form densely-linked communities" — two near-dup clusters bridged
    by one accidental pair stay separate here but merge under CC,
    which is exactly the failure mode cluster-atomic dedup splits
    (q151) worry about.

    Determinism and stability (the classic LPA pitfalls, solved four
    ways): *synchronous* updates only (async depends on visit order);
    plurality ties broken by MIN label (``min_by`` over a
    (-count, label) struct — a total order); each node also votes for
    its OWN current label (a self-loop), without which every pendant
    pair A—B swaps labels forever in a 2-cycle and lands in whichever
    phase the iteration count parks it; and a FIXED iteration count
    rather than convergence detection, because synchronous LPA can
    still oscillate on larger bipartite structures and a fixpoint
    test would never fire. Identical inputs give identical
    communities on any partitioning (partition-invariance is
    tested).

    Scale: per round ONE join keyed by node id (edge × label) + ONE
    keyed aggregation ((dst,label) counts) + ONE argmax — no
    neighbor-list materialization per executor, so hub nodes cost a
    skewed-key aggregation (AQE-splittable), not memory. Lineage is
    truncated per round under the same checkpoint contract as
    connected_components/pagerank. Returns (node, community) where
    community = the surviving label (a node id)."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)


    # explode symmetrization (r12): one pass over the pair-producing
    # subtree instead of union's two (the distinct below is KEPT —
    # votes are counts, so duplicate edges would change plurality)
    e = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
                    ),
                    F.struct(
                        F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
    )
    nodes = e.select(F.col("src").alias("node")).distinct().persist()
    # self-loops implement the self-vote; distinct also dedups raw input
    e = (
        e.unionByName(
            nodes.select(
                F.col("node").alias("src"), F.col("node").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = nodes.withColumn("lbl", F.col("node"))
    for _ in range(iters):
        votes = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = _truncate(
            votes.groupBy("node").agg(
                F.expr("min_by(lbl, struct(-cnt AS nc, lbl AS l))").alias(
                    "lbl"
                )
            ),
            checkpoint_dir,
            eager=False,
        )
    # ONE materialization for the whole lazy fixed-iteration loop (r12;
    # the old shape ran an eager checkpoint job per round), after which
    # the static caches can be released
    labels.count()
    out = labels.select("node", F.col("lbl").alias("community"))
    e.unpersist()
    nodes.unpersist()
    return out


def k_core(
    edges: DataFrame,
    k: int = 2,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The k-core of the undirected pair graph: the maximal subgraph
    in which EVERY node keeps degree ≥ k — computed by the classic
    peeling fixpoint (Seidman 1983): repeatedly delete nodes whose
    current degree is below k (deleting a node lowers its neighbors'
    degrees, which may newly expose them) until stable. On a near-dup
    graph the 2-core separates genuinely dense duplication
    neighborhoods from pendant chains/stars that connected components
    lump together — the density lens beside CC (reachability), LPA
    (plurality), and PageRank (centrality).

    Deterministic (pure set fixpoint — no tie-breaks exist to take).
    Per round: ONE degree aggregation + ONE broadcast anti join of the
    edge list against the below-k node set; rounds bounded by the
    peeling depth (≤ graph degeneracy ordering length, a handful on
    real graphs). Same lineage/checkpoint discipline and
    ConvergenceError contract as the siblings. Returns (node, degree)
    for the k-core members, degree measured IN the core."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)


    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # self-loop filter AFTER the union: a loop (a,a) reversed is
        # still (a,a), so filtering only the forward branch would let
        # it back in and inflate a's degree by one
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = _truncate(e, checkpoint_dir, eager=False)
    # max_iter PEELS, plus a final degree check after the last peel —
    # a graph whose peeling depth is exactly max_iter must return its
    # (valid, converged) core, not raise
    for round_no in range(max_iter + 1):
        # persist: the degree aggregate feeds BOTH the low-count action
        # and (via `low`) the anti joins — without it each round runs
        # the aggregation twice
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
        low = deg.filter(F.col("deg") < k).select("src")
        n_low = low.count()
        if n_low == 0:
            deg.unpersist()
            # recompute the (one-pass, off the checkpointed edge set)
            # final degrees rather than returning the just-unpersisted
            # frame — keeps the result distributed and leak-free
            return e.groupBy("src").agg(
                F.count(F.lit(1)).alias("degree")
            ).select(F.col("src").alias("node"), "degree")
        if round_no == max_iter:
            deg.unpersist()
            raise ConvergenceError(
                f"k_core: no fixpoint after {max_iter} rounds (k={k})"
            )
        # no forced broadcast: on early rounds `low` can be most of the
        # node set (pendant-heavy graphs) — an unbounded driver collect
        # under a broadcast hint; let AQE choose the strategy
        e = _truncate(
            e.join(low, "src", "left_anti").join(
                low.withColumnRenamed("src", "dst"), "dst", "left_anti"
            ),
            checkpoint_dir,
            eager=False,  # next round's degree count materializes it
        )
        deg.unpersist()
    raise AssertionError("unreachable")


def triangle_counts(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_wedges: int | None = 100_000_000,
) -> DataFrame:
    """Per-node triangle participation counts over a canonical
    ``src < dst`` edge list: each triangle x<y<z is counted exactly
    once by joining wedge (x,y)+(y,z) against the closing edge (x,z),
    then exploding the three corners — two keyed self-joins on the
    edge list, never nodes². Output: (node, n_triangles bigint), only
    nodes in ≥1 triangle (q127's consumer stage, factored out of the
    plan in r10).

    ``max_wedges`` (DEFAULT-ON, r10) is the dense-component guard —
    the triangle sibling of eps_pairs' ``max_candidate_pairs`` and
    q22's ``max_candidates``. The wedge join's candidate volume is
    Σ_y in-deg(y)·out-deg(y), QUADRATIC in component density: the r10
    graph-consumer measurement on the 64-mega-cluster boilerplate
    corpus put it at 3.26×10⁸ wedges for 3.13M edges (81s vs 0.25s
    uniform — 325×, the one consumer past the 5× bar; SKEW.json
    graph_consumers). The exact wedge count is computed from two tiny
    degree tables and attached as a lazy broadcast scalar gating the
    wedge join (no plan-time job); past the budget the join dies on
    its first wedge row naming the dial (count triangles on the
    deduped/cluster-sampled graph, or raise the budget). ``None``
    opts out and restores the unguarded plan."""
    e1 = edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
    e2 = edges.select(F.col(src_col).alias("y"), F.col(dst_col).alias("z"))
    e3 = edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("z"))
    wedges = e1.join(e2, "y")
    if max_wedges is not None:
        ind = e2.groupBy("y").agg(F.count(F.lit(1)).alias("__d_out"))
        outd = e1.groupBy("y").agg(F.count(F.lit(1)).alias("__d_in"))
        est = ind.join(outd, "y").agg(
            F.coalesce(
                # double product sum: exact bigints could overflow in
                # exactly the blow-up being guarded
                F.sum(F.col("__d_in").cast("double") * F.col("__d_out")),
                F.lit(0.0),
            ).alias("__est_wedges")
        )
        guard = F.when(
            F.col("__est_wedges") <= F.lit(float(max_wedges)), F.lit(True)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("triangle_counts: degree census implies ~"),
                    F.col("__est_wedges").cast("bigint").cast("string"),
                    F.lit(
                        f" wedge candidates (> max_wedges={max_wedges}); "
                        "the graph has dense components (near-clique "
                        "dup clusters) and the wedge join is quadratic "
                        "in their size — count triangles on the deduped "
                        "or cluster-sampled graph, raise max_wedges, or "
                        "pass max_wedges=None to override"
                    ),
                )
            )
        )
        # guard FIRST (evaluated on the first wedge row, one broadcast-
        # scalar comparison) so an over-budget join dies before any
        # closing-edge work
        wedges = wedges.crossJoin(F.broadcast(est)).filter(guard).drop(
            "__est_wedges"
        )
    tri = wedges.join(e3, ["x", "z"])
    nodes = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def triangle_count_estimate(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    target_wedges: int = 10_000_000,
    salt: str = "",
) -> DataFrame:
    """Global triangle-count ESTIMATE that stays serveable on graphs
    the exact tier (:func:`triangle_counts`) refuses — the round-11
    answer to "the fence is loud but a refusal is not a served query".

    DOULION (Tsourakakis, Kang, Miller, Faloutsos, KDD 2009): keep each
    edge independently with probability p, count triangles on the
    sparsified graph, scale by 1/p^3 — an unbiased estimator (each
    triangle survives iff its 3 edges survive, probability p^3) whose
    variance shrinks as the true count grows, i.e. it is MOST accurate
    exactly on the dense near-clique dup graphs that blow the exact
    tier's wedge budget.

    REGIME DIAL, not a switch: p = min(1, sqrt(target_wedges / W))
    where W = sum over middle nodes of in_deg*out_deg is the exact
    wedge count of the FULL graph (two tiny degree aggregates — the
    same census :func:`triangle_counts`' guard and q291 use). Expected
    post-sampling wedge volume is p^2 * W <= target_wedges, so the
    self-join work is bounded REGARDLESS of input density; on any
    graph already under the budget p clamps to exactly 1.0 and the
    SAME plan computes the exact count (exact_mode=true, est ==
    sampled count). No branch, no eager driver action: p is a lazy
    broadcast scalar, so explain/plan-shape tests run no job.

    Determinism: the keep/drop decision is the repo's cross-engine
    md5-13-hex uniform — u = md5('tri<salt>:' || x || ':' || y) first
    13 hex digits / 2^52, keep iff u < p — so the estimate is a pure
    function of (graph, target_wedges, salt), reproducible run-to-run,
    partition-independent, and bit-replicable by an external SQL
    engine (q294's DuckDB oracle runs this whole pipeline end-to-end,
    sampling included). Vary ``salt`` for independent resamples (the
    variance-audit tests average over salts).

    Output (one row): n_edges, n_wedges (exact, bigint), sample_p
    (double), n_triangles_sampled (bigint), est_triangles (double,
    n_triangles_sampled / p^3), exact_mode (p == 1). W is summed in
    DECIMAL(38,0) — exact and order-independent where a double sum's
    last bits would wobble with partition order and a bigint sum could
    overflow under ANSI on web-scale degree products.

    Scale shape: the input edge list is persisted (MEMORY_AND_DISK,
    registered in dedup's cache registry — release_caches() frees it):
    it feeds the degree census, the edge count, and the sampling
    filter, and Spark re-executes common subplans per consumer. The
    sampled list (expected p*|E| rows) is persisted too — it is all
    three legs of the triangle join. Nothing in the plan materializes
    more than target_wedges join rows plus two degree tables."""
    from sales_data_pipeline_spark.operators.dedup import _persist

    e = _persist(
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
    )
    # ONE degree pass (r12): the census and the edge count used to be
    # three separate aggregations over e (groupBy y, groupBy x + join,
    # count) and — because params had two consumers (the sampling
    # filter and the output row) with no materialization — the whole
    # census subtree executed TWICE (measured: the two census stages
    # were the top-2 entries of the q294 stage profile, 41s+27s of
    # executor time at sf0.1). Now: one union + one groupBy computes
    # both degrees per node, one agg derives W = Σ din·dout (nodes
    # missing a side contribute din·0 or 0·dout = 0 — identical to the
    # old inner join over nodes having both) AND n_edges = Σ dout (each
    # edge has exactly one x), and the 1-row params frame is persisted
    # so both consumers read the same materialization. Still lazy: no
    # job runs at plan construction.
    deg = (
        e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("x").alias("__n"),
                        F.lit(1).alias("__o"),
                        F.lit(0).alias("__i"),
                    ),
                    F.struct(
                        F.col("y").alias("__n"),
                        F.lit(0).alias("__o"),
                        F.lit(1).alias("__i"),
                    ),
                )
            ).alias("__d")
        )
        .select("__d.__n", "__d.__o", "__d.__i")
        .groupBy("__n")
        .agg(F.sum("__o").alias("__dout"), F.sum("__i").alias("__din"))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    params = _persist(
        deg.agg(
            F.coalesce(
                F.sum(
                    F.col("__din").cast("decimal(19,0)")
                    * F.col("__dout").cast("decimal(19,0)")
                ),
                zero,
            ).alias("__w"),
            F.coalesce(F.sum("__dout"), F.lit(0)).cast("bigint").alias("__n_edges"),
        ).select(
            "__w",
            "__n_edges",
            F.when(
                F.col("__w") > 0,
                F.least(
                    F.lit(1.0),
                    F.sqrt(
                        F.lit(float(target_wedges)) / F.col("__w").cast("double")
                    ),
                ),
            )
            .otherwise(F.lit(1.0))
            .alias("__p"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"tri{salt}:"),
                        F.col("x").cast("string"),
                        F.lit(":"),
                        F.col("y").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(4503599627370496.0)  # 2^52: u uniform in [0, 1)
    )
    s = _persist(
        e.crossJoin(F.broadcast(params.select("__p")))
        .filter(u < F.col("__p"))
        .select("x", "y")
    )
    s2 = s.select(F.col("x").alias("y"), F.col("y").alias("z"))
    s3 = s.select("x", F.col("y").alias("z"))
    tri = (
        s.join(s2, "y")
        .join(s3, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tri"))
    )
    p = F.col("__p")
    # clamp before the bigint cast (r12, ADVICE r11): W is summed in
    # DECIMAL(38,0) precisely because web-scale degree products can
    # exceed 2^63, but an ANSI cast of such a W back to bigint would
    # re-introduce the crash the decimal avoids; the clamp is exact a
    # no-op below 2^63 (every test SF) and saturates instead of
    # throwing past it.
    # PARITY DOMAIN (ADVICE r12): the DuckDB oracle SQL has no such
    # saturation, so bitwise cross-engine parity on n_wedges is
    # guaranteed only for W < 2^63 — unreachable at any test SF, and
    # past it the oracle engine itself would overflow; the clamp is
    # where this engine chooses saturation over a crash.
    max_long = F.lit(9223372036854775807).cast("decimal(38,0)")
    return tri.crossJoin(F.broadcast(params)).select(
        F.col("__n_edges").cast("bigint").alias("n_edges"),
        F.least(F.col("__w"), max_long).cast("bigint").alias("n_wedges"),
        p.alias("sample_p"),
        F.col("__tri").alias("n_triangles_sampled"),
        (F.col("__tri").cast("double") / (p * p * p)).alias("est_triangles"),
        (p >= F.lit(1.0)).alias("exact_mode"),
    )
