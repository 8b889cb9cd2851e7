"""Incremental aggregate maintenance — merge additive partial aggregates.

The 100 TB operation this encodes: a materialized mart over an
append-mostly fact table must NOT be rebuilt by re-scanning the whole
fact on every batch. For any aggregate that is a commutative monoid
per mart key (COUNT, SUM — and anything rebuilt from them: AVG as
sum/count, variance from moment sums), the maintenance step is

    new_mart = reduce_by_key(old_mart ∪ aggregate(delta_batch))

i.e. aggregate ONLY the delta (one scan of the new data), then fold
the mart-sized partials together. The fold here is a ``unionByName``
followed by one ``groupBy(keys).sum(...)`` rather than a full-outer
join: it takes any number of partial sides in one tiny shuffle over
mart-cardinality rows, keys missing from either side need no coalesce
special-casing, and Spark map-side combines the union before the
exchange.

Retractions (CDC deletes/updates) need no second code path: a delete
is a delta row with negated measures and ``n_rows = -1`` — the monoid
absorbs it. ``merge_partial_aggregates`` therefore never filters or
branches on a change-type column; producers encode retractions by sign
(see tests/test_r6_operators.py for the delete/update round-trip).

Exactness contract: measure columns must be exact types (BIGINT
counts, DECIMAL money — the q229 discipline). Folding float partials
would make the result order-dependent; this module refuses double
measure columns rather than silently producing a mart that diverges
from a full recompute by last-bit noise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_partial(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, object],
) -> DataFrame:
    """One partial-aggregate side: ``groupBy(keys)`` with the given
    named measure expressions (name -> Column). Used for both the
    initial mart build and each delta batch — the partial and the
    final mart share one schema, which is what makes the fold closed."""
    aggs = [col.alias(name) for name, col in measures.items()]
    return df.groupBy(*keys).agg(*aggs)


def merge_partial_aggregates(
    partials: Sequence[DataFrame],
    keys: Sequence[str],
) -> DataFrame:
    """Fold any number of schema-identical partial aggregates into one:
    union all sides, re-sum every non-key column per key. Exact when
    every measure is an exact type (asserted); a key present in only
    some sides simply contributes fewer rows to the fold. The shuffle
    is over mart-cardinality rows — at 100 TB the fact never re-scans,
    only the delta does."""
    if not partials:
        raise ValueError("merge_partial_aggregates needs at least one partial")
    first = partials[0]
    measure_cols = [c for c in first.columns if c not in set(keys)]
    for p in partials:
        if p.columns != first.columns:
            raise ValueError(
                f"partial schemas differ: {p.columns} vs {first.columns}"
            )
    for fld in first.schema.fields:
        if fld.name in measure_cols and fld.dataType.typeName() in ("double", "float"):
            raise ValueError(
                f"measure {fld.name!r} is {fld.dataType.simpleString()}: "
                "folding float partials is order-dependent; aggregate in "
                "DECIMAL/BIGINT and cast at the output boundary"
            )
    unioned = partials[0]
    for p in partials[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )


def incremental_join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Incremental JOIN maintenance (classic view-maintenance algebra,
    e.g. Blakeley et al. 1986): with A' = A ∪ ΔA and B' = B ∪ ΔB and
    all four parts key-disjoint from their counterparts,

        A' ⋈ B'  =  (A ⋈ B)  ∪  (A ⋈ ΔB) ∪ (ΔA ⋈ B) ∪ (ΔA ⋈ ΔB)

    so a materialized join mart is maintained by computing ONLY the
    three delta terms — each joins a delta (batch-sized) against a
    base or another delta, never base ⋈ base, which at 100 TB is the
    difference between a batch-sized update and a full-mart rebuild.
    Returns the union of the three delta terms (the rows to APPEND to
    the stored mart). Retractions compose the same way as in
    merge_partial_aggregates when the mart is an aggregate over this
    join: feed the delta-join output through the signed fold.

    Columns: the natural-join result shape (join keys once, then both
    sides' payloads) — all four inputs must share the A-schema /
    B-schema respectively (unionByName enforces it)."""
    terms = [
        base_a.join(delta_b, list(on)),
        delta_a.join(base_b, list(on)),
        delta_a.join(delta_b, list(on)),
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out
