"""Streaming event analytics: watermarked windows + custom stateful ops.

The reference has none of this (SURVEY §2i); these are the Structured
Streaming counterparts of the batch `q14_events_hourly` /
`q15_sessionize` queries, built the idiomatic way:

- ``hourly_event_rollup``: event-time tumbling window with a watermark.
  In append mode a window row is emitted exactly once, when the
  watermark passes its end — late events inside the tolerance still
  land in their window; events later than the watermark are dropped.
  State per key is bounded by the watermark (Spark evicts closed
  windows), so the operator runs indefinitely at any scale.
- ``sessionize_stateful``: gap-based sessions per user via
  applyInPandasWithState — the custom-stateful-operator escape hatch
  for semantics windows can't express. State is one small tuple per
  user (Arrow-batched, grouped by user_id → scales horizontally with
  the key space); each micro-batch emits closed sessions plus the
  updated open session.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Parquet file-source stream of events (fixed schema, checkpointed
    file tracking handled by the query that consumes it). Recursive
    lookup lets producers land whole Spark output directories under
    ``input_dir`` — the file source still tracks individual leaf files."""
    reader = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def hourly_event_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type: count, sum(value).

    Append-mode semantics: a (hour, event_type) row finalizes when the
    watermark (max event time − tolerance) passes hour end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("closed", StringType(), True),  # 'Y' final / 'N' still open
    ]
)

# (session_start_us, last_ts_us, n_events, total_value)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()  # ns → µs
        values = rows["value"].fillna(0.0).tolist()

        if state.exists:
            start_us, last_us, n_events, total_value = state.get
        else:
            start_us, last_us, n_events, total_value = ts_us[0], ts_us[0], 0, 0.0

        out: list[tuple] = []
        for t, v in zip(ts_us, values):
            if n_events and t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n_events, total_value, "Y"))
                start_us, n_events, total_value = t, 0, 0.0
            elif not n_events:
                start_us = t
            last_us = t
            n_events += 1
            total_value += v
        state.update((start_us, last_us, n_events, total_value))
        out.append((user_id, start_us, last_us, n_events, total_value, "N"))
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": pd.to_datetime([r[1] for r in out], unit="us"),
                "session_end": pd.to_datetime([r[2] for r in out], unit="us"),
                "n_events": [r[3] for r in out],
                "total_value": [round(r[4], 6) for r in out],
                "closed": [r[5] for r in out],
            }
        )

    return fn


def sessionize_stateful(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions per user, state carried across micro-batches.

    Emits every touched user's open session each batch ('N') and any
    sessions that batch closed ('Y') — update-mode output. Batch
    counterpart: plans.relational.q15_sessionize (lag + cumulative
    window); this is the streaming form of the same semantics."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once ingestion → exactly-once rows: drop re-deliveries of
    the same key arriving within the watermark, across micro-batches.

    This is the streaming face of the batch dedup operators (exact_dedup
    in operators/dedup.py): dropDuplicatesWithinWatermark keeps one state
    entry per key only until the watermark passes its event time, so
    state is bounded by (arrival rate × watermark) — a plain
    dropDuplicates on a stream would grow state forever. Keys re-sent
    later than the watermark are beyond the exactly-once contract (the
    upstream replayer is expected to stay inside it)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def enrich_stream(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static join: enrich each event with a (batch) dimension —
    the streaming face of the batch star joins (operators/enrich.py).
    The static side is re-planned per micro-batch (so a dim refresh is
    picked up without restarting the query) and broadcast when small:
    no stream-side state, no watermark needed — the required shape for
    dimension enrichment at any stream rate. Left join: an event whose
    key is missing from the dim must pass through with nulls, not be
    silently dropped (quarantine is a downstream policy decision)."""
    return events.join(F.broadcast(dim), key, "left")


def _attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared body of the inner/left-outer attribution joins: watermark
    both sides, bound event-time distance in the join condition (what
    lets Spark expire state), project the attribution row shape."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        v,
        F.expr(
            f"""
            p_user = v_user AND
            view_ts <= purchase_ts AND
            view_ts >= purchase_ts - INTERVAL {attribution_window}
            """
        ),
        how,
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "view_ts",
        "view_value",
    )


def purchase_attribution_stream(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked STREAM-STREAM join: attribute each purchase to the
    view events of the same user within the preceding hour. Both sides
    carry watermarks and the join condition bounds event-time distance,
    which is what lets Spark expire buffered state (an unbounded
    stream-stream join would buffer both streams forever). State per
    side ≈ rate × (watermark + attribution window). Inner join: a
    purchase with no prior view in-window produces no attribution row —
    the batch counterpart of this exact semantics is q30's as-of join
    (operators/asof.py) with its window restriction."""
    return _attribution_join(
        views, purchases, attribution_window, watermark, "inner"
    )


def unattributed_purchase_stream(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join — the complement of
    purchase_attribution_stream's inner join: EVERY purchase emits,
    with NULL view columns when no same-user view preceded it in the
    attribution window (the "organic conversion" feed a marketing
    pipeline alerts on). Outer stream-stream joins are semantically
    subtler than inner ones: the NULL row for an unmatched purchase
    can only be emitted once the purchase-side state is provably
    past matching — i.e. when the WATERMARK passes purchase_ts +
    window — so null rows arrive with watermark latency, not
    immediately (Spark emits them on state eviction). That is the
    correct trade: emitting early would retract on a late view, and
    retractions don't exist in append mode. Both sides' state stays
    bounded exactly as in the inner form: rate × (watermark +
    attribution window). The batch counterpart of this semantics is a
    left as-of join (operators/asof.py) where unmatched rows carry
    null payloads."""
    return _attribution_join(
        views, purchases, attribution_window, watermark, "leftOuter"
    )


def session_rollup_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions via the BUILT-IN ``session_window`` — the
    declarative sibling of ``sessionize_stateful``: where the
    applyInPandasWithState form streams per-batch progress rows
    (update mode, open sessions visible), this one emits each session
    EXACTLY ONCE, fully merged, when the watermark passes its close
    (append mode) — the right shape for sinks that must never see a
    session twice. Spark merges overlapping session fragments across
    micro-batches in its window state; state per user is bounded by
    the watermark. Batch counterpart: q129 (same builtin over a static
    frame)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


BURST_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_burst_points_batch", LongType(), True),
        StructField("n_burst_points_total", LongType(), True),
        StructField("last_burst_at", TimestampType(), True),
    ]
)

# state: the last (k-1) event times (µs, ascending) + lifetime burst count
# + last burst time (µs; -1 = none) — a few longs per user, bounded by k
BURST_STATE_SCHEMA = "times array<long>, n_total long, last_burst_us long"


def _burst_fn(k: int, window_seconds: int):
    window_us = window_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # (ts, event_id) total order — the SAME tiebreak the batch
        # detector q243 uses, so equal-timestamp events are processed
        # deterministically (mergesort = stable; a ts-only sort leaves
        # ties in Arrow-batch arrival order, breaking the exact-parity
        # claim for in-order delivery).
        rows = pd.concat(list(pdfs), ignore_index=True)
        sort_cols = ["ts", "event_id"] if "event_id" in rows.columns else ["ts"]
        rows = rows.sort_values(sort_cols, kind="mergesort")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()  # ns → µs

        if state.exists:
            times, n_total, last_burst_us = state.get
            times = list(times)
        else:
            times, n_total, last_burst_us = [], 0, -1

        n_batch = 0
        for t in ts_us:
            if len(times) >= k - 1 and t - times[-(k - 1)] <= window_us:
                n_batch += 1
                last_burst_us = t
            times.append(t)
            if len(times) > k - 1:
                times = times[-(k - 1) :]
        n_total += n_batch
        state.update((times, n_total, last_burst_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_burst_points_batch": [n_batch],
                "n_burst_points_total": [n_total],
                "last_burst_at": [
                    pd.to_datetime(last_burst_us, unit="us")
                    if last_burst_us >= 0
                    else pd.NaT
                ],
            }
        )

    return fn


def burst_monitor_stateful(
    events: DataFrame, k: int = 3, window_seconds: int = 1800
) -> DataFrame:
    """Streaming burst/bot monitor: flags every event whose (k−1)-back
    predecessor (same user) lies within ``window_seconds`` — the
    STREAMING face of the batch detector q243_burst_users (the lag(k−1)
    order-statistic trick), evaluated incrementally so abuse is visible
    within one micro-batch instead of at the next batch ETL run.

    State per user is the last k−1 event times plus two counters — a
    handful of longs, BOUNDED regardless of stream length or user
    activity (contrast a windowed-join formulation, whose state grows
    with the rate×window product). Grouped by user_id →
    applyInPandasWithState scales horizontally with the key space like
    sessionize_stateful. Semantics note: events are processed in
    (batch, event-time-within-batch) order; an event arriving a batch
    late is evaluated at arrival — exact parity with the batch query
    holds for in-order delivery (the covering test), the standard
    at-arrival contract for unwatermarked custom state.

    ``k`` must be ≥ 2: a "burst" compares an event to its (k−1)-back
    predecessor, so k=1 has no predecessor to compare against (and
    would index an empty state list)."""
    if k < 2:
        raise ValueError(f"burst_monitor_stateful requires k >= 2, got k={k}")
    return events.groupBy("user_id").applyInPandasWithState(
        _burst_fn(k, window_seconds),
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming conversion funnel (CEP-lite): view -> click -> purchase
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("stage", LongType(), True),
        StructField("t_view", TimestampType(), True),
        StructField("t_click", TimestampType(), True),
        StructField("t_purchase", TimestampType(), True),
    ]
)

# (-1 sentinel = stage not reached; GroupState structs round-trip
# plain longs more portably than nullable timestamps)
FUNNEL_STATE_SCHEMA = "view_us long, click_us long, purchase_us long"


def _funnel_fn(stages: Tuple[str, str, str]):
    s1, s2, s3 = stages

    def fn(
        key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        sort_cols = ["ts", "event_id"] if "event_id" in rows.columns else ["ts"]
        rows = rows.sort_values(sort_cols, kind="mergesort")

        if state.exists:
            view_us, click_us, purchase_us = state.get
        else:
            view_us, click_us, purchase_us = -1, -1, -1

        for et, ts in zip(
            rows["event_type"].tolist(),
            (rows["ts"].astype("int64") // 1000).tolist(),  # ns -> µs
        ):
            if et == s1 and view_us < 0:
                view_us = ts
            elif et == s2 and view_us >= 0 and click_us < 0 and ts > view_us:
                click_us = ts
            elif (
                et == s3
                and click_us >= 0
                and purchase_us < 0
                and ts > click_us
            ):
                purchase_us = ts
        state.update((view_us, click_us, purchase_us))
        stage = 3 if purchase_us >= 0 else (2 if click_us >= 0 else (1 if view_us >= 0 else 0))

        def _t(us):
            return pd.to_datetime(us, unit="us") if us >= 0 else pd.NaT

        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "stage": [stage],
                "t_view": [_t(view_us)],
                "t_click": [_t(click_us)],
                "t_purchase": [_t(purchase_us)],
            }
        )

    return fn


def funnel_stateful(
    events: DataFrame,
    stages: Tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming conversion funnel — the incremental face of the batch
    funnel q60: per user, first ``stages[0]``, first ``stages[1]``
    STRICTLY AFTER it, first ``stages[2]`` strictly after that (order
    matters; a purchase before the click does not advance the funnel).
    Emits the user's current (stage, stage timestamps) every
    micro-batch that touches them (update mode).

    State per user is exactly three longs — BOUNDED regardless of
    stream length (contrast a stream-stream three-way join, whose
    state grows with rate × watermark³ worst-case); grouped by user_id
    → applyInPandasWithState scales horizontally with the key space.
    Parity: for in-order delivery the greedy fold is EQUAL to q60's
    min-then-filter aggregation chain (first view = min view ts; the
    first later click encountered in ts order IS min(click ts >
    t_view); induction up the funnel) — pinned by the covering test
    against q60 itself over the same rows, including a funnel that
    straddles micro-batch boundaries. Late events follow the same
    at-arrival contract as burst_monitor_stateful: evaluated where
    they land, the standard semantics for unwatermarked custom state.

    CEP-lite note: three named stages cover the product-analytics
    funnel; longer chains are the same fold with an array state (one
    long per stage) — kept at three to match q60's oracle shape."""
    if len(set(stages)) != 3:
        raise ValueError(f"stages must be three distinct event types: {stages!r}")
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(stages),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
