"""Streaming per-key debounce / rate limit — the alert-suppression
primitive (emit at most one event per key per cooldown window).

Semantics (the classic monitoring debounce): events for a key are
processed in (ts, event_id) order; an event is EMITTED iff its event
time is at least ``cooldown_seconds`` after the last *emitted* event's
time for that key, and every emitted event resets the clock. Suppressed
events are counted, not forwarded — the operator turns an event storm
into a bounded notification stream (pager dedup, abuse throttling,
change-notification coalescing).

State per key is EXACTLY two bigints (last emitted ts as epoch micros
+ arrivals suppressed since it) — bounded by the key space, independent
of stream length or rate; grouped by key → applyInPandasWithState
scales horizontally, the same custom-stateful surface as
funnel_stateful / burst_monitor_stateful. (Spark 4's
``transformWithStateInPandas`` expresses the identical fold with a
named ValueState; it is not used here because its driver worker
requires the ``protobuf`` package, absent from this environment — the
shared ``_fold`` drops into either API unchanged.) Late events follow
the same at-arrival contract as funnel_stateful: an event arriving
after a later one was already emitted is judged against the state as
it stands (retro-suppression would need unbounded replay). For
in-order delivery the fold is EXACTLY equal to the batch reference
``debounce_batch`` (greedy earliest-first selection — the unique
maximal cooldown-spaced subsequence), pinned by the cross-batch parity
test, and the pending-suppressed counter survives micro-batch
boundaries so tail-of-batch suppressions are credited to the next
emission, never lost.

Reference scope: the reference repo has no streaming (SURVEY §2i);
this extends the package's incremental family (11th operator).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["debounce_stateful", "debounce_batch"]

_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, event_type string, "
    "value double, n_suppressed_since_last bigint"
)
_STATE_SCHEMA = "last_us bigint, pending bigint"
_OUT_COLS = [
    "user_id",
    "event_id",
    "ts",
    "event_type",
    "value",
    "n_suppressed_since_last",
]


def _fold(
    pdf: pd.DataFrame, last_us: int | None, suppressed: int, cooldown_us: int
):
    """Greedy debounce fold over one key's rows, ts order. Returns
    (emitted rows, new last_us, pending suppressed count). Shared by
    the streaming processor and the batch reference — one semantics."""
    out = []
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    for r in pdf.itertuples(index=False):
        ts_us = int(pd.Timestamp(r.ts).value // 1000)
        if last_us is None or ts_us - last_us >= cooldown_us:
            out.append(
                (
                    int(r.user_id),
                    int(r.event_id),
                    r.ts,
                    r.event_type,
                    float(r.value),
                    suppressed,
                )
            )
            last_us = ts_us
            suppressed = 0
        else:
            suppressed += 1
    return out, last_us, suppressed


def _debounce_fn(cooldown_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, pending = state.get
            last_us = None if last_us is None else int(last_us)
            pending = int(pending)
        else:
            last_us, pending = None, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        out, last_us, pending = _fold(pdf, last_us, pending, cooldown_us)
        if last_us is not None:
            state.update((int(last_us), int(pending)))
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    return fn


def debounce_stateful(
    events: DataFrame, cooldown_seconds: int = 300
) -> DataFrame:
    """Append-mode stream of the events that survive the per-user
    debounce, each carrying how many arrivals it suppressed since the
    previous emission. See module docstring for the contract."""
    if cooldown_seconds <= 0:
        raise ValueError(f"cooldown_seconds must be > 0, got {cooldown_seconds}")
    return events.groupBy("user_id").applyInPandasWithState(
        _debounce_fn(int(cooldown_seconds) * 1_000_000),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def debounce_batch(
    df: DataFrame, cooldown_seconds: int = 300, key_cols: Sequence[str] = ("user_id",)
) -> DataFrame:
    """Batch reference with the identical greedy fold (one
    applyInPandas over the key, Arrow-batched): the parity oracle for
    debounce_stateful and the backfill path — re-running history
    through the batch form reproduces exactly what the stream emitted
    for in-order delivery."""
    if cooldown_seconds <= 0:
        raise ValueError(f"cooldown_seconds must be > 0, got {cooldown_seconds}")
    cooldown_us = int(cooldown_seconds) * 1_000_000

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _, _ = _fold(pdf, None, 0, cooldown_us)
        return pd.DataFrame(out, columns=_OUT_COLS)

    return df.groupBy(*key_cols).applyInPandas(_apply, _OUT_SCHEMA)
