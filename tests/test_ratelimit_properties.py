"""Property tests for the debounce fold (streaming/ratelimit.py _fold)
— pure pandas, no SparkSession: the greedy cooldown-spaced selection is
checked against an O(n²) spec and its invariants over random event
sets, including the cross-batch split property that justifies the
stateful operator's exactness claim."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sales_data_pipeline_spark.streaming.ratelimit import _fold

BASE = dt.datetime(2024, 1, 1)


def _mk_pdf(offsets):
    return pd.DataFrame(
        {
            "user_id": [1] * len(offsets),
            "event_id": list(range(len(offsets))),
            "ts": [BASE + dt.timedelta(seconds=int(s)) for s in offsets],
            "event_type": ["alert"] * len(offsets),
            "value": [1.0] * len(offsets),
        }
    )


def _spec(offsets, cooldown_s):
    """O(n) reference in plain ints: greedy earliest-first."""
    out, last = [], None
    for i, s in sorted(enumerate(offsets), key=lambda p: (p[1], p[0])):
        if last is None or s - last >= cooldown_s:
            out.append(i)
            last = s
    return out


events = st.lists(st.integers(min_value=0, max_value=3600), min_size=0, max_size=60)
cooldowns = st.integers(min_value=1, max_value=900)


@settings(max_examples=200, deadline=None)
@given(events, cooldowns)
def test_fold_matches_greedy_spec_and_invariants(offsets, cooldown_s):
    pdf = _mk_pdf(offsets)
    out, last_us, pending = _fold(pdf, None, 0, cooldown_s * 1_000_000)
    got_ids = [r[1] for r in out]
    assert got_ids == _spec(offsets, cooldown_s)
    # spacing invariant: consecutive emissions >= cooldown apart
    times = sorted(offsets[i] for i in got_ids)
    assert all(b - a >= cooldown_s for a, b in zip(times, times[1:]))
    # conservation: every event is emitted or counted suppressed
    assert len(got_ids) + sum(r[5] for r in out) + pending == len(offsets)
    # state correctness: last_us is the last emitted timestamp
    if got_ids:
        assert last_us == int(
            pd.Timestamp(BASE + dt.timedelta(seconds=max(times))).value // 1000
        )
    else:
        assert last_us is None


@settings(max_examples=200, deadline=None)
@given(events, cooldowns, st.integers(min_value=0, max_value=60))
def test_fold_split_equals_whole(offsets, cooldown_s, cut):
    """The micro-batch exactness claim: folding a sorted stream in two
    chunks with carried (last_us, pending) state equals one fold over
    the whole — for any cut point."""
    ordered = sorted(offsets)
    cut = min(cut, len(ordered))
    whole, last_w, pend_w = _fold(
        _mk_pdf(ordered), None, 0, cooldown_s * 1_000_000
    )
    a, last_a, pend_a = _fold(
        _mk_pdf(ordered[:cut]), None, 0, cooldown_s * 1_000_000
    )
    # second chunk's event_ids restart at 0 in _mk_pdf; shift for compare
    b_pdf = _mk_pdf(ordered[cut:])
    b_pdf["event_id"] += cut
    b, last_b, pend_b = _fold(b_pdf, last_a, pend_a, cooldown_s * 1_000_000)
    assert [r[1] for r in a] + [r[1] for r in b] == [r[1] for r in whole]
    assert [r[5] for r in a] + [r[5] for r in b] == [r[5] for r in whole]
    assert (last_b, pend_b) == (last_w, pend_w)
