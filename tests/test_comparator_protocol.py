"""Pins the oracle-comparator protocol (testing.compare_frames /
normalize_frame) against drift.

164 of the 247 catalog queries have never been driver-sampled; the
repo's own parity sweep runs the identical check over all oracled
queries, so the residual risk is not wrong answers but PROTOCOL drift
between this comparator and the driver's t2 gate (column ordering, NULL
handling, numeric-width unification, float bitwise-ness, datetime
precision). These fixtures lock every rule with known-tricky values so
a comparator change that would diverge from the driver's comparison
fails HERE before it fails a CORRECTNESS round.

Each test states the rule it pins; changing comparator behavior should
require consciously rewriting the corresponding fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sales_data_pipeline_spark.testing import compare_frames, normalize_frame


def test_column_order_is_insensitive_rows_sorted_by_repr_key():
    """Rule: columns compare by NAME (sorted), never by position, and
    rows compare order-insensitively via the stable repr-key sort."""
    got = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    want = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    assert compare_frames(got, want) == []


def test_integer_widths_unify_to_int64():
    """Rule: int32 vs int64 is NOT a mismatch (both sides widen to
    int64) — Spark int vs DuckDB BIGINT must stay parity-safe."""
    got = pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    want = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert compare_frames(got, want) == []


def test_int_vs_float_kind_drift_is_flagged():
    """Rule: an int column vs a float column is a MISMATCH even when the
    values are numerically equal — the driver hashes typed values, so an
    uncast DuckDB HUGEINT sum arriving as float64 must fail here too."""
    got = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    want = pd.DataFrame({"n": pd.array([1.0, 2.0], dtype="float64")})
    problems = compare_frames(got, want)
    assert len(problems) == 1 and "dtype kind mismatch" in problems[0]


def test_floats_compare_bitwise_not_approximately():
    """Rule: float comparison is EXACT (array_equal), not approximate —
    one ULP of drift is a failure, which is why money goes through
    decimal arithmetic instead of float sums."""
    got = pd.DataFrame({"x": [0.1 + 0.2]})
    want = pd.DataFrame({"x": [0.3]})
    problems = compare_frames(got, want)
    assert len(problems) == 1 and "values differ" in problems[0]


def test_nan_equals_nan_and_negative_zero_equals_zero():
    """Rule: NaN==NaN is parity (equal_nan=True) and IEEE -0.0 == 0.0 is
    parity (numeric equality, not bit-pattern) — engines legitimately
    disagree on zero sign through multiplication."""
    got = pd.DataFrame({"x": [float("nan"), -0.0, 1.5]})
    want = pd.DataFrame({"x": [float("nan"), 0.0, 1.5]})
    assert compare_frames(got, want) == []


def test_null_vs_nan_in_float_column_is_parity():
    """Rule: missingness unifies in float columns — Spark None arrives
    as NaN after toPandas' float64 coercion, DuckDB NULL likewise."""
    got = pd.DataFrame({"x": pd.array([None, 2.0], dtype="float64")})
    want = pd.DataFrame({"x": [float("nan"), 2.0]})
    assert compare_frames(got, want) == []


def test_null_position_does_not_depend_on_input_order():
    """Rule: NULL sort position is decided by the repr key, identically
    on both sides — a NULL-first engine result vs a NULL-last oracle
    result must still be parity."""
    got = pd.DataFrame({"k": ["a", None, "b"]})
    want = pd.DataFrame({"k": [None, "b", "a"]})
    assert compare_frames(got, want) == []


def test_datetime_precision_unifies_to_microseconds():
    """Rule: datetime64[ns] vs datetime64[us] is parity at equal values
    (both normalize to [us]) — Spark timestamps arrive ns-precision via
    Arrow, DuckDB us-precision."""
    ts = pd.Timestamp("2024-03-01 12:00:00.123456")
    got = pd.DataFrame({"t": pd.array([ts], dtype="datetime64[ns]")})
    want = pd.DataFrame({"t": pd.array([ts], dtype="datetime64[us]")})
    assert compare_frames(got, want) == []


def test_sub_microsecond_truncation_is_invisible():
    """Rule (documents a deliberate blind spot): ns-only differences
    truncate away at the [us] unification, so queries must never emit
    sub-microsecond-significant timestamps."""
    got = pd.DataFrame(
        {"t": pd.array([pd.Timestamp("2024-03-01 12:00:00.123456789")], dtype="datetime64[ns]")}
    )
    want = pd.DataFrame(
        {"t": pd.array([pd.Timestamp("2024-03-01 12:00:00.123456")], dtype="datetime64[us]")}
    )
    assert compare_frames(got, want) == []


def test_unicode_compares_by_codepoint_not_locale():
    """Rule: string ordering/equality is codepoint-based (repr key), no
    locale collation — 'é' composed vs decomposed is a VALUE difference,
    not silently normalized."""
    got = pd.DataFrame({"s": ["café"]})          # é composed
    want = pd.DataFrame({"s": ["café"]})        # e + combining acute
    problems = compare_frames(got, want)
    assert len(problems) == 1 and "values differ" in problems[0]
    assert compare_frames(
        pd.DataFrame({"s": ["café", "Z"]}), pd.DataFrame({"s": ["Z", "café"]})
    ) == []


def test_xx5_decimal_ties_as_doubles_compare_bitwise():
    """Rule: a .xx5 money value that both engines produced by the SAME
    decimal->double boundary cast is parity; a value that one engine
    rounded differently (2.675 -> 2.67 vs 2.68) is a failure. This is
    the fixture behind the keep-decimal-through-arithmetic discipline."""
    assert compare_frames(
        pd.DataFrame({"m": [2.675]}), pd.DataFrame({"m": [2.675]})
    ) == []
    problems = compare_frames(
        pd.DataFrame({"m": [2.67]}), pd.DataFrame({"m": [2.68]})
    )
    assert len(problems) == 1 and "values differ" in problems[0]


def test_row_count_and_column_name_failures_short_circuit():
    """Rule: column-name mismatch reports alone (no value noise); row
    count mismatch reports before any value comparison."""
    problems = compare_frames(
        pd.DataFrame({"a": [1]}), pd.DataFrame({"b": [1]})
    )
    assert len(problems) == 1 and problems[0].startswith("column mismatch")
    problems = compare_frames(
        pd.DataFrame({"a": [1, 2]}), pd.DataFrame({"a": [1]})
    )
    assert len(problems) == 1 and problems[0].startswith("row count")


def test_normalize_frame_is_stable_and_pure():
    """Rule: normalize_frame never mutates its input and is idempotent —
    the comparator can be re-entered (driver retries) without drift."""
    df = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    snapshot = df.copy(deep=True)
    once = normalize_frame(df)
    pd.testing.assert_frame_equal(df, snapshot)
    pd.testing.assert_frame_equal(normalize_frame(once), once)
