"""Fixed-width source: positional extraction, typed casts, corrupt-row
routing (sources/fixed_width.py)."""

from __future__ import annotations

import datetime as dt

from sales_data_pipeline_spark.sources.fixed_width import (
    FixedWidthField,
    read_fixed_width,
    split_corrupt,
)

LAYOUT = [
    FixedWidthField("order_id", 1, 6, "int"),
    FixedWidthField("cust", 7, 8, "string"),
    FixedWidthField("amount", 15, 10, "decimal(10,2)"),
    FixedWidthField("day", 25, 10, "date"),
]


def _write(tmp_path, lines):
    p = tmp_path / "fw.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _line(oid, cust, amount, day):
    return f"{oid:0>6}{cust:<8}{amount:>10}{day:<10}"


def test_fixed_width_happy_path(spark, tmp_path):
    path = _write(tmp_path, [
        _line("000042", "ALICE", "123.45", "1996-03-07"),
        _line("000043", "BOB", "10000.00", "2001-12-31"),
    ])
    clean, bad = split_corrupt(read_fixed_width(spark, path, LAYOUT))
    rows = {r.order_id: r for r in clean.collect()}
    assert bad.count() == 0
    assert rows[42].cust == "ALICE"
    assert float(rows[42].amount) == 123.45
    assert rows[42].day == dt.date(1996, 3, 7)
    assert float(rows[43].amount) == 10000.00


def test_fixed_width_short_and_bad_cast_rows_quarantined(spark, tmp_path):
    path = _write(tmp_path, [
        _line("000042", "ALICE", "123.45", "1996-03-07"),  # clean
        "000099BOB",                                        # too short
        _line("0000XX", "CAROL", "777.77", "2000-01-01"),  # id cast fails
        _line("000044", "DAVE", "BADAMT", "1999-06-01"),   # amount fails
    ])
    clean, bad = split_corrupt(read_fixed_width(spark, path, LAYOUT))
    assert {r.order_id for r in clean.collect()} == {42}
    raw = {r.raw_line for r in bad.collect()}
    assert len(raw) == 3
    assert any("BOB" in r for r in raw)
    assert any("CAROL" in r for r in raw)
    assert any("BADAMT" in r for r in raw)


def test_fixed_width_blank_field_is_null_not_corrupt(spark, tmp_path):
    # amount field entirely blank-padded → NULL amount, row stays clean
    path = _write(tmp_path, [
        _line("000042", "ALICE", "", "1996-03-07"),
    ])
    clean, bad = split_corrupt(read_fixed_width(spark, path, LAYOUT))
    assert bad.count() == 0
    row = clean.collect()[0]
    assert row.amount is None and row.order_id == 42


def test_fixed_width_overprecise_decimal_quarantined(spark, tmp_path):
    # try_cast into decimal(10,2) silently ROUNDS "123.456" to 123.46;
    # the contract routes precision violations to the corrupt column
    # instead (exact-width amounts only). A value the scale CAN hold
    # ("123.4", "123.40") stays clean.
    path = _write(tmp_path, [
        _line("000042", "ALICE", "123.456", "1996-03-07"),  # over-precise
        _line("000043", "BOB", "123.4", "1996-03-07"),      # fits scale 2
        _line("000044", "CAROL", "123.40", "1996-03-07"),   # trailing zero
    ])
    clean, bad = split_corrupt(read_fixed_width(spark, path, LAYOUT))
    assert {r.order_id for r in clean.collect()} == {43, 44}
    raw = {r.raw_line for r in bad.collect()}
    assert len(raw) == 1 and any("123.456" in r for r in raw)


def test_fixed_width_scale_beyond_detector_raises_at_plan_time(spark, tmp_path):
    """A declared scale > 18 would make the decimal(38,18) over-precision
    reference recast itself round, falsely quarantining exactly-stored
    values — such a layout is rejected loudly before any data is read."""
    import pytest

    layout = [
        FixedWidthField("order_id", 1, 6, "int"),
        FixedWidthField("tiny", 7, 24, "decimal(38,20)"),
    ]
    path = _write(tmp_path, ["000042" + "0.00000000000000000001".rjust(24)])
    with pytest.raises(ValueError, match="scale"):
        read_fixed_width(spark, path, layout)


# ---------------------------------------------------------------------------
# property test: random layouts round-trip (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_fw_settings = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_fw_settings)
@given(
    widths=st.lists(st.integers(3, 12), min_size=2, max_size=4),
    n_rows=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
def test_fixed_width_random_layouts_roundtrip(spark, tmp_path_factory, widths, n_rows, seed):
    """For ANY layout of int fields and ANY in-range values, formatting
    rows positionally and reading them back must reproduce every value
    with zero quarantined rows — and truncating the last line must
    quarantine exactly that line."""
    import random

    rng = random.Random(seed)
    start, layout = 1, []
    for i, w in enumerate(widths):
        layout.append(FixedWidthField(f"f{i}", start, w, "int"))
        start += w
    rows = [
        # int fields are 32-bit: cap wide columns at INT_MAX, not 10^w
        [rng.randint(0, min(10 ** (f.width - 1) - 1, 2**31 - 1)) for f in layout]
        for _ in range(n_rows)
    ]
    lines = [
        "".join(str(v).rjust(f.width) for v, f in zip(r, layout)) for r in rows
    ]
    tmp = tmp_path_factory.mktemp("fwfuzz")
    p = tmp / "data.txt"
    p.write_text("\n".join(lines) + "\n")
    clean, bad = split_corrupt(read_fixed_width(spark, str(p), layout))
    got = sorted(tuple(r[f.name] for f in layout) for r in clean.collect())
    assert got == sorted(map(tuple, rows))
    assert bad.count() == 0
    # truncate the final line below the layout width -> quarantined
    p2 = tmp / "trunc.txt"
    p2.write_text("\n".join(lines[:-1] + [lines[-1][: start - 3]]) + "\n")
    clean2, bad2 = split_corrupt(read_fixed_width(spark, str(p2), layout))
    assert clean2.count() == n_rows - 1
    assert bad2.count() == 1
