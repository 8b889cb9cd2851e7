"""range_join edge cases: boundary inclusivity, bin-boundary spanning,
multi-interval overlap (the oracle-parity test covers the events table)."""

from __future__ import annotations

import datetime as dt

from sales_data_pipeline_spark.operators.range_join import range_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_range_join_boundaries_and_bins(spark):
    points = spark.createDataFrame(
        [
            (1, 100, _ts(0)),     # == start: included
            (2, 100, _ts(599)),   # inside, same bin as start
            (3, 100, _ts(650)),   # inside, NEXT bin (interval spans bins)
            (4, 100, _ts(700)),   # == end: excluded
            (5, 100, _ts(10_000)),  # far outside
            (6, 999, _ts(100)),   # right ts, wrong key
        ],
        "pid long, k long, t timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, _ts(0), _ts(700), "w1")],
        "k long, s timestamp, e timestamp, label string",
    )
    out = range_join(
        points, intervals, key="k", point_ts="t", start_ts="s", end_ts="e",
        bin_width_seconds=600,
    )
    assert sorted(r.pid for r in out.collect()) == [1, 2, 3]


def test_range_join_overlapping_intervals_no_dedup_artifacts(spark):
    """A point inside two overlapping intervals matches both, exactly
    once each (the single-bin-per-point property)."""
    points = spark.createDataFrame([(1, 7, _ts(50))], "pid long, k long, t timestamp")
    intervals = spark.createDataFrame(
        [(7, _ts(0), _ts(100), "a"), (7, _ts(40), _ts(60), "b"), (7, _ts(60), _ts(90), "c")],
        "k long, s timestamp, e timestamp, label string",
    )
    out = range_join(
        points, intervals, key="k", point_ts="t", start_ts="s", end_ts="e",
        bin_width_seconds=30,
    )
    assert sorted(r.label for r in out.collect()) == ["a", "b"]
