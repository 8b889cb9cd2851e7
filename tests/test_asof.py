"""asof_join semantics on hand-built cases (the oracle-parity test
covers the events table; these pin the edge cases)."""

from __future__ import annotations

import datetime as dt

from sales_data_pipeline_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(5)), (3, 100, _ts(0)), (4, 200, _ts(50))],
        "id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(5), 1.0), (100, _ts(8), 2.0), (100, _ts(20), 9.0), (300, _ts(0), 7.0)],
        "k long, t timestamp, v double",
    )
    return left, right


def test_asof_picks_latest_prior(spark):
    left, right = _frames(spark)
    out = {
        r.id: (r.t_asof, r.v_asof)
        for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()
    }
    assert out[1] == (_ts(8), 2.0)  # latest of {5, 8} ≤ 10
    assert out[2] == (_ts(5), 1.0)  # equal timestamp IS visible (non-strict)
    assert out[3] == (None, None)  # no prior right row
    assert out[4] == (None, None)  # key with no right rows at all (left join)


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        r.id: (r.t_asof, r.v_asof)
        for r in asof_join(left, right, "k", "t", "t", ["v"], strict=True).collect()
    }
    assert out[2] == (None, None)  # t=5 right row no longer visible at t=5
    assert out[1] == (_ts(8), 2.0)  # strictly-prior rows unaffected


def test_asof_preserves_left_rowcount(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, "k", "t", "t", ["v"]).count() == left.count()
