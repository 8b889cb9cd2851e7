"""range_join edge cases: boundary inclusivity, bin-boundary spanning,
multi-interval overlap (the oracle-parity test covers the events table)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

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


def test_interval_overlap_join_matches_naive_and_emits_once(spark):
    """Bucketed interval-overlap join must equal the naive quadratic
    join EXACTLY (every overlapping pair once, non-overlapping never)
    across bin widths — including pairs that share many bins and pairs
    that straddle bin boundaries."""
    import datetime as _dt

    from sales_data_pipeline_spark.operators.range_join import interval_overlap_join

    base = _dt.datetime(2024, 1, 1)

    def T(s):
        return base + _dt.timedelta(seconds=s)

    rows = [
        # (key, id, start_s, end_s)
        (1, 1, 0, 1000), (1, 2, 500, 1500),     # long overlap, many shared bins
        (1, 3, 1500, 1600),                     # touches id2 only at boundary (half-open: no)
        (1, 4, 1590, 1700),                     # overlaps id3
        (2, 5, 0, 100), (2, 6, 200, 300),       # same key, disjoint
        (3, 7, 0, 50), (1, 8, 0, 10),           # cross-key isolation; id8 overlaps id1
    ]
    df = spark.createDataFrame(
        [(k, i, T(s), T(e)) for k, i, s, e in rows],
        "k int, id int, s timestamp, e timestamp",
    )
    a = df.select("k", F.col("id").alias("id_a"), F.col("s").alias("sa"), F.col("e").alias("ea"))
    b = df.select("k", F.col("id").alias("id_b"), F.col("s").alias("sb"), F.col("e").alias("eb"))
    naive = (
        a.join(b, "k")
        .filter((F.col("id_a") < F.col("id_b"))
                & (F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea")))
        .select("id_a", "id_b")
    )
    want = sorted(map(tuple, naive.collect()))
    for width in (60, 300, 1024, 7):
        got = (
            interval_overlap_join(a, b, "k", "sa", "ea", "sb", "eb",
                                  bin_width_seconds=width)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .collect()
        )
        got = sorted(map(tuple, got))
        assert got == want, (width, got, want)


def test_interval_overlap_join_drops_degenerate_intervals(spark):
    """Empty/inverted half-open intervals (end <= start) contain
    nothing and must match nothing — not emit bogus pairs via a
    descending bin sequence."""
    import datetime as _dt

    from sales_data_pipeline_spark.operators.range_join import interval_overlap_join

    base = _dt.datetime(2024, 1, 1)

    def T(s):
        return base + _dt.timedelta(seconds=s)

    a = spark.createDataFrame(
        [(1, 1, T(100), T(50)), (1, 2, T(0), T(0))],  # inverted + empty
        "k int, id_a int, sa timestamp, ea timestamp",
    )
    b = spark.createDataFrame(
        [(1, 9, T(0), T(1000))], "k int, id_b int, sb timestamp, eb timestamp"
    )
    assert interval_overlap_join(a, b, "k", "sa", "ea", "sb", "eb").count() == 0
