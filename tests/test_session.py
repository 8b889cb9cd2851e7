"""Session factory defaults that encode measured operational lessons.

Each conf pinned here exists because of a measured finding; the test
names the artifact so the pin can't silently rot away from its
justification.
"""

from __future__ import annotations

from sales_data_pipeline_spark.session import _BASE_CONF


def test_aqe_skew_split_is_forced():
    """SKEW.md §2c measured AQE recording ZERO skew-join splits on a
    24×-skewed join because its output fed an aggregation (the split
    adds a shuffle, the cost model vetoes it). forceOptimizeSkewedJoin
    accepts the extra shuffle — measured 11.6s → 2.0s on the zipf
    corpus. The conf must ship on by default, not live in a runbook."""
    assert _BASE_CONF["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert _BASE_CONF["spark.sql.adaptive.forceOptimizeSkewedJoin"] == "true"


def test_session_fixture_carries_the_skew_confs(spark):
    """The conf reaches live sessions built by the factory (the same
    path every tool/bench/test session takes)."""
    assert spark.conf.get("spark.sql.adaptive.forceOptimizeSkewedJoin") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_base_conf_bounds_dead_shuffle_files_via_periodic_gc():
    """Shuffle files of finished stages are freed only when the driver
    GCs (ContextCleaner weak refs). Measured r10: a 48 GiB-heap
    campaign never GC'd, accumulated ~60 GiB of dead shuffle spill and
    died on ENOSPC. The 60s periodic-GC backstop must ship by default."""
    assert _BASE_CONF["spark.cleaner.periodicGC.interval"] == "60s"
