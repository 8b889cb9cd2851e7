"""The spark.sql surface: catalog views must be queryable with raw SQL
and agree with the DataFrame API over the same relations (the
reference's users query marts with raw SQL — switching engines must not
take that away)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sales_data_pipeline_spark.catalog import TABLES, load_tables


def test_views_registered_and_sql_matches_dataframe(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    assert set(tables) == set(TABLES)
    registered = {t.name for t in spark.catalog.listTables()}
    assert set(TABLES) <= registered

    got = spark.sql(
        """
        SELECT n.n_name AS nation, COUNT(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    want = (
        tables["customer"]
        .join(tables["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sql_over_events_view_handles_nanos(spark, sf_dir):
    """The nanos-timestamp normalization must hold on the SQL surface
    too (ts usable as a real timestamp in raw SQL)."""
    load_tables(spark, sf_dir)
    row = spark.sql(
        "SELECT MIN(ts) AS lo, MAX(ts) AS hi, COUNT(*) AS n FROM events"
    ).collect()[0]
    assert row.n > 0
    assert row.lo.year >= 2000 and row.hi.year < 2100  # sane timestamps
