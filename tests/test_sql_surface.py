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


def test_event_ts_normalized_across_parquet_encodings(spark, tmp_path):
    """catalog.normalize_event_ts must map all three historical parquet
    encodings of events.ts (long nanos, TIMESTAMP_NTZ micros, plain
    TIMESTAMP) to the SAME session-tz instants, so epoch math is
    encoding-independent."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.catalog import normalize_event_ts

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    times = [base, base + dt.timedelta(seconds=90, microseconds=250_000)]
    expected_us = [int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
                   for t in times]

    variants = {
        "ntz": pa.table({"ts": pa.array(times, type=pa.timestamp("us"))}),
        "ltz": pa.table({"ts": pa.array(times, type=pa.timestamp("us", tz="UTC"))}),
        "nanos": pa.table({"ts": pa.array(times, type=pa.timestamp("ns"))}),
    }
    for name, tbl in variants.items():
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(tbl, path)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_event_ts(spark.read.parquet(path))
        assert df.schema["ts"].dataType.typeName() == "timestamp", name
        got = [r[0] for r in
               df.select(F.unix_micros("ts")).orderBy("ts").collect()]
        assert got == expected_us, (name, got, expected_us)
