"""Schema-evolution contract reads (sources/evolution.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sales_data_pipeline_spark.sources.evolution import read_parquet_evolved

CONTRACT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("note", T.StringType()),
    ]
)


def _write(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


def test_added_column_backfills_typed_null(spark, tmp_path):
    p = str(tmp_path / "data")
    _write(spark.createDataFrame([(1,)], "id int"), p)                 # v1
    _write(spark.createDataFrame([(2, 2.5, "hi")],
                                 "id int, amount double, note string"), p)  # v2
    out = read_parquet_evolved(spark, p, CONTRACT)
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(), T.DoubleType(), T.StringType()]
    rows = {r.id: (r.amount, r.note) for r in out.collect()}
    assert rows == {1: (None, None), 2: (2.5, "hi")}


def test_widening_int_to_long_and_float_to_double(spark, tmp_path):
    p = str(tmp_path / "data")
    _write(
        spark.createDataFrame([(7, 1.5, "x")], "id int, amount float, note string"),
        p,
    )
    out = read_parquet_evolved(spark, p, CONTRACT)
    r = out.collect()[0]
    assert r.id == 7 and abs(r.amount - 1.5) < 1e-9 and r.note == "x"
    assert dict(out.dtypes)["id"] == "bigint"
    assert dict(out.dtypes)["amount"] == "double"


def test_narrowing_refused_at_plan_time(spark, tmp_path):
    p = str(tmp_path / "data")
    _write(
        spark.createDataFrame(
            [(2**40, 1.0, "x")], "id long, amount double, note string"
        ),
        p,
    )
    narrow = T.StructType(
        [
            T.StructField("id", T.IntegerType()),  # bigint file -> int: corrupt
            T.StructField("amount", T.DoubleType()),
            T.StructField("note", T.StringType()),
        ]
    )
    with pytest.raises(ValueError, match="id: on-disk bigint"):
        read_parquet_evolved(spark, p, narrow)


def test_extra_columns_dropped_and_order_pinned(spark, tmp_path):
    p = str(tmp_path / "data")
    _write(
        spark.createDataFrame(
            [("junk", 3, 9.0, "y", True)],
            "debug string, id int, amount double, note string, flag boolean",
        ),
        p,
    )
    out = read_parquet_evolved(spark, p, CONTRACT)
    assert out.columns == ["id", "amount", "note"]


def test_string_widening_allowlisted(spark, tmp_path):
    p = str(tmp_path / "data")
    _write(spark.createDataFrame([(1, 5, "z")], "id int, amount int, note string"), p)
    # amount int -> contract double: allowed (int widens to double)
    out = read_parquet_evolved(spark, p, CONTRACT)
    assert out.collect()[0].amount == 5.0
    # but double on disk -> int contract refused
    p2 = str(tmp_path / "d2")
    _write(spark.createDataFrame([(1, 5.5, "z")],
                                 "id int, amount double, note string"), p2)
    bad = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.IntegerType()),
            T.StructField("note", T.StringType()),
        ]
    )
    with pytest.raises(ValueError, match="amount: on-disk double"):
        read_parquet_evolved(spark, p2, bad)
