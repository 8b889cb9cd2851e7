"""Mirror of the driver's t2 gate: every catalog query with an oracle
must match DuckDB on row count, columns, and bitwise values."""

from __future__ import annotations

import pytest

from sales_data_pipeline_spark.plans import QUERIES
from sales_data_pipeline_spark.testing import compare_frames, duckdb_oracle

_WITH_ORACLE = [name for name, q in QUERIES.items() if q.oracle is not None]
_NO_ORACLE = [name for name, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = QUERIES[name]
    got = q.fn(spark, sf_dir).toPandas()
    want = duckdb_oracle(sf_dir, q.oracle)
    problems = compare_frames(got, want)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_runs_and_returns_rows(spark, sf_dir, name):
    """Non-SQL-expressible queries still must run and produce a stable schema."""
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.columns, name
    df.limit(5).collect()  # executes the plan


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(QUERIES)
