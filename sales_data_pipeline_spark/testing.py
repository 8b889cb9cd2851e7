"""Oracle-parity harness — a local mirror of the driver's t2 gate.

Runs a catalog query on Spark and its ANSI-SQL oracle on DuckDB over the
same parquet, then compares row count, column names, and values
(order-insensitive, bitwise for floats). Used by tests/test_oracle_parity.py
so every oracle mismatch is caught before the driver sees it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, numeric widths unified,
    rows sorted by every column (string key for cross-type stability)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dtype = df[c].dtype
        if pd.api.types.is_integer_dtype(dtype):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dtype):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dtype):
            df[c] = df[c].astype("datetime64[us]")
    if len(df) and len(df.columns):
        key = df.apply(lambda col: col.map(repr), axis=0).agg("|".join, axis=1)
        df = df.iloc[np.argsort(key.to_numpy(), kind="stable")]
    return df.reset_index(drop=True)


def compare_frames(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Differences between engine result and oracle result; [] == parity."""
    problems: list[str] = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"column mismatch: engine={sorted(got.columns)} oracle={sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"row count: engine={len(got)} oracle={len(want)}")
        return problems
    # The driver hashes *typed* values, so an int64-vs-float64 drift that
    # width-unification below would hide (e.g. an uncast DuckDB HUGEINT sum
    # arriving as float64) must fail here too.
    for c in sorted(got.columns):
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} == {"i", "f"} or {gk, wk} == {"u", "f"}:
            problems.append(
                f"column {c!r} dtype kind mismatch: engine={got[c].dtype} "
                f"oracle={want[c].dtype} (cast the oracle, cf. CAST(... AS BIGINT))"
            )
    if problems:
        return problems
    g, w = normalize_frame(got), normalize_frame(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if pd.api.types.is_float_dtype(g[c].dtype) and pd.api.types.is_float_dtype(w[c].dtype):
            ok = np.array_equal(gv, wv, equal_nan=True)
        else:
            ok = (pd.isna(gv) & pd.isna(wv)) | (gv == wv)
            ok = bool(np.asarray(ok).all())
        if not ok:
            mism = _first_mismatch(gv, wv)
            problems.append(f"column {c!r} values differ; first mismatch at row {mism}: "
                            f"engine={gv[mism]!r} oracle={wv[mism]!r}")
    return problems


def _first_mismatch(a: np.ndarray, b: np.ndarray) -> int:
    for i, (x, y) in enumerate(zip(a, b)):
        both_nan = (
            isinstance(x, float) and isinstance(y, float) and np.isnan(x) and np.isnan(y)
        )
        if not both_nan and x != y and not (pd.isna(x) and pd.isna(y)):
            return i
    return -1


def duckdb_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    """Run oracle SQL over the same parquet tables (views per TESTDATA.md)."""
    import duckdb

    from sales_data_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()
