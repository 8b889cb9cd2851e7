"""Fixed-width (columnar text) source — the mainframe/ERP export format.

Completes the ingestion matrix beside CSV (sources/csv.py), JSONL,
XML, JDBC, and binaryFile: many upstream billing/inventory systems
still land fixed-width exports where fields are POSITIONS, not
delimiters. The reference's contract-validation stance (SURVEY §2a
S1-S2: explicit schema, quarantine what violates it) is applied at row
level here:

- a declarative ``FixedWidthField`` layout (name, start, width, type)
  drives pure-codegen ``substring`` + ``trim`` + ``cast`` extraction —
  one pass, JVM-side, no Python per row;
- rows SHORTER than the layout demands are routed to a corrupt column
  (the CSV contract's PERMISSIVE policy at line granularity): casts of
  truncated garbage must never silently produce wrong values;
- numeric fields that fail their cast become NULL with the raw line
  preserved in the corrupt column, so `split_corrupt`-style routing
  (sources/jsonl.py) works unchanged downstream.

Scale: text source + substring projections — splittable files,
whole-stage codegen, filter/limit pushdown as for any text scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_spark.schemas import CORRUPT_RECORD_COLUMN

# the raw-text reader's column plus our internals — layouts must not
# shadow them (two same-named columns in one projection is an
# AMBIGUOUS_REFERENCE analysis error)
_RESERVED = {"value", "__len", CORRUPT_RECORD_COLUMN}


@dataclass(frozen=True)
class FixedWidthField:
    name: str
    start: int  # 1-based character position (COBOL copybook convention)
    width: int
    dtype: str = "string"  # any Spark cast target: int, date, decimal(10,2), ...


def read_fixed_width(
    spark: SparkSession,
    path: str | list[str],
    layout: list[FixedWidthField],
    trim: bool = True,
) -> DataFrame:
    """One-pass fixed-width read. Returns the layout's columns plus
    ``_corrupt_line`` (NULL for clean rows; the raw line for rows
    shorter than the layout or failing a numeric/date cast)."""
    if not layout:
        raise ValueError("empty layout")
    names = [f.name for f in layout]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate field names in layout: {names}")
    clash = set(names) & _RESERVED
    if clash:
        raise ValueError(
            f"layout field names {sorted(clash)} are reserved (raw-text "
            "column / internals); rename them in the layout"
        )
    for f_ in layout:
        if f_.start < 1 or f_.width < 1:
            raise ValueError(
                f"field {f_.name!r}: start must be >= 1 and width >= 1 "
                "(copybook positions are 1-based)"
            )
    min_len = max(f.start + f.width - 1 for f in layout)
    raw = spark.read.text(path)
    cols = []
    for f_ in layout:
        c = F.substring(F.col("value"), f_.start, f_.width)
        if trim:
            c = F.trim(c)
        # empty string → NULL before the cast (blank-padded fields)
        c = F.when(c == "", None).otherwise(c)
        if f_.dtype != "string":
            # try_cast, not cast: ANSI mode (Spark 4 default) makes a
            # malformed cast kill the job; the contract wants the row
            # QUARANTINED instead
            c = c.try_cast(f_.dtype)
        cols.append(c.alias(f_.name))
    parsed = raw.select(F.length("value").alias("__len"), F.col("value"), *cols)
    # corrupt = too short, or any non-string field that was non-blank
    # in the raw line but cast to NULL
    cast_failed = F.lit(False)
    for f_ in layout:
        if f_.dtype == "string":
            continue
        raw_piece = F.trim(F.substring(F.col("value"), f_.start, f_.width))
        cast_failed = cast_failed | (
            (raw_piece != "") & F.col(f_.name).isNull()
        )
        if f_.dtype.lower().startswith("decimal"):
            # try_cast into a narrow decimal silently ROUNDS an
            # over-precise value (e.g. "1.239" → decimal(10,2) 1.24)
            # instead of failing — the contract wants precision
            # violations QUARANTINED, not smuggled in rounded. Detect
            # by comparing against a max-precision recast of the raw
            # slice: any value the target scale can't hold exactly
            # compares unequal (decimal compares are numeric, so
            # trailing-zero formatting doesn't false-positive).
            # Only sound while the declared scale fits inside the wide
            # type's 18: above that the decimal(38,18) recast itself
            # rounds, and exactly-stored values would be falsely
            # quarantined — such a layout is a contract error, not a
            # data error, so fail loudly at plan time.
            m = re.match(
                r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", f_.dtype.lower()
            )
            if m and int(m.group(2)) > 18:
                raise ValueError(
                    f"fixed-width field {f_.name!r}: declared scale "
                    f"{m.group(2)} exceeds the over-precision "
                    "detector's decimal(38,18) reference scale; use "
                    "scale <= 18 or widen the detector"
                )
            wide = F.when(raw_piece == "", None).otherwise(
                raw_piece
            ).try_cast("decimal(38,18)")
            cast_failed = cast_failed | (
                F.col(f_.name).isNotNull()
                & wide.isNotNull()
                & (F.col(f_.name) != wide)
            )
    is_corrupt = (F.col("__len") < min_len) | cast_failed
    return parsed.select(
        *[f_.name for f_ in layout],
        F.when(is_corrupt, F.col("value")).alias(CORRUPT_RECORD_COLUMN),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, corrupt raw lines).

    Same shared ``CORRUPT_RECORD_COLUMN`` contract as the CSV/JSONL
    sources, so downstream quarantine tooling keyed on that column
    sees fixed-width rejects too. (jsonl.split_corrupt is not reused
    directly: its persist workaround targets a JSON-reader-specific
    restriction this text-derived frame doesn't have.)"""
    clean = df.filter(F.col(CORRUPT_RECORD_COLUMN).isNull()).drop(
        CORRUPT_RECORD_COLUMN
    )
    bad = df.filter(F.col(CORRUPT_RECORD_COLUMN).isNotNull()).select(
        F.col(CORRUPT_RECORD_COLUMN).alias("raw_line")
    )
    return clean, bad
