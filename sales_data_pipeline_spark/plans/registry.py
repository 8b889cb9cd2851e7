"""Registry for the engine's query catalog.

Each entry pairs a Spark DataFrame program with an equivalent ANSI-SQL
oracle (run by DuckDB over the same parquet). The pair is the engine's
correctness contract: identical column names, identical row sets,
bitwise-identical values. Queries whose semantics are genuinely not
SQL-expressible (LSH, stateful streaming) carry ``oracle=None`` and are
covered by property tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    headline: bool = False  # include in bench.py's timed set


QUERIES: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or ""), headline=headline
        )
        return fn

    return deco
