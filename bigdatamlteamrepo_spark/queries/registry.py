"""Query registry: each engine capability registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible,
its ANSI-SQL oracle twin for DuckDB (driver contract in
``__spark_entry__.py``).

The registry is the single source of truth consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``, ``bench.py``, and the
parity tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
#: queries worth timing at sf0.1 (bench.py headline set)
BENCH_SET: list[str] = []


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator registering a query (and optional oracle SQL / bench flag)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        if bench:
            BENCH_SET.append(name)
        return fn

    return deco
