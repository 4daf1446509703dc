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
#: (priority, registration index) per query — the driver's correctness
#: harness checks only the FIRST 50 entries of ``queries()``, so exports
#: are sorted by priority; see :func:`ordered`
_ORDER: dict[str, tuple[int, int]] = {}

#: default priority — inside the driver window
PRI_CORE = 50
#: demoted: family-redundant or rows-only queries that yield their
#: driver slot to a query carrying new oracle evidence (still fully
#: covered by the local pytest parity suite)
PRI_EXTRA = 90


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    priority: int = PRI_CORE,
):
    """Decorator registering a query (and optional oracle SQL / bench
    flag).  ``priority`` curates the driver's 50-query correctness
    window: ascending order, ties broken by registration order."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        _ORDER[name] = (priority, len(_ORDER))
        if oracle is not None:
            ORACLE[name] = oracle
        if bench:
            BENCH_SET.append(name)
        return fn

    return deco


def ordered(mapping: dict[str, object]) -> dict:
    """``mapping`` re-keyed in (priority, registration) order."""
    return {
        n: mapping[n] for n in sorted(mapping, key=_ORDER.__getitem__)
    }
