"""Query registry: each engine capability registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible,
its ANSI-SQL oracle twin for DuckDB (driver contract in
``__spark_entry__.py``).

The registry is the single source of truth consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``, ``bench.py``, and the
parity tests.

Driver-window rotation (VERDICT_r7 item #7): the driver's correctness
harness checks only the FIRST 50 exported queries, so that window must
always hold the queries with the weakest driver evidence.  Earlier
rounds curated the window with hand-maintained tier lists; those lists
could silently omit a query.  The rotation is now DERIVED from the
in-repo ``CORRECTNESS_r*.json`` ledger at import time:

* no-oracle (rows-only) queries never enter the window — they surface
  as non-green-looking driver rows (the r03 lesson);
* oracle-paired queries that were never driver-checked, or whose
  LATEST driver check was not hash-green, come first (new
  registrations are "never checked" by construction, so a fresh
  query claims a window slot automatically);
* green oracle-paired queries rotate by staleness: a query last
  verified in round r sorts at ``40 + r``, so the oldest evidence is
  refreshed first and each round's window self-updates when the
  driver writes the next ledger file.

``tests/test_registry_rotation.py`` pins window == f(ledger).

**Steady-state size policy (VERDICT_r9 #7)**: with a 50-query window
per round, worst-case driver-evidence age for a green query is
``ceil(n_oracle_paired / 50)`` rounds — 5 rounds at the current ~225.
The registry is CAPPED at 250 oracle-paired queries (age bound 5;
``tests/test_registry.py`` enforces it): past the cap, a new face must
displace a family-redundant one (deregistration drops only the driver
rotation slot — the operator keeps its pytest pins, which are the
stronger per-semantics checks anyway).  Rationale: driver evidence is
a CROSS-ENGINE parity spot-check, not the primary correctness story;
five-round-old parity on a frozen query is fine, but an unbounded
registry would push the age past what a 20-round build ever refreshes.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable
from functools import lru_cache

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

#: oracle-paired with no green driver row at its latest check (or never
#: checked at all — which includes every query first registered this
#: round): first picks for the driver window
PRI_UNPROVEN = 30
#: green oracle-paired queries sort at ``PRI_GREEN_BASE + round`` —
#: stalest driver evidence first
PRI_GREEN_BASE = 40
#: rows-only queries (no DuckDB oracle): stay OUT of driver windows by
#: design; fully covered by the local pytest suite instead
PRI_ROWS_ONLY = 90

#: retained ONLY for call-site compatibility: window order is fully
#: ledger-derived and these constants (like the decorator's
#: ``priority`` argument) have NO effect on placement — do not pass
#: them expecting to curate the window
PRI_CORE = 50
PRI_EXTRA = 90
PRI_NEW = 30

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


@lru_cache(maxsize=1)
def ledger() -> dict[str, tuple[int, bool]]:
    """Latest driver-check evidence per query from the in-repo
    ``CORRECTNESS_r*.json`` files: ``name -> (round, green)`` where
    green = rows+schema+hash matched with no error."""
    latest: dict[str, tuple[int, bool]] = {}
    pat = os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")
    for path in sorted(glob.glob(pat)):
        base = os.path.basename(path)
        try:
            rnd = int(base.split("_r")[-1].split(".")[0])
            with open(path) as f:
                data = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, res in data.items():
            green = bool(
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
                and not res.get("err")
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, green)
    return latest


def window_priority(name: str, has_oracle: bool) -> int:
    """Ledger-derived driver-window priority (lower = earlier)."""
    if not has_oracle:
        return PRI_ROWS_ONLY
    entry = ledger().get(name)
    if entry is None or not entry[1]:
        return PRI_UNPROVEN
    return PRI_GREEN_BASE + entry[0]


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    priority: int = PRI_CORE,
):
    """Decorator registering a query (and optional oracle SQL / bench
    flag).  Window order is derived ENTIRELY from the correctness
    ledger via :func:`window_priority`; the ``priority`` parameter is
    accepted for call-site compatibility and IGNORED — rows-only
    demotion and staleness rotation cannot be overridden by hand."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        _ORDER[name] = (window_priority(name, oracle is not None), len(_ORDER))
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
