"""Registry invariants: the driver checks only the first 50 exported
queries, so the window composition is itself a tested contract."""

from __future__ import annotations

import __spark_entry__ as entry


def test_driver_window_is_fully_oracle_paired():
    qs = list(entry.queries())
    oracle = entry.oracle_sql()
    window = qs[:50]
    unpaired = [q for q in window if q not in oracle]
    assert not unpaired, f"driver window contains rows-only queries: {unpaired}"


def test_oracle_keys_subset_of_queries():
    assert set(entry.oracle_sql()) <= set(entry.queries())


def test_no_duplicate_registrations():
    from bigdatamlteamrepo_spark.queries.registry import QUERIES, _ORDER

    assert len(QUERIES) == len(_ORDER)
