"""Driver-style parity: every registered query with an oracle must match
DuckDB on row count, sorted column names, and normalized values."""

from __future__ import annotations

import pytest

from bigdatamlteamrepo_spark.queries import ORACLE, QUERIES
from tests.conftest import assert_parity


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_parity(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert_parity(df, duck, ORACLE[name])


def test_all_queries_run(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
