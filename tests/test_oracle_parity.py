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


def test_parity_harness_is_type_strict(spark, duck):
    """The r02 red row (doc_pack_plan) was a DuckDB HUGEINT promotion the
    value-only local harness missed; assert_parity must now reject it."""
    df = spark.range(2).selectExpr("CAST(3 AS BIGINT) AS s")
    good = "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1),(2)) t(x)"
    bad = "SELECT SUM(x) AS s FROM (VALUES (1),(2)) t(x)"  # HUGEINT
    assert_parity(df.limit(1), duck, good)
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_parity(df.limit(1), duck, bad)
    # int-vs-float kind mismatch with equal values must also be caught
    with pytest.raises(AssertionError, match="type-class"):
        assert_parity(df.limit(1), duck, "SELECT CAST(3 AS DOUBLE) AS s")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
