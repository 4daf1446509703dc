"""Shared fixtures: one SparkSession per test session, a DuckDB oracle
connection with the driver tables registered as views, and a parity
checker that mimics the driver's row-count + schema + order-insensitive
value-hash comparison."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatamlteamrepo_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        app_name="bigdatamlteamrepo-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "6g",
            # static conf — must be set before the JVM session exists
            # (bucketed-table tests saveAsTable into this warehouse)
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(val):
    """Normalize one cell for order-insensitive comparison."""
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # Collapse FP noise below what our queries guarantee (queries
        # round/decimal-stabilize anything coarser than this).
        return round(val, 9)
    if isinstance(val, (list, tuple)):
        return tuple(_normalize(v) for v in val)
    if hasattr(val, "isoformat"):  # datetime/date
        return val.isoformat()
    return val


def rows_multiset(rows, colnames):
    """Sort columns by name (driver contract), normalize, return sorted rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def assert_parity(spark_df, duck_con, sql, check_types=True):
    """Driver-style comparison between a Spark DataFrame and DuckDB SQL."""
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).fetchdf()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(sdf) == len(ddf), f"row count mismatch: spark={len(sdf)} duck={len(ddf)}"
    s_rows = rows_multiset(sdf.itertuples(index=False, name=None), list(sdf.columns))
    d_rows = rows_multiset(ddf.itertuples(index=False, name=None), list(ddf.columns))
    mism = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mism, f"value mismatch ({len(mism)} rows); first: {mism[:3]}"
