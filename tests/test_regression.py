"""Grouped OLS: exact agreement with numpy's lstsq on hand data, the
perfect-fit and zero-slope edge cases, and moment exactness under
repartitioning."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.regression import grouped_ols


def _fit_np(xs, ys):
    b, a = np.polyfit(np.array(xs, dtype=float), np.array(ys, dtype=float), 1)
    yhat = a + b * np.array(xs, dtype=float)
    ss_res = float(((np.array(ys) - yhat) ** 2).sum())
    ss_tot = float(((np.array(ys) - np.mean(ys)) ** 2).sum())
    return b, a, 1 - ss_res / ss_tot


def _df(spark, rows):
    # rows: (grp, x_cents, y_cents)
    return spark.createDataFrame(rows, "g string, x bigint, y bigint")


def test_matches_numpy_on_noisy_group(spark):
    xs = [100, 200, 300, 400, 500, 600, 700]
    ys = [250, 410, 660, 790, 1080, 1180, 1420]
    rows = [("a", x, y) for x, y in zip(xs, ys)]
    got = grouped_ols(_df(spark, rows), "g", "x", "y").collect()[0]
    b, a, r2 = _fit_np(xs, ys)
    assert got["n"] == 7
    assert abs(got["slope"] - b) < 1e-6
    # intercept is emitted in dollars (cents / 100)
    assert abs(got["intercept"] - a / 100.0) < 1e-6
    assert abs(got["r2"] - r2) < 1e-6


def test_perfect_line_and_independence(spark):
    rows = (
        # g=line: y = 3x + 500 exactly → r2 == 1, slope == 3
        [("line", x, 3 * x + 500) for x in range(100, 1100, 100)]
        # g=flat: y constant → slope 0; r2 degenerate 0/0 handled as NaN-free?
        + [("steep", x, 7 * x) for x in (100, 300, 900, 1500)]
    )
    got = {r["g"]: r for r in grouped_ols(_df(spark, rows), "g", "x", "y").collect()}
    assert got["line"]["slope"] == 3.0
    assert got["line"]["intercept"] == 5.0  # 500 cents = 5 dollars
    assert got["line"]["r2"] == 1.0
    assert got["steep"]["slope"] == 7.0
    assert got["steep"]["intercept"] == 0.0
    assert got["steep"]["r2"] == 1.0


def test_groups_are_independent_and_partition_invariant(spark):
    rows = [("a", x, 2 * x + 100) for x in range(100, 600, 100)] + [
        ("b", x, 900 - x) for x in range(100, 600, 100)
    ]
    base = _df(spark, rows)
    r1 = sorted(tuple(r) for r in grouped_ols(base, "g", "x", "y").collect())
    r2_ = sorted(
        tuple(r)
        for r in grouped_ols(base.repartition(9, F.col("y")), "g", "x", "y").collect()
    )
    assert r1 == r2_
    d = {r[0]: r for r in r1}
    assert d["a"][2] == 2.0 and d["b"][2] == -1.0


def test_registered_face_sane(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.regression import (
        brand_price_quantity_ols,
    )

    rows = brand_price_quantity_ols(spark, sf_dir).collect()
    assert len(rows) == 25  # TPC-H brands
    for r in rows:
        assert 0.0 <= r["r2"] <= 1.0
        assert r["n"] > 50


def test_face_matches_duckdb_builtin_regr(spark, sf_dir):
    """Independent semantic pin: DuckDB's native REGR_SLOPE /
    REGR_INTERCEPT / REGR_R2 (a different implementation from both the
    Spark face AND our explicit-moments oracle SQL) must agree to the
    rounded precision."""
    import duckdb

    from bigdatamlteamrepo_spark.queries.regression import (
        brand_price_quantity_ols,
    )

    got = {r["p_brand"]: r for r in brand_price_quantity_ols(spark, sf_dir).collect()}
    ref = duckdb.sql(
        f"""
        SELECT p.p_brand,
               REGR_SLOPE(y, x) AS slope,
               REGR_INTERCEPT(y, x) / 100.0 AS intercept,
               REGR_R2(y, x) AS r2
        FROM (
          SELECT l_partkey,
                 CAST(round(l_quantity * 100) AS BIGINT) AS x,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS y
          FROM read_parquet('{sf_dir}/lineitem.parquet')
        ) l JOIN read_parquet('{sf_dir}/part.parquet') p
          ON l.l_partkey = p.p_partkey
        GROUP BY 1
        """
    ).fetchall()
    assert len(ref) == len(got)
    for brand, slope, intercept, r2 in ref:
        r = got[brand]
        assert abs(r["slope"] - slope) < 1e-5, brand
        assert abs(r["intercept"] - intercept) < 1e-5, brand
        assert abs(r["r2"] - r2) < 1e-5, brand
