"""Approximate aggregates: accuracy bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.analytic import events_approx_stats


def test_approx_stats_bounds(spark, sf_dir):
    approx = {r.event_type: r for r in events_approx_stats(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        # HLL default rsd = 5%
        assert abs(a.approx_users - e.users) <= max(3, 0.15 * e.users)
        # KLL median within a loose band of exact median
        p50 = a.value_quantiles[0]
        spread = (
            ev.filter(F.col("event_type") == et)
            .agg((F.max("value") - F.min("value")).alias("s"))
            .first()
            .s
        )
        assert abs(p50 - e.p50) <= 0.1 * spread + 1e-9
        # quantiles are ordered
        q = a.value_quantiles
        assert q[0] <= q[1] <= q[2]


def test_hist_quantiles_bracket_crossing_rank(spark, duck, sf_dir):
    """The construction guarantee is in RANK space: the estimate is the
    lower edge of the bin holding the order statistic at rank ⌈q·n⌉, so
    it must bracket that exact order statistic to within one bin width
    (value-space distance to the interpolated quantile is unbounded in
    sparse tails, so that is NOT asserted)."""
    import math

    from bigdatamlteamrepo_spark.queries.pipeline import _HQ_BINS, _HQ_QS
    from bigdatamlteamrepo_spark.queries import QUERIES

    est = {
        r.event_type: r.asDict()
        for r in QUERIES["events_value_hist_quantiles"](spark, sf_dir).collect()
    }
    stats = duck.sql(
        f"SELECT event_type, MIN(value) mn, MAX(value) mx, COUNT(value) n "
        f"FROM '{sf_dir}/events.parquet' GROUP BY event_type"
    ).df()
    for _, row in stats.iterrows():
        width = (row.mx - row.mn) / _HQ_BINS
        for q in _HQ_QS:
            k = math.ceil(q * row.n)
            v_k = duck.sql(
                f"SELECT value FROM '{sf_dir}/events.parquet' "
                f"WHERE event_type = '{row.event_type}' AND value IS NOT NULL "
                f"ORDER BY value LIMIT 1 OFFSET {k - 1}"
            ).df().iloc[0, 0]
            e = est[row.event_type][f"p{int(q*100)}_est"]
            assert v_k - width * 1.001 <= e <= v_k + 1e-9, (
                row.event_type,
                q,
                e,
                v_k,
                width,
            )


def test_lineitem_correlations_match_numpy(spark, sf_dir):
    """Exact-integer-moment Pearson must agree with numpy's float64
    corrcoef to ~1e-6 on the real table (numpy reduces in float, ours
    in exact integers — agreement validates both)."""
    import numpy as np

    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries.analytic import (
        lineitem_numeric_correlations,
    )

    cols = {
        "quantity": "l_quantity",
        "price": "l_extendedprice",
        "discount": "l_discount",
        "tax": "l_tax",
    }
    pdf = load_table(spark, sf_dir, "lineitem").select(*cols.values()).toPandas()
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in lineitem_numeric_correlations(spark, sf_dir).collect()
    }
    assert len(got) == 6
    for (a, b), r in got.items():
        # quantize to cents exactly as the query does before comparing
        x = np.round(pdf[cols[a]].to_numpy() * 100)
        y = np.round(pdf[cols[b]].to_numpy() * 100)
        expect = np.corrcoef(x, y)[0, 1]
        assert abs(r - expect) < 2e-6, (a, b, r, expect)


def test_referential_integrity_detects_planted_orphans(spark, tmp_path):
    """The audit must report zero on the healthy tables and count
    planted orphans/null-FKs exactly on a corrupted copy."""
    import shutil

    from bigdatamlteamrepo_spark.queries.analytic import (
        referential_integrity_audit,
    )

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "corrupt")
    shutil.copytree(src, dst)
    healthy = {
        r["fk_edge"]: r
        for r in referential_integrity_audit(spark, src).collect()
    }
    assert all(
        r["n_orphans"] == 0 and r["n_null_fk"] == 0 for r in healthy.values()
    )
    # corrupt: 3 orphan custkeys + 2 null custkeys in orders
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{src}/orders.parquet")
    bad = orders.limit(5).withColumn(
        "o_custkey",
        F.when(F.monotonically_increasing_id() < 3, F.lit(-999)).otherwise(
            F.lit(None).cast("bigint")
        ),
    )
    orders.unionByName(bad).write.mode("overwrite").parquet(
        f"{dst}/orders.parquet"
    )
    got = {
        r["fk_edge"]: r
        for r in referential_integrity_audit(spark, dst).collect()
    }
    assert got["orders.custkey"]["n_orphans"] == 3
    assert got["orders.custkey"]["n_null_fk"] == 2
    assert got["nation.regionkey"]["n_orphans"] == 0


def test_orders_in_flight_matches_brute_force(spark, sf_dir):
    """The delta/prefix-sum curve must equal the brute-force 'count
    intervals covering each month' answer (inclusive close month)."""
    from pyspark.sql import functions as F

    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries.analytic import orders_in_flight_monthly

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = [
        (r["m_open"], r["m_close"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.greatest(F.max("l_shipdate"), F.col("o_orderdate")).alias(
                "last_ship"
            )
        )
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("m_open"),
            F.date_format("last_ship", "yyyy-MM").alias("m_close"),
        )
        .collect()
    ]
    got = {
        r["month"]: r["orders_in_flight"]
        for r in orders_in_flight_monthly(spark, sf_dir).collect()
    }
    months = sorted(got)
    for m in months:
        brute = sum(1 for a, b in iv if a <= m <= b)
        assert got[m] == brute, (m, got[m], brute)
    # concurrency returns to zero after the last close
    assert got[months[-1]] == 0 or months[-1] <= max(b for _, b in iv)
