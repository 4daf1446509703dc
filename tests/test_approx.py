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
