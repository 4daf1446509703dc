"""Bucketed join co-location: plan-level proof that bucketing removes
the shuffle, and result parity with the unbucketed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.numeric import dsum
from bigdatamlteamrepo_spark.operators import bucketing


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf, set in conftest's session builder.
    # disable auto-broadcast so the control plan is a genuine SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield bucketing.bucket_star_tables(spark, sf_dir, n_buckets=4)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("orders_b", "lineitem_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    o, l = bucketed
    df = bucketing.bucketed_order_revenue(spark, o, l)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"


def test_unbucketed_join_does_exchange(spark, sf_dir):
    # control: the same join over raw parquet shuffles both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        l = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        df = (
            l.join(o, "o_orderkey")
            .groupBy("o_orderkey", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed):
    o, l = bucketed
    got = {
        (r.o_orderkey, r.o_orderpriority): (r.gross_revenue, r.n_items)
        for r in bucketing.bucketed_order_revenue(spark, o, l).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        (r.o_orderkey, r.o_orderpriority): (r.gross_revenue, r.n_items)
        for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            dsum("l_extendedprice", 2).alias("gross_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .collect()
    }
    assert got == want
