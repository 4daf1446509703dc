"""Salted join: exact result parity with the plain join + measurable
spread of the hot key across reducer partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.skew import salted_join


def _skewed(spark, n=20_000, hot_share=0.5):
    """key 0 holds ``hot_share`` of the fact side; 99 cold keys split the rest."""
    fact = spark.range(n).select(
        F.when(F.col("id") < int(n * hot_share), 0)
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    build = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("dim_val"),
    )
    return fact, build


def test_salted_join_exact_parity(spark):
    fact, build = _skewed(spark)
    plain = fact.join(build, "k").select("fact_id", "dim_val")
    salted = salted_join(fact, build, "k", n_salts=8).select("fact_id", "dim_val")
    a = {(r.fact_id, r.dim_val) for r in plain.collect()}
    b = {(r.fact_id, r.dim_val) for r in salted.collect()}
    assert a == b
    assert len(b) == 20_000


def test_salted_join_spreads_hot_key(spark):
    fact, build = _skewed(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # observe raw layout
    try:
        def max_partition_rows(df):
            sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
            return max(sizes)

        plain = fact.join(build, "k")
        salted = salted_join(fact, build, "k", n_salts=8)
        plain_max = max_partition_rows(plain)
        salted_max = max_partition_rows(salted)
        # hot key = 10k rows in ONE partition unsalted; salted splits it ~8 ways
        assert plain_max >= 10_000
        assert salted_max <= plain_max / 2, (plain_max, salted_max)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_salted_left_join_keeps_unmatched(spark):
    fact, build = _skewed(spark, n=1000)
    # drop half the build keys → left join must keep unmatched fact rows
    build_half = build.filter(F.col("k") < 50)
    plain = fact.join(build_half, "k", "left")
    salted = salted_join(fact, build_half, "k", n_salts=4, how="left")
    assert plain.count() == salted.count() == 1000
    a = {(r.fact_id, r.dim_val) for r in plain.collect()}
    b = {(r.fact_id, r.dim_val) for r in salted.collect()}
    assert a == b
