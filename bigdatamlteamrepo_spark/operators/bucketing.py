"""Bucketed-table co-location: the write-time partitioning strategy that
removes the shuffle from repeated fact-fact joins (README scale note
made concrete).

At 100 TB, orders ⋈ lineitem on orderkey is the dominant shuffle.
Bucketing both tables by orderkey at ingest (`bucketBy(n, key)` +
`sortBy`) lets every later join/aggregation on that key run as a
zipped per-bucket sort-merge with NO Exchange on either side — the
plan-level proof is asserted in tests/test_bucketing.py.

Bucket count guidance: ~(table size / target partition size); must be
equal on both sides (Spark requires one side's bucket count to be a
multiple of the other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.numeric import dsum


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucket_star_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8, suffix: str = "_b"
) -> tuple[str, str]:
    """Bucket orders and lineitem by orderkey; returns the table names."""
    o, l = f"orders{suffix}", f"lineitem{suffix}"
    write_bucketed(load_table(spark, sf_dir, "orders"), o, "o_orderkey", n_buckets)
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        l,
        "o_orderkey",
        n_buckets,
    )
    return o, l


def bucketed_order_revenue(spark: SparkSession, orders_tbl: str, lineitem_tbl: str) -> DataFrame:
    """orders ⋈ lineitem on the bucket key + per-order agg — with both
    sides bucketed this plan contains zero Exchange operators."""
    o = spark.table(orders_tbl)
    l = spark.table(lineitem_tbl)
    return (
        l.join(o, "o_orderkey")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            dsum("l_extendedprice", 2).alias("gross_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
