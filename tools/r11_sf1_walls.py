#!/usr/bin/env python
"""Cold full-collect() walls for the round-11 addition tier at the
synthetic sf1 fixture (tools/sf1_scaling.py --gen-only) vs sf0.1 —
the same protocol as the headliner sf1 table in SCALING.md.

Run: python tools/r11_sf1_walls.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "events_value_ohlc_hourly",
    "events_value_twap",
    "events_cusum_changepoint",
    "part_pareto_frontier",
    "source_quality_auc",
    "part_bfs_hop_census",
    "brand_weighted_median_price",
    "purchases_in_error_bursts",
    "sessions_peak_concurrency",
    "source_token_gini",
]

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark-graft-sf1"


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    qs = e.queries()
    for sf in (SF01, SF1):
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            # the engine session (session.get_spark) runs 16g in local
            # mode; a bare 1g-default builder OOMs the 6.1M-row SMJ of
            # the sf1 edge build under 32 concurrent tasks — measure the
            # configured runtime, not a misconfigured one
            .config("spark.driver.memory", "16g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(10).selectExpr("sum(id)").collect()
        for n in NAMES:
            t0 = time.time()
            rows = len(qs[n](spark, sf).collect())
            print(f"{sf:25s} {n:35s} {time.time() - t0:7.2f}s  {rows} rows")
        spark.stop()


if __name__ == "__main__":
    main()
