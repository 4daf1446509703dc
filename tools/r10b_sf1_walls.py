#!/usr/bin/env python
"""Cold full-collect() walls for the round-10 addition tier at the
synthetic sf1 fixture (tools/sf1_scaling.py --gen-only) vs sf0.1 —
the same protocol as the headliner sf1 table in SCALING.md.

Run: python tools/r10b_sf1_walls.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "customer_tier_scd2",
    "customer_tier_scd2_incremental",
    "events_tier_pit_counts",
    "events_cdc_snapshot_diff",
    "part_link_prediction_topk",
    "part_ppr_recommendations",
    "events_bootstrap_ci",
    "events_neyman_allocation",
    "brand_price_quantity_ols",
    "events_type_transition_matrix",
    "events_type_top_trigrams",
]

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark-graft-sf1"


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from bigdatamlteamrepo_spark.operators.setjoin import (
        CandidateVolumeExceeded,
    )

    qs = e.queries()
    for sf in (SF01, SF1):
        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(10).selectExpr("sum(id)").collect()
        for n in NAMES:
            t0 = time.time()
            try:
                rows = len(qs[n](spark, sf).collect())
                print(f"{sf:25s} {n:35s} {time.time() - t0:7.2f}s  {rows} rows")
            except CandidateVolumeExceeded as ex:
                print(f"{sf:25s} {n:35s} GUARD REFUSED: {ex}")
        spark.stop()


if __name__ == "__main__":
    main()
