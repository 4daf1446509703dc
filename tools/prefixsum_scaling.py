#!/usr/bin/env python
"""Serial global-window running sum vs the two-phase partitioned scan
(`operators/prefixsum.py`) on a synthetic wide frame — the wall-clock
evidence behind the operator's reason to exist.

Run: python tools/prefixsum_scaling.py [n_rows ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.prefixsum import partitioned_running_sum
from bigdatamlteamrepo_spark.session import get_spark


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 5_000_000, 20_000_000]
    spark = get_spark("prefixsum-scaling")
    spark.range(10).selectExpr("sum(id)").collect()
    for n in sizes:
        # unique sort key, deterministic pseudo-random values
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.xxhash64("id") % 7 - 3).alias("x"),
        )
        t0 = time.time()
        serial = (
            df.withColumn(
                "run",
                F.sum("x").over(
                    Window.orderBy("k").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            )
            .agg(F.max("run"), F.count(F.lit(1)))
            .collect()
        )
        t_serial = time.time() - t0
        t0 = time.time()
        par = (
            partitioned_running_sum(
                df, order_cols=["k"], value_col="x", out_col="run"
            )
            .agg(F.max("run"), F.count(F.lit(1)))
            .collect()
        )
        t_par = time.time() - t0
        assert serial == par, (n, serial, par)
        print(
            f"n={n:>11,}  serial-window {t_serial:6.2f}s  "
            f"partitioned-scan {t_par:6.2f}s  speedup {t_serial / t_par:4.1f}x"
            "  (results equal)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
