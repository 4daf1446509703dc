#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed as a count-collapsing action (``collect`` on the
already-aggregated result) so timing includes the full plan — scan,
shuffle, agg — but not driver-side pandas conversion.  A warm-up run of
the flagship query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatamlteamrepo_spark import get_spark
from bigdatamlteamrepo_spark.queries import BENCH_SET, QUERIES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    spark = get_spark(app_name="bigdatamlteamrepo-bench")

    # Warm pass: JVM JIT, whole-stage codegen compilation, parquet
    # footer caches — measured pass reports warm per-query latency.
    for name in BENCH_SET:
        QUERIES[name](spark, sf_dir).collect()

    # min-of-2 measured runs: single-run noise on a shared box is ±15%,
    # the min is a stable estimate of actual plan cost
    timings: dict[str, float] = {}
    for name in BENCH_SET:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
