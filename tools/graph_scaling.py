#!/usr/bin/env python
"""Graph-tier scaling: LPA and local-clustering wall-time growth on
synthetic co-purchase graphs that quadruple per row.

Baskets are synthesized directly (spark.range → (order, part) rows,
parts drawn by portable hash so the graph is reproducible), sized so
edge counts grow ~4× per row; a quadratic stage would show ≳16× wall
growth per row.

Run: python tools/graph_scaling.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark import get_spark
from bigdatamlteamrepo_spark.queries.graphs import label_propagation


def synth_edges(spark, n_orders: int, n_parts: int, items: int = 4):
    """Distinct co-purchase edges of a synthetic basket table (weight
    ≥1 — the part space grows with the orders so the distinct-edge
    count itself grows ~4x per row, which is what the LPA scaling
    claim is about)."""
    li = (
        spark.range(n_orders * items)
        .select(
            (F.col("id") / items).cast("bigint").alias("ok"),
            (
                F.abs(F.xxhash64(F.col("id").cast("string"))) % n_parts
            ).alias("p"),
        )
    )
    a = li.select("ok", F.col("p").alias("u"))
    b = li.select("ok", F.col("p").alias("v"))
    return (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def main() -> None:
    spark = get_spark(app_name="graph-scaling")
    print("| orders | parts | edges | lpa s | ratio |")
    prev = None
    for n_orders, n_parts in [(50_000, 4_000), (200_000, 8_000), (800_000, 16_000)]:
        e = synth_edges(spark, n_orders, n_parts).localCheckpoint(eager=True)
        n_edges = e.count()
        label_propagation(e).count()  # warm
        walls = []
        for _ in range(3):
            t0 = time.time()
            label_propagation(e).count()
            walls.append(time.time() - t0)
        w = statistics.median(walls)
        ratio = f"{w / prev:.2f}x" if prev else "—"
        print(f"| {n_orders:,} | {n_parts:,} | {n_edges:,} | {w:.2f} | {ratio} |")
        prev = w


if __name__ == "__main__":
    main()
