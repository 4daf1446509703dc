#!/usr/bin/env python
"""Full driver simulation: run every registered query against its DuckDB
oracle at sf0.01 using the driver's comparison contract (row count +
schema type-class + order-insensitive value multiset, columns sorted by
name).  Prints one status line per query and a final scoreboard.

This is the pre-commit gate previous sessions ran ad hoc; kept as a
tool so every session verifies the same way.

Usage:
    python tools/driver_sim.py               # all queries, sf0.01
    python tools/driver_sim.py --window      # first 50 only (driver window)
    python tools/driver_sim.py --sf /root/testdata/sf0.001
    python tools/driver_sim.py q1_pricing_summary neardup_pairs_lsh
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bigdatamlteamrepo_spark import get_spark  # noqa: E402
from bigdatamlteamrepo_spark.queries import ORACLE, QUERIES  # noqa: E402
from bigdatamlteamrepo_spark.queries.registry import ordered  # noqa: E402
from tests.conftest import TABLES, assert_parity  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", action="store_true", help="first 50 only")
    args = ap.parse_args()

    # Vanilla session, like the driver's (no test-tuned shuffle count).
    spark = get_spark(app_name="driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = list(ordered(QUERIES))
    if args.window:
        names = names[:50]
    if args.names:
        missing = [n for n in args.names if n not in QUERIES]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        names = args.names

    n_green = n_rows_only = n_fail = 0
    failures: list[str] = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, args.sf)
            if name in ORACLE:
                assert_parity(df, con, ORACLE[name])
                n_green += 1
                status = "green"
            else:
                n = df.count()
                n_rows_only += 1
                status = f"rows-only ({n})"
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            status = f"FAIL: {type(exc).__name__}: {exc}"
            failures.append(name)
            traceback.print_exc(limit=4)
        print(f"{time.time() - t0:6.1f}s  {name:42s} {status}")
    print(
        f"\n{len(names)} queries in {time.time() - t_all:.0f}s: "
        f"{n_green} green, {n_rows_only} rows-only, {n_fail} FAILED"
    )
    if failures:
        print("failed:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
