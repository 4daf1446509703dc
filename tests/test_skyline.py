"""Skyline: brute-force dominance oracle on random points, tie
conventions (duplicate frontier points survive; same-x smaller-y is
dominated), and the face's frontier shape invariant."""

from __future__ import annotations

import random

from bigdatamlteamrepo_spark.queries.skyline import skyline_2d


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "pid bigint, x bigint, y bigint",
    )


def _brute(pts):
    """Textbook NOT EXISTS dominance: keep p unless some q is ≤ on x,
    ≥ on y, and strictly better on one."""
    keep = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            (qx <= x and qy >= y) and (qx < x or qy > y)
            for j, (qx, qy) in enumerate(pts)
            if j != i
        )
        if not dominated:
            keep.append(i)
    return sorted(keep)


def test_matches_brute_force_on_random_points(spark):
    rng = random.Random(11)
    pts = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    got = sorted(
        r["pid"]
        for r in skyline_2d(_df(spark, pts), minimize="x", maximize="y").collect()
    )
    assert got == _brute(pts)


def test_duplicate_frontier_points_both_survive(spark):
    """Two identical points dominate nobody (no strict edge) — both stay,
    the standard skyline convention."""
    pts = [(1, 5), (1, 5), (2, 4)]
    got = sorted(
        r["pid"]
        for r in skyline_2d(_df(spark, pts), minimize="x", maximize="y").collect()
    )
    assert got == [0, 1]  # (2,4) dominated by (1,5)


def test_same_x_smaller_y_is_dominated(spark):
    pts = [(3, 10), (3, 7), (1, 2)]
    got = sorted(
        r["pid"]
        for r in skyline_2d(_df(spark, pts), minimize="x", maximize="y").collect()
    )
    # (3,7) loses to (3,10); (1,2) survives (cheapest, nothing cheaper)
    assert got == [0, 2]


def test_monotone_chain_all_survive(spark):
    """y strictly increasing with x: every point trades price for size,
    so the whole chain IS the frontier."""
    pts = [(i, i) for i in range(5)]
    got = sorted(
        r["pid"]
        for r in skyline_2d(_df(spark, pts), minimize="x", maximize="y").collect()
    )
    assert got == [0, 1, 2, 3, 4]


def test_face_frontier_is_a_staircase(spark, sf_dir):
    """Frontier invariant: across distinct prices ascending, sizes must
    strictly INCREASE (a pricier frontier part must be bigger, else the
    cheaper one dominates it), and all parts sharing a frontier price
    share its size."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    rows = QUERIES["part_pareto_frontier"](spark, sf_dir).collect()
    assert rows
    by_price: dict[int, int] = {}
    for r in rows:
        by_price.setdefault(r["price_cents"], r["size"])
        assert by_price[r["price_cents"]] == r["size"]
    prices = sorted(by_price)
    sizes = [by_price[p] for p in prices]
    assert all(a < b for a, b in zip(sizes, sizes[1:]))
