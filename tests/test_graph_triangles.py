"""Triangle counting: the degree-ordered plan must agree with an
independent brute-force enumeration, on both a hand-built graph with
known triangle count and the real co-purchase graph."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.graphs import (
    cooccurrence_edges,
    oriented_edges,
    triangle_count,
)


def _brute(edges: set[tuple[int, int]]) -> int:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n = 0
    for u, v in edges:
        n += len(adj[u] & adj[v])
    return n // 3  # each triangle counted once per edge


def test_known_graph(spark):
    # K4 (4 triangles) + a pendant + a disjoint triangle = 5 total
    edges = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (7, 8), (7, 9), (8, 9)}
    e = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    row = triangle_count(e).collect()[0]
    assert row["n_triangles"] == 5 == _brute(edges)
    assert row["n_nodes"] == 8
    assert row["n_edges"] == len(edges)


def test_orientation_is_acyclic_and_complete(spark):
    edges = {(1, 2), (2, 3), (1, 3), (3, 4)}
    e = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    o = oriented_edges(e).collect()
    assert len(o) == len(edges)  # every edge oriented exactly once
    # out-degree of a node never exceeds its degree rank: the hub (3)
    # with degree 3 must receive the K3 edges from lower-degree nodes
    out = {}
    for r in o:
        out[r["src"]] = out.get(r["src"], 0) + 1
    assert out.get(4, 0) + out.get(3, 0) <= 2  # high-degree side emits little


def test_cooccurrence_graph_matches_brute_force(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = cooccurrence_edges(li)
    edges = {(r["u"], r["v"]) for r in e.collect()}
    got = triangle_count(e).collect()[0]
    assert got["n_triangles"] == _brute(edges)
    assert got["n_edges"] == len(edges)


def test_pair_fanout_is_bounded_per_order(spark, sf_dir):
    """The co-purchase self-join's per-order fan-out is C(k,2) with k
    bounded by the order's lineitem count (a small constant — ≤7 in
    TPC-H proper, ≤16 in the driver's synthetic tables) — the property
    that keeps the edge build linear in |lineitem|."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.groupBy("l_orderkey").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 16


def test_random_graphs_match_brute_force(spark):
    """Seeded Erdős–Rényi graphs of varied density: the degree-ordered
    count equals brute force on every one (catches orientation /
    tie-break errors that a single fixed graph might miss)."""
    import random

    rng = random.Random(20260814)
    for trial in range(5):
        n = rng.randrange(8, 25)
        p = rng.choice([0.15, 0.3, 0.5])
        edges = {
            (u, v)
            for u in range(n)
            for v in range(u + 1, n)
            if rng.random() < p
        }
        if not edges:
            continue
        e = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
        got = triangle_count(e).collect()[0]["n_triangles"]
        assert got == _brute(edges), f"trial {trial} n={n} p={p}"


def test_degree_ordering_caps_out_degree(spark, sf_dir):
    """After (degree, id) orientation, max out-degree is O(√E) — the
    bound that tames the wedge build on power-law graphs (Suri &
    Vassilvitskii).  Structural: a node's out-neighbors all have ≥ its
    degree, so out-degree ≤ √(2·|E|)."""
    import math

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = cooccurrence_edges(li)
    n_edges = e.count()
    out_max = (
        oriented_edges(e)
        .groupBy("src")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert out_max <= math.isqrt(2 * n_edges) + 1


def test_local_clustering_on_known_graph(spark, tmp_path):
    """K4 + pendant + disjoint K3 via a synthetic lineitem (each edge
    materialized as two repeat co-purchase orders): K4 inner nodes and
    K3 nodes have lcc=1; the K4 node with the pendant has deg 4, 3
    triangles → lcc = 0.5; the pendant (deg 1) is excluded."""
    from bigdatamlteamrepo_spark.queries.graphs import part_local_clustering

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
             (7, 8), (7, 9), (8, 9)]
    rows, ok = [], 0
    for u, v in edges:
        for _ in range(2):  # weight 2 → passes LPA_MIN_WEIGHT
            rows += [(ok, u), (ok, v)]
            ok += 1
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    d = str(tmp_path)
    li.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["lcc_ppm"])
        for r in part_local_clustering(spark, d).collect()
    }
    assert 5 not in got  # pendant: degree 1
    for n in (1, 2, 3):
        assert got[n] == (3, 3, 1_000_000)
    assert got[4] == (4, 3, 500_000)
    for n in (7, 8, 9):
        assert got[n] == (2, 1, 1_000_000)


def test_kcore_peel_on_known_graph(spark):
    """K4 + a chain of pendants: the 3-core is exactly the K4 (chain
    nodes peel in cascading rounds — the fixed budget must cover the
    cascade), and every survivor has in-core degree 3."""
    from bigdatamlteamrepo_spark.queries.graphs import kcore_peel

    # K4 on {1,2,3,4}; chain 4-5-6-7 peels back node by node
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 7)]
    e = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    got = {r["node"]: r["core_degree"] for r in kcore_peel(e, k=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_reaches_fixpoint_within_budget(spark, sf_dir):
    """On the real graph the peel must be at its fixpoint: one more
    round changes nothing (otherwise KCORE_ROUNDS is too small and the
    registered face reports a non-converged intermediate)."""
    from bigdatamlteamrepo_spark.queries.graphs import (
        KCORE_ROUNDS,
        part_kcore_membership,
    )
    from bigdatamlteamrepo_spark.queries import graphs as G
    from bigdatamlteamrepo_spark.catalog import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= G.LPA_MIN_WEIGHT)
        .select("u", "v")
    )
    at_budget = {
        (r["node"], r["core_degree"])
        for r in G.kcore_peel(e, rounds=KCORE_ROUNDS).collect()
    }
    one_more = {
        (r["node"], r["core_degree"])
        for r in G.kcore_peel(e, rounds=KCORE_ROUNDS + 1).collect()
    }
    assert at_budget == one_more
