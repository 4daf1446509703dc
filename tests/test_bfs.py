"""BFS hop layers: pure-Python BFS equality on random graphs, the
fixed-round-budget semantics (unreached = beyond budget), seed
determinism, and face invariants (hop 0 is one node, layer monotone
reachability)."""

from __future__ import annotations

import random

from bigdatamlteamrepo_spark.queries.graphs import BFS_ROUNDS, bfs_hops


def _edges_df(spark, und):
    return spark.createDataFrame(sorted(und), "u bigint, v bigint")


def _seed_df(spark, node):
    return spark.createDataFrame([(node,)], "node bigint")


def _py_bfs(und, seed, rounds):
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {seed: 0}
    frontier = {seed}
    for r in range(1, rounds + 1):
        frontier = {
            w for n in frontier for w in adj.get(n, ()) if w not in dist
        }
        for w in frontier:
            dist[w] = r
    return dist


def test_matches_python_bfs_on_random_graph(spark):
    rng = random.Random(5)
    und = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (rng.sample(range(40), 2) for _ in range(70))
        }
    )
    got = {
        r["node"]: r["d"]
        for r in bfs_hops(_edges_df(spark, und), _seed_df(spark, 0)).collect()
    }
    assert got == _py_bfs(und, 0, BFS_ROUNDS)


def test_round_budget_truncates_long_path(spark):
    """A 7-node path seeded at one end: nodes past hop BFS_ROUNDS are
    absent from the dist frame — 'unreached within budget', the defined
    semantics, not an approximation of full BFS."""
    und = [(i, i + 1) for i in range(7)]
    got = {
        r["node"]: r["d"]
        for r in bfs_hops(_edges_df(spark, und), _seed_df(spark, 0)).collect()
    }
    assert got == {i: i for i in range(BFS_ROUNDS + 1)}


def test_disconnected_component_unreached(spark):
    und = [(0, 1), (1, 2), (10, 11)]
    got = {
        r["node"]: r["d"]
        for r in bfs_hops(_edges_df(spark, und), _seed_df(spark, 0)).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_face_census_invariants(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    rows = {
        r["hop"]: r["n_nodes"]
        for r in QUERIES["part_bfs_hop_census"](spark, sf_dir).collect()
    }
    assert rows[0] == 1  # exactly the seed at hop 0
    assert -1 in rows and rows[-1] >= 0
    assert all(n > 0 for h, n in rows.items() if h >= 0)
    # hops are dense from 0: a populated hop k needs a populated k-1
    hops = sorted(h for h in rows if h >= 0)
    assert hops == list(range(len(hops)))
