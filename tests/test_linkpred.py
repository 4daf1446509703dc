"""Link prediction: the wedge-join scores must equal a brute-force
neighborhood enumeration (hand graph + seeded random graph), the RA
terms must be exact half-away micro rationals, and the wedge-volume
guard must refuse an adversarial hub."""

from __future__ import annotations

import itertools
import random

import pytest

from bigdatamlteamrepo_spark.operators.setjoin import CandidateVolumeExceeded
from bigdatamlteamrepo_spark.queries.linkpred import MICRO, link_prediction_scores


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edges], "u bigint, v bigint"
    )


def _brute(edges):
    """(node_a, node_b) -> (common_neighbors, ra_micro) over non-edges."""
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    eset = {(min(u, v), max(u, v)) for u, v in edges}
    out = {}
    for a, b in itertools.combinations(sorted(nbrs), 2):
        if (a, b) in eset:
            continue
        shared = nbrs[a] & nbrs[b]
        if not shared:
            continue
        ra = sum((2 * MICRO + len(nbrs[w])) // (2 * len(nbrs[w])) for w in shared)
        out[(a, b)] = (len(shared), ra)
    return out


def _collect(spark, edges):
    rows = link_prediction_scores(_edges_df(spark, edges)).collect()
    return {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["ra_micro"])
        for r in rows
    }


def test_cycle_and_star_by_inspection(spark):
    # 4-cycle: both diagonals share two degree-2 neighbors;
    # 3-star: leaf pairs share the degree-3 hub → round(1e6/3)
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (10, 11), (10, 12), (10, 13)]
    got = _collect(spark, edges)
    assert got[(1, 3)] == (2, 2 * (MICRO // 2))
    assert got[(2, 4)] == (2, 2 * (MICRO // 2))
    assert got[(11, 12)] == (1, 333333)  # (2e6 + 3) // 6, half-away
    assert got[(11, 13)] == (1, 333333)
    assert got[(12, 13)] == (1, 333333)
    assert got == _brute(edges)


def test_matches_brute_force_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(40))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (rng.sample(nodes, 2) for _ in range(120))
        }
    )
    assert _collect(spark, edges) == _brute(edges)


def test_no_existing_edge_is_scored(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]  # triangle + pendant
    got = _collect(spark, edges)
    eset = {(1, 2), (2, 3), (1, 3), (3, 4)}
    assert not (set(got) & eset)
    # the triangle still produces wedge pairs THROUGH its members:
    # 1-3-4 and 2-3-4 are non-edges sharing center 3 (deg 3)
    assert got == {(1, 4): (1, 333333), (2, 4): (1, 333333)}


def test_wedge_volume_guard_trips_on_hub(spark):
    # hub of degree 60 → C(60, 2) = 1770 wedges > 1000
    edges = [(0, i) for i in range(1, 61)]
    with pytest.raises(CandidateVolumeExceeded):
        link_prediction_scores(_edges_df(spark, edges), max_wedges=1000).collect()
    # and passes with the bound above the prediction
    ok = link_prediction_scores(_edges_df(spark, edges), max_wedges=2000)
    assert ok.count() == 1770


# --------------------------------------------------------------------------
# Personalized PageRank
# --------------------------------------------------------------------------


def _py_ppr(edges, seeds, n_iter, scale=10**9):
    """Pure-Python replica of the seeded integer-PageRank arithmetic."""
    from bigdatamlteamrepo_spark.operators.pagerank import SHARE_SCALE

    outw: dict[int, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    shares = [(s, d, (w * SHARE_SCALE) // outw[s]) for s, d, w in edges]
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    seeds = set(seeds) & nodes
    teleport = 15 * scale // 100
    rank = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(n_iter):
        inc: dict[int, int] = {}
        for s, d, sh in shares:
            inc[d] = inc.get(d, 0) + (rank[s] * sh) // SHARE_SCALE
        rank = {
            n: (teleport if n in seeds else 0) + (85 * inc.get(n, 0)) // 100
            for n in nodes
        }
    return rank


def test_ppr_matches_python_replica(spark):
    import random

    from bigdatamlteamrepo_spark.operators.pagerank import integer_pagerank

    rng = random.Random(3)
    und = sorted(
        {(min(a, b), max(a, b)) for a, b in (rng.sample(range(30), 2) for _ in range(80))}
    )
    edges = [(u, v, 1) for u, v in und] + [(v, u, 1) for u, v in und]
    seeds = [0, 1, 2]
    e_df = spark.createDataFrame(edges, "src bigint, dst bigint, weight int")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    got = {
        r["node"]: r["rank"]
        for r in integer_pagerank(e_df, n_iter=5, seeds=s_df).collect()
    }
    assert got == _py_ppr(edges, seeds, n_iter=5)


def test_ppr_mass_stays_near_seeds(spark):
    """Two 4-cliques joined by one bridge edge: seeding one clique must
    rank ALL its members above every cross-bridge node."""
    from bigdatamlteamrepo_spark.operators.pagerank import integer_pagerank

    left = [(a, b) for a in range(4) for b in range(4) if a < b]
    right = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    und = left + right + [(3, 10)]
    edges = [(u, v, 1) for u, v in und] + [(v, u, 1) for u, v in und]
    e_df = spark.createDataFrame(edges, "src bigint, dst bigint, weight int")
    s_df = spark.createDataFrame([(0,)], "node bigint")
    got = {
        r["node"]: r["rank"]
        for r in integer_pagerank(e_df, n_iter=6, seeds=s_df).collect()
    }
    assert min(got[n] for n in range(4)) > max(got[n] for n in range(10, 14))


def test_ppr_face_excludes_seeds_and_is_positive(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.linkpred import (
        PPR_TOP_K,
        part_ppr_recommendations,
    )

    rows = part_ppr_recommendations(spark, sf_dir).collect()
    assert 0 < len(rows) <= PPR_TOP_K
    assert all(r["ppr_rank"] > 0 for r in rows)
    ranks = [r["ppr_rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_ppr_zero_teleport_still_seeds_initial_mass(spark):
    """ADVICE_r10: with damping (100, 100) the teleport mass floors to 0,
    so a `__t > 0` init gate would zero every starting rank while the
    oracle's nt CTE (gated on seed MEMBERSHIP) starts seeds at `scale`.
    Pin Spark == DuckDB == pure Python at the degenerate parameters."""
    import duckdb

    from bigdatamlteamrepo_spark.operators.pagerank import (
        SHARE_SCALE,
        integer_pagerank,
        pagerank_cte_sql,
    )

    # a directed 4-cycle plus a chord: every node reachable from the seed
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 0, 1), (1, 3, 1)]
    seeds = [0]
    scale, n_iter, damping = 10**6, 4, (100, 100)

    e_df = spark.createDataFrame(edges, "src bigint, dst bigint, weight int")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    got = {
        r["node"]: r["rank"]
        for r in integer_pagerank(
            e_df, n_iter=n_iter, scale=scale, damping=damping, seeds=s_df
        ).collect()
    }
    # mass actually moved: the walk must not have started from all-zeros
    assert any(v > 0 for v in got.values())

    edges_cte = "edges(src, dst, weight) AS (VALUES " + ", ".join(
        f"({s}, {d}, {w})" for s, d, w in edges
    ) + ")"
    seeds_cte = "seeds(node) AS (VALUES " + ", ".join(
        f"({s})" for s in seeds
    ) + ")"
    sql = (
        pagerank_cte_sql(
            edges_cte,
            n_iter=n_iter,
            scale=scale,
            damping=damping,
            seeds_cte=seeds_cte,
        )
        + f"\nSELECT node, rank FROM pr{n_iter}"
    )
    oracle = dict(duckdb.sql(sql).fetchall())
    assert got == oracle

    # and both match the pure-Python replica at zero teleport
    outw: dict[int, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    shares = [(s, d, (w * SHARE_SCALE) // outw[s]) for s, d, w in edges]
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    rank = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(n_iter):
        inc: dict[int, int] = {}
        for s, d, sh in shares:
            inc[d] = inc.get(d, 0) + (rank[s] * sh) // SHARE_SCALE
        rank = {n: (100 * inc.get(n, 0)) // 100 for n in nodes}
    assert got == rank
