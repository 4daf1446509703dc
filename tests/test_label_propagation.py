"""Label propagation: fixed-round synchronous LPA must match an
independent pure-Python reference on hand graphs (including the
oscillation case that motivates fixed rounds), and split obvious
two-cluster structures."""

from __future__ import annotations

from bigdatamlteamrepo_spark.queries.graphs import label_propagation


def _reference_lpa(edges, rounds):
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            cnt: dict[int, int] = {}
            for m in nbrs:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[n] = best
        lbl = nxt  # synchronous: all updates from the previous round
    return lbl


def _run(spark, edges, rounds=4):
    e = spark.createDataFrame(sorted(edges), "u bigint, v bigint")
    return {
        r["node"]: r["community"]
        for r in label_propagation(e, rounds=rounds).collect()
    }


def test_two_cliques_with_a_bridge(spark):
    k1 = {(1, 2), (1, 3), (2, 3)}
    k2 = {(10, 11), (10, 12), (11, 12)}
    edges = k1 | k2 | {(3, 10)}
    got = _run(spark, edges)
    assert got == _reference_lpa(edges, 4)
    # the two cliques resolve to two distinct communities
    assert len({got[1], got[2], got[3]}) == 1
    assert len({got[10], got[11], got[12]}) == 1
    assert got[1] != got[11]


def test_synchronous_semantics_on_oscillator(spark):
    """A 4-cycle (bipartite) oscillates under synchronous LPA — the
    fixed-round result must equal the reference at BOTH 3 and 4 rounds
    (an accidental asynchronous implementation converges instead and
    diverges from one of them)."""
    edges = {(1, 2), (2, 3), (3, 4), (1, 4)}
    for rounds in (3, 4):
        assert _run(spark, edges, rounds) == _reference_lpa(edges, rounds)


def test_star_adopts_min_leaf_label(spark):
    # hub 100 with leaves 1..5: hub sees five distinct labels, ties
    # break to the smallest; leaves all see only the hub's label
    edges = {(100, i) for i in range(1, 6)}
    got = _run(spark, edges, rounds=1)
    ref = _reference_lpa(edges, 1)
    assert got == ref
    assert got[100] == 1
    assert all(got[i] == 100 for i in range(1, 6))
