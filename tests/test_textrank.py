"""TextRank: co-occurrence edge-build semantics (window-2 adjacency,
undirected weights, self-loop drop, length filter), a pure-Python
integer-PageRank replica over a hand corpus, and the hub-ranks-top
sanity property."""

from __future__ import annotations

from bigdatamlteamrepo_spark.operators.pagerank import SHARE_SCALE
from bigdatamlteamrepo_spark.queries.textrank import (
    EDGE_MIN_W,
    MIN_WORD_LEN,
    word_cooccurrence_edges,
)

_DOCS = [
    "spark joins hash tables, hash joins win; spark joins scale",
    "hash joins beat sort joins. hash joins! a spark",
    "sort spark sort spark sort",
]


def _docs_df(spark):
    return spark.createDataFrame([(t,) for t in _DOCS], "text string")


def _brute_edges() -> dict[tuple[str, str], int]:
    """Window-2 adjacency weights over letter-only length-filtered
    tokens, undirected (a < b), self-loops dropped, weight >= min."""
    import re

    w: dict[tuple[str, str], int] = {}
    for t in _DOCS:
        toks = [
            x
            for x in re.split("[^a-z]+", t.lower())
            if len(x) >= MIN_WORD_LEN
        ]
        for x, y in zip(toks, toks[1:]):
            if x == y:
                continue
            k = (min(x, y), max(x, y))
            w[k] = w.get(k, 0) + 1
    return {k: c for k, c in w.items() if c >= EDGE_MIN_W}


def test_edge_build_matches_brute_force(spark):
    rows = word_cooccurrence_edges(_docs_df(spark)).collect()
    # both directions present with equal weight
    got_fwd = {
        (r["src"], r["dst"]): r["weight"] for r in rows if r["src"] < r["dst"]
    }
    got_rev = {
        (r["dst"], r["src"]): r["weight"] for r in rows if r["src"] > r["dst"]
    }
    expected = _brute_edges()
    assert got_fwd == expected
    assert got_rev == expected


def _py_integer_pagerank(edges, n_iter=10, scale=10**8):
    """Pure-Python replica of operators/pagerank.py's arithmetic."""
    outw: dict[str, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    shares = [(s, d, (w * SHARE_SCALE) // outw[s]) for s, d, w in edges]
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    rank = {n: scale for n in nodes}
    teleport = 15 * scale // 100
    for _ in range(n_iter):
        inc: dict[str, int] = {}
        for s, d, sh in shares:
            inc[d] = inc.get(d, 0) + (rank[s] * sh) // SHARE_SCALE
        rank = {n: teleport + (85 * inc.get(n, 0)) // 100 for n in nodes}
    return rank


def test_full_textrank_matches_python_replica(spark):
    from bigdatamlteamrepo_spark.operators.pagerank import integer_pagerank

    e = word_cooccurrence_edges(_docs_df(spark))
    spark_ranks = {
        r["node"]: r["rank"]
        for r in integer_pagerank(e, n_iter=10, scale=10**8).collect()
    }
    edges = [(r["src"], r["dst"], r["weight"]) for r in e.collect()]
    assert spark_ranks == _py_integer_pagerank(edges)


def test_hub_word_ranks_top(spark):
    """'joins' is adjacent to the most distinct frequent words in the
    hand corpus — TextRank must put it first."""
    from bigdatamlteamrepo_spark.operators.pagerank import integer_pagerank

    e = word_cooccurrence_edges(_docs_df(spark))
    ranks = integer_pagerank(e, n_iter=10, scale=10**8).collect()
    top = max(ranks, key=lambda r: (r["rank"], r["node"]))
    assert top["node"] == "joins"


def test_short_and_nonletter_tokens_never_become_nodes(spark):
    rows = word_cooccurrence_edges(_docs_df(spark)).collect()
    words = {r["src"] for r in rows} | {r["dst"] for r in rows}
    assert all(len(w) >= MIN_WORD_LEN and w.isalpha() for w in words)
    assert "a" not in words
