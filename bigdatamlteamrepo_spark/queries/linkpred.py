"""Link prediction over the part co-purchase graph: common-neighbors
and the resource-allocation index.

The classic neighborhood-overlap link predictors (Liben-Nowell &
Kleinberg 2003, "The link prediction problem for social networks";
Zhou, Lü & Zhang 2009, EPJ B 71:623, whose resource-allocation index
Σ_{w ∈ Γ(a)∩Γ(b)} 1/deg(w) outperforms Adamic-Adar on most graphs):
score every *non-adjacent* pair (a, b) by the structure of their shared
neighborhood and surface the top-K pairs — "parts that should
co-occur but don't yet", the recommender-candidate workload.

RA instead of Adamic-Adar on purpose: AA's 1/ln(deg) terms are
irrational doubles whose libm rounding is not contractually identical
across engines, while RA's 1/deg terms are exact rationals — emitted in
half-away micro units via pure BIGINT arithmetic (the DSIR idiom,
``queries/textmodel.py:338``), so Spark and DuckDB can never disagree
on a tie.

Distributed shape (the part that matters at 100 TB):

* **Wedge build = one self-equi-join on the center node.**  Candidate
  pairs are exactly the length-2 paths a–w–b: join the adjacency list
  to itself on w with ``nbr_a < nbr_b``.  Each wedge carries its
  center's degree, so both scores are map-side-combinable aggregates of
  the wedge stream — no per-pair neighborhood re-lookup.
* **Volume guard before the fan-out.**  The wedge count is EXACTLY
  Σ_w C(deg(w), 2) — one degree aggregate predicts it, and
  :class:`~bigdatamlteamrepo_spark.operators.setjoin.CandidateVolumeExceeded`
  refuses past ``MAX_WEDGES`` (a power-law hub of degree d alone
  contributes d²/2 wedges; the guard is the same refusal discipline as
  the PPJoin and basket fan-outs).  Past the bound the honest scale
  path is neighborhood sketching (MinHash of adjacency sets), not a
  silent cap.
* **Existing edges leave via an anti-join** on the same (a, b) key the
  wedge count groups on — no NOT-IN subquery, no broadcast of the full
  edge set required (Spark picks broadcast only when the edge side is
  small).
* **Top-K is TakeOrderedAndProject** over the scored pairs under a
  total order (ra, cn, a, b) — per-partition heaps, no global sort
  materialization.

Graph: the repeat co-purchase edge set shared with the LPA / k-core /
clustering faces (``queries/graphs.py``: parts co-purchased in ≥ 2
orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.setjoin import CandidateVolumeExceeded
from bigdatamlteamrepo_spark.queries.graphs import LPA_MIN_WEIGHT, _copurchase_edges
from bigdatamlteamrepo_spark.queries.registry import query

#: fixed-point scale for the resource-allocation terms
MICRO = 1_000_000
#: top-K scored non-edges to emit
TOP_K = 100
#: refuse wedge fan-outs predicted past this bound (Σ C(deg, 2))
MAX_WEDGES = 50_000_000


def link_prediction_scores(e: DataFrame, max_wedges: int = MAX_WEDGES) -> DataFrame:
    """Common-neighbor count + RA index for every non-adjacent pair.

    ``e`` is an undirected edge set ``(u, v)`` with ``u < v``.  Returns
    ``(node_a, node_b, common_neighbors, ra_micro)`` for pairs sharing
    ≥ 1 neighbor and NOT already an edge; ``ra_micro`` is
    Σ round_half_away(1e6 / deg(w)) over shared neighbors w — pure
    integer arithmetic.

    Raises :class:`CandidateVolumeExceeded` when the exact predicted
    wedge volume Σ C(deg, 2) exceeds ``max_wedges``.

    **Eager by contract**: the guard runs a driver-side degree
    aggregation at *construction* time (one bounded scalar collect), so
    merely building this DataFrame — including ``.explain()`` or a plan
    gate — triggers a Spark job over the edge frame.  Deliberate:
    refusal-before-fan-out must decide before any downstream plan
    exists; callers that only want the plan should pass a small edge
    sample.  (ADVICE_r10 — documented, not deferred.)
    """
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    predicted = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("wedges")
    ).collect()[0]["wedges"]
    if predicted is not None and predicted > max_wedges:
        raise CandidateVolumeExceeded(
            f"predicted wedge volume {predicted} exceeds {max_wedges}; "
            "sketch the neighborhoods (MinHash over adjacency sets) "
            "instead of the exact wedge join"
        )

    # each wedge a–w–b carries its center's degree → both scores are
    # one map-side-combinable aggregate of the wedge stream
    ctr = adj.join(deg.withColumnRenamed("node", "__n"), adj.node == F.col("__n"))
    a1 = ctr.select(
        F.col("node").alias("w"), F.col("deg").alias("wdeg"),
        F.col("nbr").alias("node_a"),
    )
    a2 = adj.select(F.col("node").alias("w"), F.col("nbr").alias("node_b"))
    wedges = a1.join(a2, "w").filter(F.col("node_a") < F.col("node_b"))

    scored = wedges.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.expr(f"(2 * {MICRO} + wdeg) div (2 * wdeg)")).alias("ra_micro"),
    )
    return scored.join(
        e.select(F.col("u").alias("node_a"), F.col("v").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )


_LINKPRED_ORACLE = f"""
WITH ew AS (
  SELECT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {LPA_MIN_WEIGHT}
),
adj AS (
  SELECT u AS node, v AS nbr FROM ew UNION ALL SELECT v, u FROM ew
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM adj GROUP BY node
),
wedge AS (
  SELECT a1.nbr AS node_a, a2.nbr AS node_b, d.deg AS wdeg
  FROM adj a1
  JOIN adj a2 ON a1.node = a2.node AND a1.nbr < a2.nbr
  JOIN deg d ON d.node = a1.node
),
scored AS (
  SELECT node_a, node_b,
         COUNT(*) AS common_neighbors,
         CAST(SUM((2 * {MICRO} + wdeg) // (2 * wdeg)) AS BIGINT) AS ra_micro
  FROM wedge
  GROUP BY 1, 2
)
SELECT s.node_a, s.node_b, s.common_neighbors, s.ra_micro
FROM scored s
ANTI JOIN ew ON s.node_a = ew.u AND s.node_b = ew.v
ORDER BY s.ra_micro DESC, s.common_neighbors DESC, s.node_a, s.node_b
LIMIT {TOP_K}
"""


@query("part_link_prediction_topk", oracle=_LINKPRED_ORACLE)
def part_link_prediction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} NON-adjacent part pairs of the repeat co-purchase
    graph by resource-allocation index (micro units), with the
    common-neighbor count — the "should co-occur but don't"
    recommendation candidates."""
    scores = link_prediction_scores(_copurchase_edges(spark, sf_dir))
    return scores.orderBy(
        F.col("ra_micro").desc(),
        F.col("common_neighbors").desc(),
        "node_a",
        "node_b",
    ).limit(TOP_K)


part_link_prediction_topk.__doc__ = part_link_prediction_topk.__doc__.format(
    TOP_K=TOP_K
)


# --------------------------------------------------------------------------
# Personalized PageRank from a seed basket (the random-walk recommender).
# --------------------------------------------------------------------------

#: PPR rounds — proximity mass reaches the 6-hop neighborhood, and the
#: near-seed ranking this face emits stabilizes in the first few rounds
PPR_ROUNDS = 6
#: recommendations to emit
PPR_TOP_K = 20

#: the seed basket: the order with the most distinct parts (tie →
#: smallest orderkey) — "customers who bought this basket" seeds
_SEEDS_CTE = """
bsz AS (
  SELECT l_orderkey AS ok, COUNT(DISTINCT l_partkey) AS sz
  FROM lineitem GROUP BY 1
),
pick AS (SELECT ok FROM bsz ORDER BY sz DESC, ok LIMIT 1),
seeds AS (
  SELECT DISTINCT l.l_partkey AS node
  FROM lineitem l JOIN pick ON l.l_orderkey = pick.ok
)"""

_PPR_EDGES_CTE = f"""
ew AS (
  SELECT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {LPA_MIN_WEIGHT}
),
edges AS (
  SELECT u AS src, v AS dst, 1 AS weight FROM ew
  UNION ALL
  SELECT v, u, 1 FROM ew
)"""


def _ppr_oracle() -> str:
    from bigdatamlteamrepo_spark.operators.pagerank import pagerank_cte_sql

    return (
        pagerank_cte_sql(
            _PPR_EDGES_CTE, n_iter=PPR_ROUNDS, seeds_cte=_SEEDS_CTE
        )
        + f"""
SELECT pr.node, pr.rank AS ppr_rank
FROM pr{PPR_ROUNDS} pr
ANTI JOIN seeds s ON pr.node = s.node
WHERE pr.rank > 0
ORDER BY pr.rank DESC, pr.node
LIMIT {PPR_TOP_K}
"""
    )


@query("part_ppr_recommendations", oracle=_ppr_oracle())
def part_ppr_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PPR_TOP_K} NON-seed parts by personalized PageRank
    (Jeh & Widom 2003) from the largest order's basket over the repeat
    co-purchase graph — the random-walk-with-restart recommender,
    {PPR_ROUNDS} integer rounds, bit-exact vs the unrolled-CTE oracle.

    Scale shape: seed selection is one aggregate + a 1-row equi-join;
    each PPR round is the same join+agg as global PageRank (proximity
    to seeds, not global centrality, is what the teleport restriction
    changes — not the plan)."""
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.operators.pagerank import integer_pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    bsz = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_partkey").alias("sz")
    )
    pick = bsz.orderBy(F.col("sz").desc(), "ok").limit(1).select("ok")
    seeds = (
        li.join(F.broadcast(pick), li.l_orderkey == pick.ok)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    e = _copurchase_edges(spark, sf_dir)
    edges = e.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.lit(1).alias("weight")
    ).unionAll(
        e.select(
            F.col("v").alias("src"), F.col("u").alias("dst"), F.lit(1).alias("weight")
        )
    )
    ranks = integer_pagerank(edges, n_iter=PPR_ROUNDS, seeds=seeds)
    return (
        ranks.filter(F.col("rank") > 0)
        .join(seeds, "node", "left_anti")
        .select("node", F.col("rank").alias("ppr_rank"))
        .orderBy(F.col("ppr_rank").desc(), "node")
        .limit(PPR_TOP_K)
    )


part_ppr_recommendations.__doc__ = part_ppr_recommendations.__doc__.format(
    PPR_TOP_K=PPR_TOP_K, PPR_ROUNDS=PPR_ROUNDS
)
