"""Graph motif counting: triangles over the part co-purchase graph.

Completes the graph tier (connected components in ``operators/graph.py``,
PageRank in ``operators/pagerank.py``) with the third classic
distributed-graph primitive — triangle counting, the building block of
clustering coefficients and community detection.

Graph: parts are nodes; an undirected edge connects two parts that
co-occur in at least one order (the co-purchase graph derived from
``lineitem``).

Algorithm: **degree-ordered orientation** (the MapReduce triangle
counting of Suri & Vassilvitskii 2011, "Counting triangles and the
curse of the last reducer").  Each undirected edge is oriented from its
(degree, id)-smaller endpoint to the larger; the orientation is acyclic
and every triangle then has exactly ONE vertex with two out-edges, so

    #triangles  =  |{wedges (a→b, a→c), ord(b) < ord(c),
                     with oriented edge b→c}|

Why it matters at scale: the naive id-ordered join builds wedges at
every high-degree hub (a node of degree d contributes O(d²) wedges —
the "curse of the last reducer" on power-law graphs).  Degree ordering
caps out-degree at O(√|E|), bounding per-node wedge work and the skew
of the wedge-build shuffle.  Everything is integer counts over
equi-joins — exactly reproducible in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

_TRI_ORACLE = """
WITH e AS (
  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
o AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dst_d
  FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
),
w AS (
  SELECT o1.dst AS b, o2.dst AS c
  FROM o o1 JOIN o o2 ON o1.src = o2.src
  WHERE (o1.dst_d, o1.dst) < (o2.dst_d, o2.dst)
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*) FROM w JOIN o ON w.b = o.src AND w.c = o.dst)
         AS n_triangles
"""


def cooccurrence_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct undirected part co-purchase edges (u < v) from lineitem.

    The self-join keys on ``l_orderkey`` — order groups are small and
    bounded (≤7 lineitems in TPC-H proper, ≤16 in the driver tables),
    so the per-order pair fan-out is O(1) and the join shuffles both
    sides on the same key once."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    return (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def oriented_edges(e: DataFrame) -> DataFrame:
    """Orient each undirected edge from its (degree, id)-smaller endpoint;
    carries the destination's ordering key for the wedge comparison."""
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    j = e.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return j.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_d"),
    )


def triangle_count(e: DataFrame) -> DataFrame:
    """(n_nodes, n_edges, n_triangles) of an undirected edge set (u < v,
    distinct).  Wedges are built on out-neighbors only (out-degree is
    O(√|E|) after degree ordering), then matched against the oriented
    edge list — two equi-joins, no row ever carries more than three ids."""
    e = e.localCheckpoint(eager=True)  # reused by degree, wedge and probe sides
    o = oriented_edges(e).localCheckpoint(eager=True)
    o1 = o.select(F.col("src"), F.col("dst").alias("b"), F.col("dst_d").alias("bd"))
    o2 = o.select(F.col("src"), F.col("dst").alias("c"), F.col("dst_d").alias("cd"))
    wedges = o1.join(o2, "src").filter(
        (F.col("bd") < F.col("cd"))
        | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
    )
    closed = wedges.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")), ["b", "c"]
    )
    n_nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .count()
    )
    spark = e.sparkSession
    return spark.createDataFrame(
        [(n_nodes, e.count(), closed.count())],
        "n_nodes bigint, n_edges bigint, n_triangles bigint",
    )


@query("part_cooccurrence_triangles", oracle=_TRI_ORACLE)
def part_cooccurrence_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph — see module
    docstring for the degree-ordered plan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return triangle_count(cooccurrence_edges(li))


# --------------------------------------------------------------------------
# Community detection: synchronous label propagation (LPA).
# --------------------------------------------------------------------------

#: LPA rounds — FIXED, not run-to-convergence: synchronous LPA can
#: oscillate on bipartite structures, and a fixed round count makes the
#: computation a pure deterministic function both engines replay
#: identically (the integer-PageRank lesson in operators/pagerank.py)
LPA_ROUNDS = 4
#: minimum co-purchase weight for an LPA edge — ≥2 repeat co-purchases
#: keeps the graph sparse (the weight-1 layer under TPC-H's uniform
#: draw is near-random noise that merges everything into one blob)
LPA_MIN_WEIGHT = 2


def _lpa_oracle() -> str:
    """Unrolled LPA rounds (Raghavan et al. 2007, synchronous variant,
    min-label tie-break) as chained CTEs — each round is mode-of-
    neighbor-labels via a windowed argmax, exactly the Spark plan."""
    parts = [
        f"""
WITH ew AS (
  SELECT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {LPA_MIN_WEIGHT}
),
adj AS (
  SELECT u AS node, v AS nbr FROM ew UNION ALL SELECT v, u FROM ew
),
l0 AS (
  SELECT DISTINCT node, node AS lbl FROM adj
)"""
    ]
    for r in range(1, LPA_ROUNDS + 1):
        parts.append(
            f""",
n{r} AS (
  SELECT a.node, l.lbl, COUNT(*) AS c
  FROM adj a JOIN l{r - 1} l ON a.nbr = l.node
  GROUP BY a.node, l.lbl
),
l{r} AS (
  SELECT node, lbl FROM n{r}
  QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) = 1
)"""
        )
    parts.append(
        f"\nSELECT node, lbl AS community FROM l{LPA_ROUNDS}"
    )
    return "".join(parts)


def label_propagation(e: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """Synchronous LPA over an undirected (u, v) edge set: every node
    starts as its own label; each round every node adopts the most
    frequent label among its neighbors (ties → smallest label).

    Distributed shape per round: one (node, lbl) count aggregation
    (map-side combinable) + one per-node argmax executed as a hash
    aggregation of ``max(struct(c, -lbl))`` — NOT a sort window, so no
    per-node sort and the partial agg combines map-side; ties break to
    the smallest label because -lbl maximizes at the minimum.  O(|E|)
    shuffled bytes, no all-pairs anything.  ``localCheckpoint`` per
    round truncates the lineage so the plan does not double every
    round (the star-contraction lesson in ``operators/graph.py``).
    Rounds are FIXED for cross-engine determinism; see ``LPA_ROUNDS``."""
    adj = (
        e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    labels = adj.select("node").distinct().withColumn("lbl", F.col("node"))
    for _ in range(rounds):
        cand = adj.join(
            labels.select(F.col("node").alias("nbr"), "lbl"), "nbr"
        ).select("node", "lbl")
        cnt = cand.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
                ).alias("m")
            )
            .select("node", (-F.col("m.nl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))


@query("part_copurchase_communities", bench=True, oracle=_lpa_oracle())
def part_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities of the REPEAT co-purchase graph (edge weight ≥
    {LPA_MIN_WEIGHT}) after {LPA_ROUNDS} synchronous LPA rounds — the
    classic near-linear community detector, here as a fully
    deterministic cross-engine query (per-node final assignment)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= LPA_MIN_WEIGHT)
        .select("u", "v")
    )
    return label_propagation(e)


# --------------------------------------------------------------------------
# Local clustering coefficient (per-node triangle census).
# --------------------------------------------------------------------------

_LCC_ORACLE = f"""
WITH ew AS (
  SELECT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {LPA_MIN_WEIGHT}
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM ew UNION ALL SELECT v FROM ew
  ) GROUP BY node
),
o AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dst_d
  FROM ew e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
),
tri AS (
  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
  FROM o o1 JOIN o o2 ON o1.src = o2.src
  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst
  WHERE (o1.dst_d, o1.dst) < (o2.dst_d, o2.dst)
),
pernode AS (
  SELECT node, COUNT(*) AS n_tri FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT deg.node, deg.d AS degree,
       COALESCE(pernode.n_tri, 0) AS n_triangles,
       (2 * 2 * COALESCE(pernode.n_tri, 0) * 1000000 + deg.d * (deg.d - 1))
         // (2 * deg.d * (deg.d - 1)) AS lcc_ppm
FROM deg LEFT JOIN pernode ON deg.node = pernode.node
WHERE deg.d >= 2
"""


@query("part_local_clustering", oracle=_LCC_ORACLE)
def part_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the repeat co-purchase
    graph: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), emitted as
    half-away integer ppm (exact rational — the Watts-Strogatz
    statistic without a float reduction anywhere).

    Same degree-ordered wedge plan as the global census
    (:func:`part_cooccurrence_triangles` — out-degree bounded by
    O(√|E|)), but each closed wedge credits ALL THREE corners via a
    3-struct explode, then one per-node count.  High lcc + low degree
    = tight bundle; high degree + low lcc = hub — the
    recommendation-quality split."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= LPA_MIN_WEIGHT)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    o = oriented_edges(e).localCheckpoint(eager=True)
    o1 = o.select("src", F.col("dst").alias("b"), F.col("dst_d").alias("bd"))
    o2 = o.select("src", F.col("dst").alias("c"), F.col("dst_d").alias("cd"))
    wedges = o1.join(o2, "src").filter(
        (F.col("bd") < F.col("cd"))
        | ((F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c")))
    )
    tri = wedges.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")), ["b", "c"]
    ).select(F.col("src").alias("a"), "b", "c")
    corners = tri.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    pernode = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    return (
        deg.filter(F.col("d") >= 2)
        .join(pernode, "node", "left")
        .na.fill({"n_tri": 0})
        .select(
            "node",
            F.col("d").alias("degree"),
            F.col("n_tri").cast("bigint").alias("n_triangles"),
            F.expr(
                "(2 * 2 * n_tri * 1000000 + d * (d - 1))"
                " DIV (2 * d * (d - 1))"
            ).alias("lcc_ppm"),
        )
    )


# --------------------------------------------------------------------------
# k-core: fixed-round degree peel.
# --------------------------------------------------------------------------

#: core order (minimum degree inside the surviving subgraph)
KCORE_K = 3
#: fixed peel rounds — same determinism rationale as LPA_ROUNDS; on
#: these graphs the peel reaches its fixpoint well inside the budget,
#: and a fixed count keeps the unrolled oracle exactly the Spark loop
KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    parts = [
        f"""
WITH ew AS (
  SELECT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {LPA_MIN_WEIGHT}
),
e0 AS (SELECT u, v FROM ew)"""
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f""",
d{r} AS (
  SELECT node FROM (
    SELECT u AS node FROM e{r - 1} UNION ALL SELECT v FROM e{r - 1}
  ) GROUP BY node HAVING COUNT(*) >= {KCORE_K}
),
e{r} AS (
  SELECT e.u, e.v FROM e{r - 1} e
  JOIN d{r} a ON e.u = a.node JOIN d{r} b ON e.v = b.node
)"""
        )
    parts.append(
        f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
  SELECT u AS node FROM e{KCORE_ROUNDS}
  UNION ALL SELECT v FROM e{KCORE_ROUNDS}
) GROUP BY node"""
    )
    return "".join(parts)


def kcore_peel(e: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> DataFrame:
    """Fixed-round k-core peel of an undirected (u, v) edge set: each
    round drops every node whose CURRENT degree is < k, then restricts
    the edge set to surviving endpoints.  Returns the surviving nodes
    with their in-core degree.

    Per round: one degree count (map-side combinable) + two hash
    semi-equi-joins — O(|E|) shuffled bytes, lineage truncated per
    round.  Rounds are FIXED (see :data:`KCORE_ROUNDS`): both engines
    replay the identical prefix of the peel sequence, converged or
    not, so parity never depends on a fixpoint test."""
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("node")
        )
        e = (
            e.join(deg.withColumnRenamed("node", "u"), "u")
            .join(deg.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


@query("part_kcore_membership", oracle=_kcore_oracle())
def part_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes surviving a {KCORE_ROUNDS}-round {KCORE_K}-core peel of
    the repeat co-purchase graph, with their in-core degree — the
    density skeleton recommendation/fraud pipelines mine (a hub with
    pendant noise peels away; a dense bundle survives)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= LPA_MIN_WEIGHT)
        .select("u", "v")
    )
    return kcore_peel(e)
