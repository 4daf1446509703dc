"""Integer-arithmetic PageRank over an edge DataFrame.

Classic damped PageRank, but every quantity is a scaled BIGINT so the
fixed-iteration result is bit-identical under any partitioning AND
expressible as a DuckDB oracle (chained CTEs, one per iteration) — the
same exactness strategy as the decimal aggregates in queries/relational
and the integer universal hashes in functions/text.

Arithmetic contract (all floor divisions, both engines agree exactly):
  share(u→v)  = (w(u→v) · 2^20) // W_out(u)          ∈ [0, 2^20]
  contrib     = (rank(u) · share) // 2^20
  rank'(v)    = (15·scale) // 100  +  (85 · Σ contrib(→v)) // 100

Exactness bound: rank ≤ n·scale, so rank·share < n·scale·2^20 must stay
below 2^63 — with the default scale 10^9 that allows graphs up to ~8 000
nodes of TOTAL mass; pass a smaller ``scale`` for larger graphs.  Mass
floor-lost to share rounding and dangling nodes (no out-edges) simply
decays — the defined algorithm, not an approximation of float PageRank.

At cluster scale each iteration is one shuffle (join ranks⋈edges on src,
aggregate on dst); lineage is truncated per iteration with an eager
``operators.checkpoint.truncate`` — executor-local by default, reliable
``checkpoint`` when the session has a checkpoint dir configured — so 10
iterations never replay 10 joins and a cluster run survives executor
loss (same pattern as operators/graph.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.checkpoint import truncate

#: share scale — 2^20 per-edge weight granularity
SHARE_SCALE = 1 << 20


def integer_pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    scale: int = 10**9,
    damping: tuple[int, int] = (85, 100),
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank over ``edges(src, dst, weight)`` → ``(node, rank)``.

    ``rank`` is the scaled BIGINT score (initial mass = ``scale`` per
    node); divide by ``scale`` for a float score.  Deterministic:
    integer sums are order-independent, so the result is independent of
    partitioning and AQE decisions.

    ``seeds`` (a ``node``-column frame) switches to **personalized**
    PageRank (Jeh & Widom 2003, "Scaling Personalized Web Search"):
    teleport mass lands ONLY on the seed set and the walk starts there
    (rank₀ = ``scale`` on seeds, 0 elsewhere), so rank measures
    proximity to the seeds — the recommendation/similarity variant.
    Seeds absent from the graph contribute nothing.  Mass is injected
    per-seed (not split), which rescales every rank by a constant —
    orderings and ratios are the defined output, as with the mass
    floor-loss of the global variant.
    """
    num, den = damping
    teleport = (100 - num) * scale // den

    # nodes joins into EVERY iteration — truncate it once, or each round
    # replays the node derivation from the raw edge lineage (for a
    # corpus-derived graph that is a full re-scan per iteration)
    nodes = truncate(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if seeds is not None:
        nodes = truncate(
            nodes.join(
                seeds.select(F.col("node").alias("__s")).distinct(),
                nodes["node"] == F.col("__s"),
                "left_outer",
            ).select(
                "node",
                # explicit membership flag: the oracle's nt CTE gates r0 on
                # s.node IS NULL, not on t > 0 — if teleport floors to 0
                # (e.g. damping (100, 100), or scale < den/(100-num)) the
                # two tests diverge, so init must use the flag
                F.col("__s").isNotNull().alias("__is_seed"),
                F.when(F.col("__s").isNull(), F.lit(0))
                .otherwise(F.lit(teleport))
                .cast("long")
                .alias("__t"),
            )
        )
    outw = edges.groupBy("src").agg(F.sum("weight").alias("tw"))
    shares = (
        edges.join(outw, "src")
        .select(
            "src",
            "dst",
            # CAST before multiplying: with an IntegerType weight column
            # int*int wraps at 32 bits in non-ANSI Spark (weight >= 2048
            # would overflow SHARE_SCALE scaling) while the DuckDB oracle
            # promotes — mirror the BIGINT cast the oracle's outw CTE does.
            F.expr(f"(CAST(weight AS BIGINT) * {SHARE_SCALE}) div tw").alias("share"),
        )
    )
    shares = truncate(shares)

    if seeds is None:
        init = F.lit(scale).cast("long")
        tele_col = F.lit(teleport)
    else:
        init = (
            F.when(F.col("__is_seed"), F.lit(scale)).otherwise(F.lit(0)).cast("long")
        )
        tele_col = F.col("__t")

    ranks = nodes.select("node", init.alias("rank"))
    for _ in range(n_iter):
        incoming = (
            ranks.join(shares, ranks["node"] == shares["src"])
            .select("dst", F.expr(f"(rank * share) div {SHARE_SCALE}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            nodes.join(incoming, nodes["node"] == incoming["dst"], "left_outer")
            .select(
                "node",
                (
                    tele_col
                    + F.expr(f"({num} * coalesce(inc, 0L)) div {den}")
                ).cast("long").alias("rank"),
            )
        )
        ranks = truncate(ranks)
    return ranks if seeds is None else ranks.select("node", "rank")


def pagerank_cte_sql(
    edges_cte: str,
    n_iter: int = 10,
    scale: int = 10**9,
    damping: tuple[int, int] = (85, 100),
    seeds_cte: str | None = None,
) -> str:
    """DuckDB oracle prefix: chained CTEs ``pr0 … pr{n_iter}`` mirroring
    :func:`integer_pagerank` iteration-for-iteration.  ``edges_cte`` must
    define ``edges(src, dst, weight)``; callers SELECT from ``pr{n_iter}``.
    Unrolled rather than WITH RECURSIVE so every step is plain,
    inspectable SQL with the identical floor-division arithmetic.

    ``seeds_cte`` (defining ``seeds(node)``) mirrors the personalized
    variant: teleport and initial mass only on graph nodes that are
    seeds.
    """
    num, den = damping
    teleport = (100 - num) * scale // den
    parts = [
        edges_cte.strip().rstrip(","),
        "outw AS (SELECT src, CAST(SUM(weight) AS BIGINT) AS tw FROM edges GROUP BY src)",
        f"shares AS (SELECT src, dst, (weight * {SHARE_SCALE}) // tw AS share"
        " FROM edges JOIN outw USING (src))",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
    ]
    if seeds_cte is None:
        node_src, tele_sql = "nodes", str(teleport)
        parts.append(
            f"pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)"
        )
    else:
        parts.append(seeds_cte.strip().rstrip(","))
        # MATERIALIZED: nt is referenced once per unrolled round — let
        # DuckDB compute the node⋈seed flags once, not 3^rounds times
        # (the kcore-oracle inlining lesson)
        parts.append(
            "nt AS MATERIALIZED (SELECT n.node,"
            f" CASE WHEN s.node IS NULL THEN 0 ELSE {teleport} END AS t,"
            f" CASE WHEN s.node IS NULL THEN 0 ELSE {scale} END AS r0"
            " FROM nodes n LEFT JOIN (SELECT DISTINCT node FROM seeds) s"
            " ON n.node = s.node)"
        )
        node_src, tele_sql = "nt", "n.t"
        parts.append("pr0 AS (SELECT node, CAST(r0 AS BIGINT) AS rank FROM nt)")
    for i in range(1, n_iter + 1):
        parts.append(
            f"pr{i} AS (SELECT n.node, CAST({tele_sql} + ({num} *"
            f" COALESCE(inc.s, 0)) // {den} AS BIGINT) AS rank"
            f" FROM {node_src} n LEFT JOIN (SELECT dst,"
            " CAST(SUM((rank * share) // {ss}) AS BIGINT) AS s"
            f" FROM pr{i - 1} JOIN shares ON pr{i - 1}.node = shares.src"
            " GROUP BY dst) inc ON inc.dst = n.node)".replace(
                "{ss}", str(SHARE_SCALE)
            )
        )
    return "WITH " + ",\n".join(parts)
