"""Frequent-itemset mining and association rules (market basket).

The classic retail-analytics workload (Agrawal & Srikant 1994, Apriori;
Han et al. 2000, FP-growth) over the order/part data: baskets are
orders, items are the distinct part BRANDS in the order (25 brands →
meaningful co-occurrence statistics at every SF, unlike raw part keys
whose pair supports are ~1 under TPC-H's uniform draw).

Distributed shape (the part that matters at 100 TB):

* **Apriori candidate pruning as a semi-join.**  Frequent 1-itemsets
  are a 25-row aggregate; only baskets' frequent items enter pair
  generation.  The prune is a broadcast semi-join BEFORE the pair
  fan-out, so infrequent items never pay the quadratic cost — the
  downward-closure property executed as a plan, not a loop.
* **Bounded pair fan-out — with a volume guard.**  Pair generation is
  a per-basket self-join on the basket key; baskets are small and
  bounded (≤16 lineitems → ≤16 distinct brands), so the blow-up is
  O(1) per basket and the only large shuffle keys on the basket id
  both sides — one co-partitioned join, then a map-side-combinable
  count per (u, v).  Because "bounded" is a property of the DATA, not
  the plan, :func:`frequent_pairs` predicts the exact fan-out
  Σ C(f_basket, 2) from one histogram agg before joining and raises
  ``CandidateVolumeExceeded`` past 50 M candidate pairs (an
  adversarial mega-basket of frequent items is quadratic in that
  basket alone).
* **Exact integer statistics.**  Support counts are integers;
  confidence and lift are emitted as half-away-from-zero micro units
  via pure integer arithmetic (``(2·a·1e6 + b) DIV (2·b)``) — the same
  rationals-of-integers discipline as ``queries/textmodel.py`` (DSIR),
  so DuckDB and Spark can never disagree on a rounded tie.

Reference parity: extends the reference's co-occurrence analytics
(category_model.ipynb:c0 groupBy counting; MLP.ipynb's crosstab) to the
canonical frequent-pattern workload a recommendation pipeline runs.

100 TB note: minsup is RELATIVE (share of baskets), so the frequent-set
size is scale-free; the item→basket explode is linear in lineitem; no
stage materializes more than (frequent-items²) candidate rows per
basket.  For k≥3 itemsets the same prune chains (frequent pairs
semi-join before triple fan-out) — pairs and rules are the workload's
head and what this face pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators.setjoin import CandidateVolumeExceeded
from bigdatamlteamrepo_spark.queries.registry import query

#: relative minimum support: an itemset must appear in ≥1% of baskets
MINSUP_REL_PPM = 10_000  # parts-per-million of n_baskets, integer-exact
#: minimum rule confidence in micro units (10%)
MIN_CONF_MICRO = 100_000
#: fixed-point scale shared with the textmodel tier
MICRO = 1_000_000
#: refuse pair fan-outs predicted to emit more than this many raw
#: candidate rows (same guard bound as ``operators/setjoin.py``): a
#: single mega-basket of f frequent items contributes C(f, 2) pairs,
#: so an adversarial corpus can turn the "bounded per-basket" claim
#: quadratic — predict the volume from one histogram agg and refuse
#: loudly instead of launching the shuffle.
MAX_PAIR_CANDIDATES = 50_000_000

_BASKETS_SQL = """
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
"""

_PAIRS_CORE_SQL = f"""
WITH b AS ({_BASKETS_SQL}),
n AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM b),
item1 AS (
  SELECT item, COUNT(*) AS supp
  FROM b GROUP BY item
  HAVING COUNT(*) * {MICRO} >= {MINSUP_REL_PPM} * (SELECT n_baskets FROM n)
),
bf AS (
  SELECT b.ok, b.item FROM b JOIN item1 ON b.item = item1.item
),
pair AS (
  SELECT b1.item AS item_a, b2.item AS item_b, COUNT(*) AS supp_ab
  FROM bf b1 JOIN bf b2 ON b1.ok = b2.ok AND b1.item < b2.item
  GROUP BY 1, 2
  HAVING COUNT(*) * {MICRO} >= {MINSUP_REL_PPM} * (SELECT n_baskets FROM n)
)
"""

_FREQ_PAIRS_ORACLE = (
    _PAIRS_CORE_SQL
    + f"""
SELECT item_a, item_b, supp_ab,
       (2 * supp_ab * {MICRO} + (SELECT n_baskets FROM n))
         // (2 * (SELECT n_baskets FROM n)) AS supp_ppm
FROM pair
"""
)


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("item"))
        .distinct()
    )


def _half_away_expr(num_sql: str, den_sql: str):
    """Half-away-from-zero integer division of non-negative BIGINTs as
    a SQL expression over column names — pure BIGINT arithmetic end to
    end (no double round-trip: the numerators here exceed 2^53, where
    double division silently loses units), bit-identical in Spark
    (``DIV``) and DuckDB (``//``) — the DSIR idiom from
    ``queries/textmodel.py:338``."""
    return F.expr(
        f"(2 * ({num_sql}) + ({den_sql})) DIV (2 * ({den_sql}))"
    ).cast("bigint")


def frequent_pairs(
    b: DataFrame,
    minsup_ppm: int = MINSUP_REL_PPM,
    max_candidates: int | None = MAX_PAIR_CANDIDATES,
) -> DataFrame:
    """Frequent 1-itemset prune → per-basket pair fan-out → pair counts.

    ``b`` is the (ok, item) basket table.  Returns
    (item_a, item_b, supp_ab, supp_ppm) for pairs at/above minsup.

    **Candidate-volume guard**: the per-basket fan-out is quadratic in
    the number of FREQUENT items a basket holds — bounded on order-like
    baskets (TPC-H: ≤7 lineitems), but an adversarial corpus with one
    mega-basket of frequent items is C(f, 2) for that basket alone.
    Before the self-join, one histogram agg over the pruned basket
    table predicts the exact pair volume Σ_basket C(f_basket, 2); if it
    exceeds ``max_candidates`` the operator raises
    :class:`~bigdatamlteamrepo_spark.operators.setjoin.CandidateVolumeExceeded`
    (pass ``max_candidates=None`` to disable).  The prediction is a
    bounded scalar agg (one row to the driver), the same honesty idiom
    as ``operators/setjoin.py``."""
    n = b.agg(F.countDistinct("ok").alias("n_baskets"))
    item1 = (
        b.groupBy("item")
        .agg(F.count(F.lit(1)).alias("supp"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("supp") * MICRO >= F.lit(minsup_ppm) * F.col("n_baskets"))
        .select("item", "supp")
    )
    # Apriori prune: broadcast the (tiny) frequent-item set before fan-out
    bf = b.join(F.broadcast(item1.select("item")), "item").select("ok", "item")
    if max_candidates is not None:
        twice_pairs = (
            bf.groupBy("ok")
            .agg(F.count(F.lit(1)).alias("f"))
            .agg(F.sum(F.col("f") * (F.col("f") - F.lit(1))).alias("tp"))
            .collect()[0]["tp"]
        )
        predicted = (twice_pairs or 0) // 2
        if predicted > max_candidates:
            raise CandidateVolumeExceeded(
                f"basket pair fan-out predicts {predicted:,} candidate "
                f"pairs (> {max_candidates:,}): a basket with f frequent "
                "items emits C(f,2) pairs, and this corpus is in the "
                "quadratic regime.  Raise minsup_ppm (fewer frequent "
                "items per basket), cap basket size upstream, or pass "
                "max_candidates=None deliberately."
            )
    b1 = bf.select("ok", F.col("item").alias("item_a"))
    b2 = bf.select("ok", F.col("item").alias("item_b"))
    pair = (
        b1.join(b2, "ok")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("supp_ab") * MICRO >= F.lit(minsup_ppm) * F.col("n_baskets")
        )
    )
    return pair.select(
        "item_a",
        "item_b",
        "supp_ab",
        _half_away_expr(f"supp_ab * {MICRO}", "n_baskets").alias("supp_ppm"),
    )


@query("basket_frequent_pairs", oracle=_FREQ_PAIRS_ORACLE)
def basket_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent brand pairs (support ≥1% of baskets) over the order
    baskets — Apriori downward-closure prune as a broadcast semi-join,
    pair fan-out bounded by basket size.  See module docstring."""
    return frequent_pairs(_baskets(spark, sf_dir))


_RULES_ORACLE = (
    _PAIRS_CORE_SQL
    + f"""
, directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, supp_ab FROM pair
  UNION ALL
  SELECT item_b, item_a, supp_ab FROM pair
)
SELECT d.antecedent, d.consequent, d.supp_ab,
       (2 * d.supp_ab * {MICRO} + ia.supp) // (2 * ia.supp) AS conf_micro,
       CAST((2 * CAST(d.supp_ab AS HUGEINT) * (SELECT n_baskets FROM n)
               * {MICRO} + CAST(ia.supp AS HUGEINT) * ic.supp)
         // (2 * CAST(ia.supp AS HUGEINT) * ic.supp) AS BIGINT)
         AS lift_micro
FROM directed d
JOIN item1 ia ON d.antecedent = ia.item
JOIN item1 ic ON d.consequent = ic.item
WHERE (2 * d.supp_ab * {MICRO} + ia.supp) // (2 * ia.supp)
        >= {MIN_CONF_MICRO}
"""
)


@query("basket_association_rules", oracle=_RULES_ORACLE)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules a→b from the frequent pairs: confidence
    supp(ab)/supp(a) and lift supp(ab)·N/(supp(a)·supp(b)), both as
    half-away-rounded integer micro units (exact rational arithmetic —
    no float reduction anywhere).  The rule join is 25-row × 25-row
    (frequent items are broadcast); the only big work is the shared
    pair-count stage."""
    b = _baskets(spark, sf_dir)
    n = b.agg(F.countDistinct("ok").alias("n_baskets"))
    item1 = (
        b.groupBy("item")
        .agg(F.count(F.lit(1)).alias("supp"))
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("supp") * MICRO >= F.lit(MINSUP_REL_PPM) * F.col("n_baskets")
        )
        .select("item", "supp")
    )
    pair = frequent_pairs(b).select("item_a", "item_b", "supp_ab")
    # both rule directions in ONE pass over the pair table: a union of
    # two selects would plan (and execute) the whole pair-count stage
    # twice; the explode emits (a→b, b→a) from each row instead
    directed = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("supp_ab").alias("supp_ab"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("supp_ab").alias("supp_ab"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    ia = F.broadcast(
        item1.select(F.col("item").alias("antecedent"), F.col("supp").alias("supp_a"))
    )
    ic = F.broadcast(
        item1.select(F.col("item").alias("consequent"), F.col("supp").alias("supp_c"))
    )
    return (
        directed.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "supp_ab",
            _half_away_expr(f"supp_ab * {MICRO}", "supp_a").alias("conf_micro"),
            # the lift numerator supp_ab·N·1e6 grows as N² (supp_ab is a
            # share of N baskets) and the denominator supp_a·supp_c too:
            # past ~SF10 (~1.5e7 baskets) both exceed int64, so the
            # rational runs in DECIMAL(38,0) (HUGEINT in the oracle) and
            # only the rounded micro quotient comes back as BIGINT —
            # values bit-identical at every SF where int64 sufficed.
            F.expr(
                f"(2 * CAST(supp_ab AS DECIMAL(38,0)) * n_baskets * {MICRO}"
                "  + CAST(supp_a AS DECIMAL(38,0)) * supp_c)"
                " DIV (2 * CAST(supp_a AS DECIMAL(38,0)) * supp_c)"
            ).cast("bigint").alias("lift_micro"),
        )
        .filter(F.col("conf_micro") >= MIN_CONF_MICRO)
    )
