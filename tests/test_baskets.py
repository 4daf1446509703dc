"""Frequent-itemset mining: the Apriori-pruned pair counts must equal a
brute-force enumeration on a hand corpus with known supports, and the
rule statistics must be exact rationals (half-away micro units)."""

from __future__ import annotations

from itertools import combinations

from bigdatamlteamrepo_spark.queries.baskets import (
    MICRO,
    frequent_pairs,
)

#: hand corpus: 10 baskets over items a-d; supports known by inspection
_BASKETS = [
    (1, ["a", "b", "c"]),
    (2, ["a", "b"]),
    (3, ["a", "c"]),
    (4, ["a", "b", "d"]),
    (5, ["b", "c"]),
    (6, ["a"]),
    (7, ["b"]),
    (8, ["a", "b", "c"]),
    (9, ["c", "d"]),
    (10, ["a", "d"]),
]


def _df(spark):
    rows = [(ok, it) for ok, items in _BASKETS for it in items]
    return spark.createDataFrame(rows, "ok bigint, item string")


def _brute_pairs(minsup: int) -> dict[tuple[str, str], int]:
    supp: dict[tuple[str, str], int] = {}
    for _, items in _BASKETS:
        for u, v in combinations(sorted(set(items)), 2):
            supp[(u, v)] = supp.get((u, v), 0) + 1
    return {p: c for p, c in supp.items() if c >= minsup}


def test_pair_supports_match_brute_force(spark):
    # minsup 20% of 10 baskets = 2 occurrences
    got = {
        (r["item_a"], r["item_b"]): r["supp_ab"]
        for r in frequent_pairs(_df(spark), minsup_ppm=200_000).collect()
    }
    assert got == _brute_pairs(2)


def test_apriori_prune_cannot_drop_a_frequent_pair(spark):
    """Downward closure: every pair above minsup survives the item-level
    prune (both members of a frequent pair are themselves frequent)."""
    for ppm, minsup in [(100_000, 1), (300_000, 3), (500_000, 5)]:
        got = {
            (r["item_a"], r["item_b"])
            for r in frequent_pairs(_df(spark), minsup_ppm=ppm).collect()
        }
        assert got == set(_brute_pairs(minsup))


def test_supp_ppm_is_half_away_exact(spark):
    rows = frequent_pairs(_df(spark), minsup_ppm=200_000).collect()
    for r in rows:
        num, den = 2 * r["supp_ab"] * MICRO + 10, 2 * 10
        assert r["supp_ppm"] == num // den


def test_mega_basket_trips_volume_guard(spark):
    """An adversarial corpus — one basket holding 600 frequent items —
    predicts C(600,2)=179,700 pairs; with the guard bound lowered to
    100k the operator must refuse BEFORE launching the self-join, and
    must still run when the guard is disabled or the bound raised."""
    import pytest

    from bigdatamlteamrepo_spark.operators.setjoin import (
        CandidateVolumeExceeded,
    )

    rows = [(1, f"i{k}") for k in range(600)]
    # every item also appears in a second basket so all are frequent
    rows += [(2 + k, f"i{k}") for k in range(600)]
    mega = spark.createDataFrame(rows, "ok bigint, item string")
    with pytest.raises(CandidateVolumeExceeded, match="mega-basket|quadratic"):
        frequent_pairs(mega, minsup_ppm=1, max_candidates=100_000)
    # disabled → runs; predicted volume below the bound → runs
    assert frequent_pairs(mega, minsup_ppm=1, max_candidates=None).count() > 0
    assert frequent_pairs(mega, minsup_ppm=1, max_candidates=200_000).count() > 0


def test_tpch_baskets_far_below_guard(spark, sf_dir):
    """The registered queries run with the default guard on: TPC-H
    baskets (≤7 lineitems) predict orders of magnitude fewer pairs
    than the 50 M bound, so the default-guarded query still returns."""
    from bigdatamlteamrepo_spark.queries.baskets import basket_frequent_pairs

    assert basket_frequent_pairs(spark, sf_dir).count() > 0


def test_lift_decimal_survives_int64_overflow(spark):
    """The lift rational at 100 TB scale: supp_ab·N·1e6 with N=2e10
    baskets exceeds int64 (~4e22) — the DECIMAL(38,0) path must return
    the exact half-away quotient where bigint arithmetic would wrap."""
    n_baskets = 20_000_000_000  # 2e10 baskets (≈ SF 13k)
    supp_ab, supp_a, supp_c = 1_000_000_007, 4_000_000_001, 5_000_000_003
    df = spark.createDataFrame(
        [(supp_ab, supp_a, supp_c, n_baskets)],
        "supp_ab bigint, supp_a bigint, supp_c bigint, n_baskets bigint",
    )
    from pyspark.sql import functions as F

    got = df.select(
        F.expr(
            f"(2 * CAST(supp_ab AS DECIMAL(38,0)) * n_baskets * {MICRO}"
            "  + CAST(supp_a AS DECIMAL(38,0)) * supp_c)"
            " DIV (2 * CAST(supp_a AS DECIMAL(38,0)) * supp_c)"
        ).cast("bigint").alias("lift_micro")
    ).collect()[0]["lift_micro"]
    num = 2 * supp_ab * n_baskets * MICRO + supp_a * supp_c
    den = 2 * supp_a * supp_c
    assert num > 2**63  # the scenario genuinely overflows int64
    assert got == num // den


def test_rules_on_real_tables(spark, sf_dir):
    """Confidence/lift invariants on the registered query: conf ≤ 1e6
    unless antecedent implies consequent in every basket; lift is
    symmetric for (a,b)/(b,a) pairs; both directions of every frequent
    pair appear before the confidence filter cuts."""
    from bigdatamlteamrepo_spark.queries.baskets import (
        basket_association_rules,
        basket_frequent_pairs,
    )

    pairs = basket_frequent_pairs(spark, sf_dir).collect()
    rules = basket_association_rules(spark, sf_dir).collect()
    assert pairs and rules
    lift = {}
    for r in rules:
        assert 0 < r["conf_micro"] <= MICRO
        key = tuple(sorted((r["antecedent"], r["consequent"])))
        lift.setdefault(key, set()).add(r["lift_micro"])
    # lift(a→b) == lift(b→a) exactly (same rational, same rounding)
    for key, vals in lift.items():
        assert len(vals) == 1, (key, vals)
