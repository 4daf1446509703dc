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
