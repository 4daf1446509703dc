"""Prefix-filtering set-similarity join (operators/setjoin.py).

The contract is losslessness: the prefix-filtered join must equal the
O(n²) brute force exactly — including thresholds that are exact
rational multiples of set sizes (τ·n integral), where a float ceil
could shorten the prefix and silently drop pairs.
"""

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.setjoin import (
    brute_force_jaccard_join,
    prefix_jaccard_join,
)


def _rows(df):
    return sorted((r.id_a, r.id_b, round(r.jaccard, 9)) for r in df.collect())


@pytest.fixture(scope="module")
def shingle_sets(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.text_dedup import _shingle_sets

    return _shingle_sets(spark, sf_dir).withColumnRenamed("doc_id", "id")


@pytest.mark.parametrize("tau", [0.5, 0.8])
def test_lossless_vs_brute_force_corpus(spark, shingle_sets, tau):
    got = _rows(prefix_jaccard_join(shingle_sets, tau))
    want = _rows(brute_force_jaccard_join(shingle_sets, tau))
    assert got == want
    if tau == 0.5:
        assert len(want) > 0, "fixture corpus should contain near-dups"


def test_exact_rational_boundary(spark):
    # sets engineered so J(a,b) == τ exactly and τ·n is integral:
    # a={1..5}, b={1,2,3,6,7}: inter=3, union=7 → J=3/7; with
    # a={1..4}, b={1,2,3,5}: J=3/5=0.6 exactly at τ=0.6 — must be KEPT
    # (≥), and the prefix p = 4 - ceil(2.4) + 1 = 2 must still find it.
    rows = [
        (1, ["t1", "t2", "t3", "t4"]),
        (2, ["t1", "t2", "t3", "t5"]),
        (3, ["x1", "x2", "x3", "x4"]),
    ]
    df = spark.createDataFrame(rows, "id int, s array<string>")
    got = _rows(prefix_jaccard_join(df, 0.6))
    assert got == [(1, 2, 0.6)]


def test_singleton_sets_tau_one(spark):
    # n=1 → p = 1 - 1 + 1 = 1: identical singletons must pair at τ=1.0
    rows = [(1, ["a"]), (2, ["a"]), (3, ["b"])]
    df = spark.createDataFrame(rows, "id int, s array<string>")
    assert _rows(prefix_jaccard_join(df, 1.0)) == [(1, 2, 1.0)]


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, ["a"])], "id int, s array<string>")
    with pytest.raises(ValueError):
        prefix_jaccard_join(df, 0.0)


def test_no_cartesian_in_plan(spark, shingle_sets):
    plan = prefix_jaccard_join(shingle_sets, 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_candidate_volume_guard_trips_on_adversarial_corpus(spark):
    """An all-identical-sets corpus makes every prefix token df = n, so
    the predicted candidate volume is ~C(n,2)·p — the guard must refuse
    and point at the LSH path instead of launching the quadratic join."""
    import pytest

    from bigdatamlteamrepo_spark.operators.setjoin import (
        CandidateVolumeExceeded,
        prefix_jaccard_join,
    )

    toks = [f"t{j}" for j in range(10)]
    sets = spark.createDataFrame(
        [(i, toks) for i in range(200)], "id long, s array<string>"
    )
    with pytest.raises(CandidateVolumeExceeded, match="LSH"):
        prefix_jaccard_join(sets, 0.8, max_candidates=1_000).count()
    # same corpus with the guard lifted still returns the exact result
    n_pairs = prefix_jaccard_join(sets, 0.8, max_candidates=None).count()
    assert n_pairs == 200 * 199 // 2
