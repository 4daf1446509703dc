"""Weighted median: brute-force cumulative selection on random data,
the defining hand cases (one heavy row outvotes many light ones, exact
half split takes the lower value), unit weights == plain lower median,
and face invariants."""

from __future__ import annotations

import random

from bigdatamlteamrepo_spark.queries.wmedian import weighted_median


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v bigint, w bigint")


def _brute(pairs):
    """Smallest v with 2·W(≤v) ≥ W_total."""
    tot = sum(w for _, w in pairs)
    cum = 0
    for v, w in sorted(pairs):
        cum += w
        if 2 * cum >= tot:
            return v
    raise AssertionError("unreachable for non-empty input")


def test_matches_brute_force_on_random_data(spark):
    rng = random.Random(13)
    rows, want = [], {}
    for g in "abcd":
        pairs = [
            (rng.randrange(20), rng.randrange(1, 9))
            for _ in range(rng.randrange(3, 40))
        ]
        rows += [(g, v, w) for v, w in pairs]
        want[g] = _brute(pairs)
    got = {
        r["g"]: r["wmedian"]
        for r in weighted_median(
            _df(spark, rows), group="g", value="v", weight="w"
        ).collect()
    }
    assert got == want


def test_heavy_row_outvotes_many_light_rows(spark):
    """One 50-unit line at price 7 vs ten 1-unit lines at price 100:
    the weighted median is 7 (the plain median would say 100)."""
    rows = [("g", 7, 50)] + [("g", 100, 1)] * 10
    r = weighted_median(
        _df(spark, rows), group="g", value="v", weight="w"
    ).collect()[0]
    assert r["wmedian"] == 7 and r["total_weight"] == 60


def test_exact_half_takes_lower_value(spark):
    """W(≤3) == W_total/2 exactly → 2·cumw ≥ tot holds at 3, the LOWER
    weighted median convention both engines must share."""
    rows = [("g", 3, 5), ("g", 9, 5)]
    r = weighted_median(
        _df(spark, rows), group="g", value="v", weight="w"
    ).collect()[0]
    assert r["wmedian"] == 3


def test_unit_weights_equal_plain_lower_median(spark):
    rng = random.Random(29)
    vals = [rng.randrange(100) for _ in range(31)]  # odd count
    rows = [("g", v, 1) for v in vals]
    r = weighted_median(
        _df(spark, rows), group="g", value="v", weight="w"
    ).collect()[0]
    assert r["wmedian"] == sorted(vals)[15]


def test_duplicate_values_merge_weights(spark):
    """Repeated v rows act as one mass point — the groupBy-first plan
    and the definition agree."""
    rows = [("g", 5, 2), ("g", 5, 2), ("g", 1, 3)]
    r = weighted_median(
        _df(spark, rows), group="g", value="v", weight="w"
    ).collect()[0]
    assert r["wmedian"] == 5  # W(≤1)=3 < 3.5; W(≤5)=7 ≥ 3.5


def test_face_median_lies_in_observed_range(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    rows = QUERIES["brand_weighted_median_price"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_lineitems"] > 0
        assert r["total_qty"] >= r["n_lineitems"]  # quantities ≥ 1
        assert 80_000 <= r["wmedian_price_cents"] <= 12_000_000


def test_validate_rejects_negative_weights(spark):
    """The eager guard: validate=True turns the documented
    positive-weight precondition into a fail-fast error (one scalar
    min-aggregate) instead of a silently wrong median."""
    import pytest

    from bigdatamlteamrepo_spark.queries.wmedian import NegativeWeightError

    bad = _df(spark, [("a", 1, 5), ("a", 2, -3), ("a", 3, 5)])
    with pytest.raises(NegativeWeightError, match="min\\(w\\) = -3"):
        weighted_median(bad, group="g", value="v", weight="w", validate=True)


def test_validate_passes_clean_input_unchanged(spark):
    """validate=True on non-negative weights (zero included) returns
    exactly what the unvalidated path returns."""
    rows = [("a", 1, 2), ("a", 2, 0), ("a", 3, 2), ("b", 7, 1)]
    df = _df(spark, rows)
    want = {
        (r["g"], r["total_weight"], r["wmedian"])
        for r in weighted_median(
            df, group="g", value="v", weight="w"
        ).collect()
    }
    got = {
        (r["g"], r["total_weight"], r["wmedian"])
        for r in weighted_median(
            df, group="g", value="v", weight="w", validate=True
        ).collect()
    }
    assert got == want
