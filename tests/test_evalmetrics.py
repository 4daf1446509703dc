"""Exact grouped AUC: brute-force pair counting P(s⁺>s⁻) + ½P(=) on
random data, the closed-form endpoints (perfect / inverted / constant
scorer), undefined-group dropping, and the face's output range."""

from __future__ import annotations

import random

from bigdatamlteamrepo_spark.queries.evalmetrics import MICRO, exact_grouped_auc


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "g string, score bigint, label int"
    )


def _auc_pairs(scores_pos, scores_neg):
    """The probabilistic definition: over all (pos, neg) pairs, wins
    count 1, ties ½ — doubled to stay integer, then half-away micro."""
    wins2 = 0
    for p in scores_pos:
        for n in scores_neg:
            if p > n:
                wins2 += 2
            elif p == n:
                wins2 += 1
    den = 2 * len(scores_pos) * len(scores_neg)
    return (2 * wins2 * MICRO + den) // (2 * den)


def test_matches_pair_counting_on_random_data(spark):
    rng = random.Random(7)
    rows, want = [], {}
    for g in ("a", "b", "c"):
        pos = [rng.randrange(12) for _ in range(rng.randrange(5, 25))]
        neg = [rng.randrange(12) for _ in range(rng.randrange(5, 25))]
        rows += [(g, s, 1) for s in pos] + [(g, s, 0) for s in neg]
        want[g] = _auc_pairs(pos, neg)
    got = {
        r["g"]: r["auc_micro"]
        for r in exact_grouped_auc(
            _df(spark, rows), group="g", score="score", label="label"
        ).collect()
    }
    assert got == want


def test_perfect_inverted_and_constant_scorers(spark):
    rows = (
        # g=perfect: every positive above every negative → AUC 1
        [("p", 10 + i, 1) for i in range(3)]
        + [("p", i, 0) for i in range(3)]
        # g=inverted: every positive below every negative → AUC 0
        + [("i", i, 1) for i in range(3)]
        + [("i", 10 + i, 0) for i in range(3)]
        # g=constant: all ties → AUC exactly 1/2
        + [("c", 5, 1) for _ in range(4)]
        + [("c", 5, 0) for _ in range(6)]
    )
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["auc_micro"])
        for r in exact_grouped_auc(
            _df(spark, rows), group="g", score="score", label="label"
        ).collect()
    }
    assert got == {
        "p": (3, 3, MICRO),
        "i": (3, 3, 0),
        "c": (4, 6, MICRO // 2),
    }


def test_single_class_groups_are_dropped(spark):
    rows = [("only_pos", 1, 1), ("only_pos", 2, 1), ("only_neg", 3, 0)]
    assert (
        exact_grouped_auc(
            _df(spark, rows), group="g", score="score", label="label"
        ).count()
        == 0
    )


def test_face_outputs_valid_probabilities(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    rows = QUERIES["source_quality_auc"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_pos"] > 0 and r["n_neg"] > 0
        assert 0 <= r["auc_micro"] <= MICRO
