"""ML-metric tier tests (FIXTURES §6): range assertions on the
separable synthetic recipe fixture, never bit-exact metric matching.

Model sizes are scaled down from the reference's (numFeatures 5000 →
512) to keep test runtime sane; the pipelines are identical in shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.ml import allergen
from bigdatamlteamrepo_spark.ml.recipes import ALLERGEN_CATEGORIES, generate_recipes


@pytest.fixture(scope="module")
def recipes(spark):
    return generate_recipes(spark, n_rows=2000, seed=42).cache()


def test_fixture_structure(recipes):
    labeled = allergen.with_binary_label(allergen.with_ingredient_array(recipes))
    dist = {r.Has_Allergen: r.n for r in labeled.groupBy("Has_Allergen").agg(F.count("*").alias("n")).collect()}
    assert set(dist) == {0, 1}
    # ≈30% allergen rows (hash-Bernoulli, generous tolerance)
    frac = dist[1] / (dist[0] + dist[1])
    assert 0.2 < frac < 0.4
    # mixed case present → lowercasing path exercised
    raw = recipes.select(F.explode("ingredients").alias("i"))
    assert raw.filter(F.col("i") != F.lower("i")).count() > 0


def test_binary_rf_undersampled(recipes):
    res = allergen.fit_binary(
        recipes, kind="rf", num_features=512, balance="undersample", seed=42
    )
    assert res.metrics["auc"] > 0.9
    assert res.metrics["accuracy"] > 0.85


def test_binary_lr_weighted(recipes):
    res = allergen.fit_binary(
        recipes, kind="lr", num_features=512, balance="weight", seed=42, max_iter=50
    )
    assert res.metrics["auc"] > 0.95
    assert res.metrics["accuracy"] > 0.9


def test_binary_mlp(recipes):
    res = allergen.fit_binary(
        recipes, kind="mlp", num_features=512, seed=100, max_iter=60
    )
    assert res.metrics["accuracy"] > 0.9
    assert res.metrics["f1"] > 0.9


def test_multiclass_six(recipes):
    res = allergen.fit_multiclass_six(
        recipes, num_features=512, max_iter=60, seed=42
    )
    assert res.metrics["accuracy"] > 0.85
    assert "predictedCategory" in res.predictions.columns


def test_multiclass_bigram_runs(recipes):
    # the bigram variant's quality is data-dependent (reference: 0.745);
    # assert it runs and beats chance on 5 classes
    res = allergen.fit_multiclass_bigram(
        recipes, num_features=512, layers_hidden=(32, 16), max_iter=40, seed=42
    )
    assert res.metrics["accuracy"] > 0.4


def test_confusion_matrix_and_report(recipes):
    res = allergen.fit_binary(
        recipes, kind="lr", num_features=256, balance="weight", seed=42, max_iter=30
    )
    cm = allergen.confusion_matrix(res.predictions).collect()
    assert [r.label for r in cm] == [0.0, 1.0]
    n_cm = sum(r["0.0"] + r["1.0"] for r in cm)
    assert n_cm == res.predictions.count()  # crosstab row sums = class counts
    rep = allergen.classification_report(res.predictions).collect()
    assert {r.label for r in rep} == {0.0, 1.0}
    for r in rep:
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0
        assert r.support > 0


def test_per_allergen_cv_small(recipes):
    # scaled-down grid: 2 param maps × 2 folds on one label
    results = allergen.per_allergen_cv(
        recipes,
        allergens=["dairy"],
        num_features=(256,),
        min_doc_freq=(0, 2),
        max_iter=(30,),
        num_folds=2,
        parallelism=2,
        seed=42,
    )
    assert results["dairy"]["auc"] > 0.9
    assert results["dairy"]["accuracy"] > 0.9


def test_multihot_labels(recipes):
    df = allergen.with_multihot_labels(allergen.with_ingredient_array(recipes))
    cols = [f"is_{c}" for c in ALLERGEN_CATEGORIES]
    assert set(cols) <= set(df.columns)
    totals = df.agg(*[F.sum(c).alias(c) for c in cols]).collect()[0]
    assert all(totals[c] > 0 for c in cols)


def test_murmur3_replica_matches_hashing_tf(spark):
    """The pure-Python murmur3 used for collider mining must agree with
    MLlib's HashingTF.indexOf on every phrase class we mine with."""
    from pyspark.ml.feature import HashingTF

    from bigdatamlteamrepo_spark.ml.recipes import (
        hashing_tf_bucket,
        mine_substr_colliders,
        substr_variants,
    )

    tf = HashingTF(numFeatures=5000)
    probes = (
        ["milk", "eggs", "cheese", "butter", "wheat", "soy"]
        + substr_variants(30)
        + mine_substr_colliders(60, n_buckets=8)
    )
    for term in probes:
        assert hashing_tf_bucket(term) == tf.indexOf(term), term


def test_substr_fixture_structure(spark):
    """Substring fixture: class balance, label agreement between the
    substring labeler and generation intent, collider docs negative."""
    from bigdatamlteamrepo_spark.functions.arrays import has_any_keyword_substr
    from bigdatamlteamrepo_spark.ml.recipes import (
        ALLERGENS,
        generate_recipes_matched_substr,
    )

    df = generate_recipes_matched_substr(spark, n_rows=3000)
    labeled = allergen.with_ingredient_array(df).withColumn(
        "y", has_any_keyword_substr(F.col("ingredient_array"), ALLERGENS)
    )
    frac = labeled.agg(F.avg("y")).first()[0]
    assert 0.25 <= frac <= 0.34, frac
    # exact-phrase labeling must see (almost) nothing: evidence is
    # embedded in composite phrases, not exact keyword phrases
    from bigdatamlteamrepo_spark.functions.arrays import has_any_keyword

    exact = labeled.withColumn(
        "y2", has_any_keyword(F.col("ingredient_array"), ALLERGENS)
    )
    assert exact.agg(F.avg("y2")).first()[0] < 0.01


def test_matched_extra_fillers_are_clean():
    """The enlarged matched-fixture vocabulary must not smuggle label
    noise: no extra filler contains an allergen term as a substring
    (would flip the substr labeler) and none hash-collides with an
    allergen HashingTF(5000) bucket (would be an undocumented
    collider — 'polenta' was rejected for landing in the 'peanuts'
    bucket)."""
    from bigdatamlteamrepo_spark.ml.recipes import (
        _ALL_ALLERGEN_TERMS,
        _MATCHED_EXTRA_FILLERS,
        hashing_tf_bucket,
    )

    allergen_buckets = {hashing_tf_bucket(a) for a in _ALL_ALLERGEN_TERMS}
    for f in _MATCHED_EXTRA_FILLERS:
        assert not any(a in f or f in a for a in _ALL_ALLERGEN_TERMS), f
        assert hashing_tf_bucket(f.lower()) not in allergen_buckets, f
