"""Spherical KMeans: unit-norm invariant + recovery of planted
directional clusters; gated full-grid CV integration test."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.ml.embedding_clustering import (
    normalize_embeddings,
    spherical_kmeans,
)


def _directional(spark, n=240, k=4, dim=16, seed=3):
    """Vectors along k directions with very different magnitudes —
    euclidean KMeans would cluster by magnitude, spherical by angle."""
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(k, dim))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % k
        scale = 10.0 ** (i % 3)  # magnitudes 1/10/100 inside each direction
        v = dirs[c] * scale + rng.normal(scale=0.02, size=dim)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_normalize_unit_norm(spark):
    df = _directional(spark, n=60)
    out = normalize_embeddings(df)
    norms = out.select(
        F.aggregate(
            F.transform("unit_vec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        ).alias("sq")
    ).collect()
    for r in norms:
        assert math.isclose(r.sq, 1.0, rel_tol=1e-6)


def test_spherical_recovers_directions(spark):
    df = _directional(spark)
    out = spherical_kmeans(df, k=4, seed=42)
    # every true direction maps to exactly one cluster (purity 1.0 on
    # well-separated directions, magnitude variation notwithstanding)
    rows = out.select("label", "cluster").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, set()).add(r.cluster)
    assert all(len(cs) == 1 for cs in by_label.values()), by_label
    assert len({next(iter(cs)) for cs in by_label.values()}) == 4


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SLOW") != "1",
    reason="full 12-map×3-fold CV grid (~minutes); set SPARK_GRAFT_RUN_SLOW=1",
)
def test_full_grid_cv_reference_shape(spark):
    """The reference's exact c7 grid on one label: 12 hand-built param
    maps (numF∈{2000,5000} × minDF∈{0,2} × maxIter∈{50,100}, layers
    coupled) × 3 folds."""
    from bigdatamlteamrepo_spark.ml import per_allergen_cv
    from bigdatamlteamrepo_spark.ml.recipes import generate_recipes

    recipes = generate_recipes(spark, n_rows=3000, seed=42)
    results = per_allergen_cv(
        recipes,
        allergens=["dairy"],
        num_features=(2000, 5000),
        min_doc_freq=(0, 2),
        max_iter=(50, 100),
        num_folds=3,
        parallelism=8,
        seed=42,
    )
    assert results["dairy"]["auc"] > 0.97
    assert results["dairy"]["accuracy"] > 0.95
