"""Structural tests for the clustering + recommendation pipeline
(FIXTURES §3: cluster structure + membership properties, never
label-exact vs sklearn)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.ml.clustering import (
    fit_restaurant_clusters,
    recommend_restaurants,
    split_categories,
)
from bigdatamlteamrepo_spark.ml.restaurants import ARCHETYPES, generate_restaurants


@pytest.fixture(scope="module")
def model(spark):
    df = generate_restaurants(spark, n_rows=1500, seed=42)
    return fit_restaurant_clusters(df, k=7, seed=30, pca_cap=25)


def test_split_keeps_leading_spaces(spark):
    df = generate_restaurants(spark, n_rows=50, seed=42)
    toks = (
        split_categories(df)
        .select(F.explode("category_array").alias("t"))
        .distinct()
        .collect()
    )
    # faithful mode: tokens after the first carry a leading space
    assert any(r.t.startswith(" ") for r in toks)
    clean = (
        split_categories(df, trim=True)
        .select(F.explode("category_array").alias("t"))
        .distinct()
        .collect()
    )
    assert not any(r.t.startswith(" ") for r in clean)


def test_pipeline_structure(model):
    # PCA kept enough components for 95% variance, fewer than the cap
    assert 1 <= model.pca_k <= 25
    ev = model.pca_model.explainedVariance
    assert sum(ev[: model.pca_k]) >= 0.95 or model.pca_k == len(ev)
    # 7 non-empty clusters
    sizes = {r.cluster: r.n for r in model.clustered.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert len(sizes) == 7
    assert min(sizes.values()) > 0
    # nulls dropped
    assert model.clustered.filter(F.col("score").isNull()).count() == 0


def test_clusters_align_with_archetypes(model):
    """Planted structure is recoverable: most clusters should be
    dominated by one archetype bundle's lead category."""
    lead_cats = [cats[0] for cats, _, _ in ARCHETYPES]
    top1 = (
        model.top_categories(per_cluster=1)
        .select("cluster", "category")
        .collect()
    )
    dominant = {r.category.strip() for r in top1}
    # at least 5 of 7 clusters keyed to distinct archetype lead/bundle cats
    bundle_cats = {c for cats, _, _ in ARCHETYPES for c in cats} | set(lead_cats)
    assert len(dominant & bundle_cats) >= 5


def test_top_categories_window(model):
    top = model.top_categories(per_cluster=7)
    counts = {r.cluster: r.n for r in top.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 7 for n in counts.values())
    # ranks are 1..n within each cluster
    ranks = [r.rank for r in top.filter(F.col("cluster") == top.first().cluster).collect()]
    assert ranks == list(range(1, len(ranks) + 1))


def test_recommend_membership_properties(model):
    recs = recommend_restaurants(model, ["aFRiCan"], n=10).collect()
    assert len(recs) == 10
    # every returned restaurant's cluster rank sequence is non-decreasing
    ranks = [r.cluster_rank for r in recs]
    assert ranks == sorted(ranks)
    # each returned row contains ≥1 requested category
    ids = [r.restaurant_id for r in recs]
    members = (
        model.clustered.filter(F.col("restaurant_id").isin(ids))
        .select("restaurant_id", "category_array")
        .collect()
    )
    for m in members:
        assert any(t.strip().lower() == "african" for t in m.category_array)


def test_recommend_unknown_categories_ignored(model):
    # unknown-only input → empty result
    assert recommend_restaurants(model, ["martian"], n=5).count() == 0
    # unknown mixed with known → same as known alone
    a = [r.restaurant_id for r in recommend_restaurants(model, ["Sushi", "martian"], n=5).collect()]
    b = [r.restaurant_id for r in recommend_restaurants(model, ["sushi"], n=5).collect()]
    assert a == b
