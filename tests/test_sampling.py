"""Property tests for sampling/balancing operators (FIXTURES.md §6:
seed-dependent ops are checked structurally, not value-hashed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators import sampling


def test_sample_exact_n(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    s = sampling.sample_exact_n(orders, 100, seed=42)
    assert s.count() == 100
    # output ⊆ input
    assert s.join(orders, "o_orderkey", "left_anti").count() == 0
    # deterministic under a fixed seed
    a = sorted(r.o_orderkey for r in s.select("o_orderkey").collect())
    b = sorted(
        r.o_orderkey
        for r in sampling.sample_exact_n(orders, 100, seed=42)
        .select("o_orderkey")
        .collect()
    )
    assert a == b


def test_random_split_partition_property(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    parts = sampling.random_split(orders, [0.8, 0.2], seed=42)
    n = orders.count()
    assert sum(p.count() for p in parts) == n
    # disjoint
    assert parts[0].join(parts[1], "o_orderkey", "left_semi").count() == 0


def test_train_val_test_split(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    tr, va, te = sampling.train_val_test_split(li, seed=7)
    total = li.count()
    counts = [tr.count(), va.count(), te.count()]
    assert sum(counts) == total
    # rough proportions (Bernoulli split: generous tolerance)
    assert abs(counts[0] / total - 0.765) < 0.05


def test_undersample_balances_classes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "label", (F.col("n_chars") > 250).cast("int")
    )
    balanced = sampling.undersample_to_balance(labeled, "label", seed=42)
    counts = {
        r.label: r.n for r in balanced.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r.label: r.n for r in labeled.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert len(counts) == 2
    # balanced exactly at the minority count
    assert counts[0] == counts[1] == min(orig.values())
    # output ⊆ input
    assert balanced.join(docs, "doc_id", "left_anti").count() == 0
    # schema preserved
    assert set(balanced.columns) == set(labeled.columns)


def test_class_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn("label", (F.col("n_chars") > 250).cast("int"))
    weighted = sampling.class_weights(labeled, "label")
    assert weighted.count() == labeled.count()
    rows = (
        weighted.groupBy("label", "classWeightCol")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_label = {r.label: (r.classWeightCol, r.n) for r in rows}
    maj = max(n for _, n in by_label.values())
    for label, (w, n) in by_label.items():
        assert abs(w - maj / n) < 1e-12
    # majority class has weight exactly 1.0
    maj_label = max(by_label, key=lambda k: by_label[k][1])
    assert by_label[maj_label][0] == 1.0


# ---------------------------------------------------------------------------
# Quantile-threshold selection (select_top_fraction / score_threshold)
# ---------------------------------------------------------------------------


def test_select_top_fraction_exact_unique_scores(spark):
    df = spark.range(100).withColumn("score", F.col("id").cast("double"))
    top = sampling.select_top_fraction(df, "score", 0.1)
    got = {r["id"] for r in top.collect()}
    # percentile(score, 0.9) over 0..99 interpolates to 89.1 → ids ≥ 90
    assert got == set(range(90, 100))


def test_select_top_fraction_keeps_threshold_ties(spark):
    # 90 rows at score 1.0, 10 rows at 2.0 — asking for the top 5%
    # cuts inside the 2.0 plateau; every tied row must survive
    df = spark.range(100).withColumn(
        "score", F.when(F.col("id") >= 90, 2.0).otherwise(1.0)
    )
    top = sampling.select_top_fraction(df, "score", 0.05)
    assert top.count() == 10
    assert top.agg(F.min("score")).collect()[0][0] == 2.0


def test_select_top_fraction_whole_frame(spark):
    df = spark.range(50).withColumn("score", F.col("id").cast("double"))
    assert sampling.select_top_fraction(df, "score", 1.0).count() == 50


def test_select_top_fraction_approx_close_to_exact(spark):
    df = spark.range(10000).withColumn(
        "score", (F.col("id") * F.col("id")).cast("double")
    )
    exact = sampling.score_threshold(df, "score", 0.25)
    approx = sampling.score_threshold(df, "score", 0.25, approx=True)
    # GK with accuracy=10000 on 10k rows: rank error ≤ ~1 row
    n_exact = df.filter(F.col("score") >= exact).count()
    n_approx = df.filter(F.col("score") >= approx).count()
    assert abs(n_exact - n_approx) <= 10


def test_score_threshold_invalid_inputs(spark):
    df = spark.range(10).withColumn("score", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        sampling.score_threshold(df, "score", 0.0)
    with pytest.raises(ValueError):
        sampling.score_threshold(df, "score", 1.5)
    with pytest.raises(ValueError):
        sampling.score_threshold(df.filter("id < 0"), "score", 0.5)
