"""Model-based quality classifier: the expression scoring path must
equal the MLlib transform, and the learned model must actually
generalize the Gopher pseudo-labels on a deterministic holdout."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.ml.quality import (
    evaluate_quality_model,
    gopher_pass_labels,
    holdout_split,
    score_documents_expr,
    score_documents_mllib,
    train_quality_classifier,
)

_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train, hold = holdout_split(docs)
    return train, hold, train_quality_classifier(train)


def test_expr_scoring_equals_mllib(spark, fitted):
    _, hold, model = fitted
    a = {r["doc_id"]: r["quality_prob"]
         for r in score_documents_mllib(model, hold).collect()}
    b = {r["doc_id"]: r["quality_prob"]
         for r in score_documents_expr(model, hold).collect()}
    assert set(a) == set(b) and len(a) > 0
    assert max(abs(a[k] - b[k]) for k in a) < 1e-9


def test_model_generalizes_pseudo_labels(spark, fitted):
    _, hold, model = fitted
    m = evaluate_quality_model(model, hold)
    # pseudo-labels are a deterministic rule set; a bag-of-ngrams LR
    # should recover them well out of sample (0.93 observed; 0.80 is
    # the conservative floor across SFs)
    assert m["auc"] > 0.80, m
    assert m["accuracy"] > 0.70, m
    probs = {r["doc_id"]: r["quality_prob"]
             for r in score_documents_expr(model, hold).collect()}
    labels = {r["doc_id"]: r["label"] for r in gopher_pass_labels(hold).collect()}
    p1 = [probs[k] for k in probs if labels[k] == 1.0]
    p0 = [probs[k] for k in probs if labels[k] == 0.0]
    assert p1 and p0, "holdout must exercise both classes"
    assert sum(p1) / len(p1) > sum(p0) / len(p0) + 0.2


def test_vocab_miss_scores_at_intercept(spark, fitted):
    _, _, model = fitted
    alien = spark.createDataFrame(
        [(999_999_001, "zzqx wwvv qqpp zzqx", "xx", "sX", 19)], _DOC_SCHEMA
    )
    expr = score_documents_expr(model, alien).collect()[0]["quality_prob"]
    mllib = score_documents_mllib(model, alien).collect()[0]["quality_prob"]
    want = 1.0 / (1.0 + math.exp(-model.intercept))
    assert abs(expr - want) < 1e-12
    assert abs(mllib - expr) < 1e-9


def test_split_is_deterministic_partition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t1, h1 = holdout_split(docs)
    t2, h2 = holdout_split(docs)
    ids = lambda df: {r["doc_id"] for r in df.select("doc_id").collect()}
    assert ids(t1) == ids(t2) and ids(h1) == ids(h2)
    assert ids(t1) | ids(h1) == ids(docs) and not (ids(t1) & ids(h1))


def test_expr_plan_has_no_python_udf(spark, fitted):
    train, _, model = fitted
    plan = score_documents_expr(model, train)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
