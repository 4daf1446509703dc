"""Streaming quality scoring: per-trigger scores against the frozen
weights table must equal the batch expression scorer (and hence the
MLlib transform it is pinned to) doc-for-doc, replays must land
exactly once, and the threshold mode must gate exactly like the
pipeline's quality stage."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.ml.quality import (
    load_quality_weights,
    save_quality_weights,
    score_documents_expr,
    score_with_weights,
    train_quality_classifier,
)
from bigdatamlteamrepo_spark.streaming.quality import (
    read_stream_scores,
    score_quality_stream,
)

_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


@pytest.fixture(scope="module")
def model_and_weights(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents")
    model = train_quality_classifier(docs)
    wdir = str(tmp_path_factory.mktemp("qw") / "weights")
    save_quality_weights(model, wdir)
    return docs, model, wdir


def _start_stream(spark, tmp_path, waves, wdir, threshold=None):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for w in waves:
        w.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = score_quality_stream(
        stream,
        wdir,
        str(tmp_path / "scores"),
        str(tmp_path / "ckpt"),
        threshold=threshold,
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    return n_batches


def test_roundtripped_weights_reproduce_model_scores(
    spark, model_and_weights
):
    docs, model, wdir = model_and_weights
    weights, intercept = load_quality_weights(spark, wdir)
    a = {r["doc_id"]: r["quality_prob"]
         for r in score_documents_expr(model, docs).collect()}
    b = {r["doc_id"]: r["quality_prob"]
         for r in score_with_weights(docs, weights, intercept).collect()}
    assert set(a) == set(b)
    # float sums may reassociate across partitionings: ULP tolerance
    assert max(abs(a[k] - b[k]) for k in a) < 1e-12


def test_stream_scores_equal_batch(spark, tmp_path, model_and_weights):
    docs, model, wdir = model_and_weights
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    waves = [docs.filter(F.col("doc_id") < mid),
             docs.filter(F.col("doc_id") >= mid)]
    n_batches = _start_stream(spark, tmp_path, waves, wdir)
    assert n_batches >= 2, "waves must arrive in separate micro-batches"

    got = {r["doc_id"]: r["quality_prob"]
           for r in read_stream_scores(spark, str(tmp_path / "scores")).collect()}
    want = {r["doc_id"]: r["quality_prob"]
            for r in score_documents_expr(model, docs).collect()}
    assert set(got) == set(want)
    assert max(abs(got[k] - want[k]) for k in got) < 1e-12


def test_stream_threshold_gates_like_batch(spark, tmp_path, model_and_weights):
    docs, model, wdir = model_and_weights
    # a mid-distribution cut so both sides are non-empty
    probs = score_documents_expr(model, docs)
    thr = probs.agg(F.expr("percentile(quality_prob, 0.5)")).collect()[0][0]
    _start_stream(spark, tmp_path, [docs], wdir, threshold=thr)
    got = {r["doc_id"]
           for r in read_stream_scores(spark, str(tmp_path / "scores")).collect()}
    want = {r["doc_id"]
            for r in probs.filter(F.col("quality_prob") >= thr).collect()}
    # docs within a ULP of the cut may flip between plans; everything
    # else must gate identically
    near = {r["doc_id"] for r in
            probs.filter(F.abs(F.col("quality_prob") - thr) < 1e-9).collect()}
    assert (got ^ want) <= near
    assert 0 < len(got) < docs.count()


def test_replay_lands_exactly_once(spark, tmp_path, model_and_weights):
    docs, model, wdir = model_and_weights
    wave = docs.limit(40)
    _start_stream(spark, tmp_path, [wave], wdir)
    scores_dir = str(tmp_path / "scores")
    first = sorted(
        (r["doc_id"], r["quality_prob"])
        for r in read_stream_scores(spark, scores_dir).collect()
    )
    # simulate an at-least-once redelivery: wipe the checkpoint (same
    # location string, so the namespace tag is unchanged) and replay
    # the same source files into the same scores_dir
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    src2 = str(tmp_path / "src")
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src2)
    )
    q = score_quality_stream(
        stream, wdir, scores_dir, str(tmp_path / "ckpt"), threshold=None
    )
    q.processAllAvailable()
    q.stop()
    again = sorted(
        (r["doc_id"], r["quality_prob"])
        for r in read_stream_scores(spark, scores_dir).collect()
    )
    assert again == first
