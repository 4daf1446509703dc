"""Curate → index → search composition: the IVF-PQ index built ONLY
over the corpus build's surviving documents (vec_id = doc_id in the
synthetic corpus), queried with the registered corpus_survivor_knn
query set, recall-pinned against that exact baseline.

This is the production shape at 100 TB: dedup/quality-gate first, then
build the ANN tier over the shipped vectors only — non-survivors never
enter the index (asserted structurally below, not just by recall).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.extensions import (
    _SURV_K,
    _SURV_NQ,
    corpus_survivor_knn,
)
from bigdatamlteamrepo_spark.queries.textmodel import corpus_survivor_ids


@pytest.fixture(scope="module")
def survivors(spark, sf_dir):
    return {r.doc_id for r in corpus_survivor_ids(spark, sf_dir).collect()}


def test_survivor_knn_stays_inside_the_curated_corpus(spark, sf_dir, survivors):
    out = corpus_survivor_knn(spark, sf_dir).collect()
    assert survivors, "fixture corpus must ship at least one document"
    qids = {r.query_id for r in out}
    assert qids == set(sorted(survivors)[:_SURV_NQ])
    assert {r.neighbor_id for r in out} <= survivors
    for r in out:
        assert r.neighbor_id != r.query_id


def test_ivfpq_index_over_survivors(spark, sf_dir, survivors, tmp_path):
    """Index the survivor embeddings; the persisted layout must contain
    EXACTLY the survivor vec_ids, and querying it must recover most of
    the exact survivor-knn neighbors (near-uniform synthetic corpus —
    the hard regime for a coarse quantizer, hence the wide probe)."""
    from bigdatamlteamrepo_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    surv_emb = emb.join(
        corpus_survivor_ids(spark, sf_dir).select(
            F.col("doc_id").alias("vec_id")
        ),
        "vec_id",
        "left_semi",
    )
    idx = str(tmp_path / "surv_ivfpq")
    build_ivfpq_index(surv_emb, idx, n_cells=8)

    indexed = {
        r.vec_id
        for r in spark.read.parquet(idx + "/vectors").select("vec_id").collect()
    }
    assert indexed == survivors

    qs = (
        surv_emb.orderBy("vec_id")
        .limit(_SURV_NQ)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    )
    got = ivfpq_index_topk(
        spark, idx, qs, k=_SURV_K, n_probe=6, rerank=100, exclude_self=True
    ).collect()
    exact = corpus_survivor_knn(spark, sf_dir).collect()

    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for r in got if r.neighbor_id in truth.get(r.query_id, set())
    )
    total = sum(len(v) for v in truth.values())
    assert total == _SURV_NQ * min(_SURV_K, len(survivors) - 1)
    recall = hits / total
    assert recall >= 0.8, f"survivor-index recall {recall:.2f} ({hits}/{total})"
