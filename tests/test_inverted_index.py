"""Inverted index: build once, answer from the index — results must be
BIT-identical to the one-pass chunk scorer, and the query plan must
prune to the terms' pbucket partitions (non-vacuous, the IVF-PQ
discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators.retrieval import (
    bm25_from_index,
    build_inverted_index,
)
from bigdatamlteamrepo_spark.queries.passages import (
    _CBM_TERMS,
    _CBM_TOPK,
    chunk_bm25_topk,
)


def test_index_reproduces_one_pass_scorer(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "inv")
    build_inverted_index(load_table(spark, sf_dir, "documents"), idx)
    got = bm25_from_index(spark, idx, _CBM_TERMS, k=_CBM_TOPK)
    expect = chunk_bm25_topk(spark, sf_dir)
    g = [(r.doc_id, r.chunk_id, r.bm25) for r in got.collect()]
    e = [(r.doc_id, r.chunk_id, r.bm25) for r in expect.collect()]
    assert g == e  # exact floats, exact order


def test_query_prunes_to_term_partitions(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "inv2")
    build_inverted_index(load_table(spark, sf_dir, "documents"), idx)
    out = bm25_from_index(spark, idx, ("spark",), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pruned = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln
        and "pbucket" in ln.split("PartitionFilters", 1)[1]
    ]
    assert len(pruned) >= 2, plan[:800]
    # and the term equality predicate reaches the postings scan
    assert "PushedFilters" in plan and "term" in plan


def test_single_term_scores_positive_and_ranked(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "inv3")
    build_inverted_index(load_table(spark, sf_dir, "documents"), idx)
    rows = bm25_from_index(spark, idx, ("spark",), k=10).collect()
    assert rows
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_incremental_append_equals_full_rebuild(spark, sf_dir, tmp_path):
    """build(A) + append(B) must answer every query exactly like
    build(A ∪ B) — postings are disjoint rows, df/stats fold at read."""
    from bigdatamlteamrepo_spark.operators.retrieval import (
        append_to_inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    inc = str(tmp_path / "inc")
    build_inverted_index(a, inc)
    append_to_inverted_index(b, inc)

    full = str(tmp_path / "full")
    build_inverted_index(docs, full)

    for terms in [_CBM_TERMS, ("spark",), ("join", "window")]:
        gi = [
            (r.doc_id, r.chunk_id, r.bm25)
            for r in bm25_from_index(spark, inc, terms, k=15).collect()
        ]
        gf = [
            (r.doc_id, r.chunk_id, r.bm25)
            for r in bm25_from_index(spark, full, terms, k=15).collect()
        ]
        assert gi == gf, terms


def test_driver_side_pbucket_matches_spark_hash32(spark):
    """bm25_from_index derives pbuckets driver-side with hashlib (no
    per-term Spark job); the derivation must equal the build path's
    Spark-side hash32(term) % N_PBUCKETS for any utf-8 term."""
    import hashlib

    from pyspark.sql import functions as F

    from bigdatamlteamrepo_spark.operators.retrieval import N_PBUCKETS
    from bigdatamlteamrepo_spark.queries.shards import hash32

    terms = ["the", "Zürich", "naïve", "東京", "a b", "", "ORDER", "order"]
    spark_side = {
        r.term: r.p
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", (hash32(F.col("term")) % N_PBUCKETS).alias("p"))
        .collect()
    }
    for t in terms:
        drv = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % N_PBUCKETS
        assert drv == spark_side[t], t
