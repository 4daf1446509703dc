"""Contrastive pair mining: exact-face invariants, and the 100 TB
recipe (IVF-PQ candidates → label → rank) recall-pinned against the
registered brute-force baseline — the module-note claim in
queries/similarity.py made concrete."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.similarity import (
    _N_ANCHORS,
    _N_NEG,
    _N_POS,
    embedding_hard_negatives,
    triplet_margin_stats,
)


@pytest.fixture(scope="module")
def mined(spark, sf_dir):
    return embedding_hard_negatives(spark, sf_dir).collect()


def test_kind_labels_match_label_table(spark, sf_dir, mined):
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    for r in mined:
        same = labels[r.anchor_id] == labels[r.neighbor_id]
        assert (r.kind == "pos") == same
        assert r.neighbor_id != r.anchor_id


def test_counts_and_rank_contiguity(mined):
    per = {}
    for r in mined:
        per.setdefault((r.anchor_id, r.kind), []).append(r)
    for (a, kind), rows in per.items():
        cap = _N_POS if kind == "pos" else _N_NEG
        assert len(rows) <= cap
        assert sorted(x.rank for x in rows) == list(range(1, len(rows) + 1))
        # ranked by similarity: rank order must be non-increasing sim
        by_rank = sorted(rows, key=lambda x: x.rank)
        sims = [x.cosine_sim for x in by_rank]
        assert sims == sorted(sims, reverse=True)


def test_margin_stats_consistent_with_pairs(spark, sf_dir, mined):
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _N_ANCHORS)
        .collect()
    }
    per = {}
    for r in mined:
        d = per.setdefault(r.anchor_id, {"pos": [], "neg": []})
        d[r.kind].append(r.cosine_sim)
    stats = {r.label: r for r in triplet_margin_stats(spark, sf_dir).collect()}
    n_by_label = {}
    for a, d in per.items():
        n_by_label[labels[a]] = n_by_label.get(labels[a], 0) + 1
    for lbl, n in n_by_label.items():
        assert stats[lbl].n_anchors == n
        assert 0 <= stats[lbl].n_margin_violations <= n


def test_ann_mining_recipe_recall(spark, sf_dir, mined, tmp_path):
    """The production recipe: IVF-PQ candidates (wide probe + exact
    re-rank) → label join → per-kind rank.  Must recover most of the
    brute-force mined pairs on the near-uniform synthetic corpus (the
    coarse quantizer's hardest regime)."""
    from bigdatamlteamrepo_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "mine_ivfpq")
    build_ivfpq_index(emb, idx, n_cells=8)
    anchors = emb.filter(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    cand = ivfpq_index_topk(
        spark, idx, anchors, k=60, n_probe=6, rerank=120, exclude_self=True
    )
    lab = emb.select("vec_id", "label")
    c = (
        cand.join(
            lab.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("a_label"),
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
        .withColumn(
            "kind",
            F.when(F.col("a_label") == F.col("n_label"), "pos").otherwise(
                "neg"
            ),
        )
    )
    w = Window.partitionBy("query_id", "kind").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    got = (
        c.withColumn("rk", F.row_number().over(w))
        .filter(
            ((F.col("kind") == "pos") & (F.col("rk") <= _N_POS))
            | ((F.col("kind") == "neg") & (F.col("rk") <= _N_NEG))
        )
        .select("query_id", "neighbor_id", "kind")
        .collect()
    )
    truth = {(r.anchor_id, r.neighbor_id, r.kind) for r in mined}
    found = {(r.query_id, r.neighbor_id, r.kind) for r in got}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.7, f"ANN mining recall {recall:.2f} < 0.7"
