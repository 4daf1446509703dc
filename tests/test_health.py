"""Health/planning tier: water-filling allocator, unigram drift,
embedding diagnostics — each pinned against an independent Python
implementation (not just the DuckDB oracle, which shares the SQL
formulation)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bigdatamlteamrepo_spark.queries.health import (
    BUDGET_MULT,
    MAX_EPOCHS,
    _Q,
    embedding_dim_stats,
    embedding_health_summary,
    epoch_mixture_plan,
    source_unigram_divergence,
)
from bigdatamlteamrepo_spark.queries.shards import MIX_ALPHA


def test_constants_keep_waterfilling_total():
    # the closed form requires B <= sum(cap); B = BUDGET_MULT*T and
    # sum(cap) = MAX_EPOCHS*T, so the cap must dominate the budget
    assert MAX_EPOCHS > BUDGET_MULT


def _iterative_waterfill(tokens: dict[str, int]):
    """Reference fixpoint: repeatedly cap over-allocated sources and
    redistribute the remaining budget over uncapped weight."""
    w = {s: t**MIX_ALPHA for s, t in tokens.items()}
    cap = {s: MAX_EPOCHS * t for s, t in tokens.items()}
    budget = BUDGET_MULT * sum(tokens.values())
    capped: set[str] = set()
    lam = 0.0
    for _ in range(len(tokens) + 2):
        free_w = sum(w[s] for s in tokens if s not in capped)
        used = sum(cap[s] for s in capped)
        lam = (budget - used) / free_w
        new = {s for s in tokens if lam * w[s] >= cap[s]}
        if new <= capped:
            break
        capped |= new
    return {s: min(lam * w[s], cap[s]) for s in tokens}


def test_epoch_mixture_plan_matches_iterative_fixpoint(spark, sf_dir):
    rows = {r["source"]: r.asDict() for r in epoch_mixture_plan(spark, sf_dir).collect()}
    tokens = {s: r["total_tokens"] for s, r in rows.items()}
    expected = _iterative_waterfill(tokens)
    budget = BUDGET_MULT * sum(tokens.values())
    # exact budget exhaustion (the allocator never strands budget)
    assert math.isclose(sum(r["alloc_tokens"] for r in rows.values()), budget,
                        rel_tol=1e-9)
    for s, r in rows.items():
        assert math.isclose(r["alloc_tokens"], expected[s], rel_tol=1e-9), s
        cap = MAX_EPOCHS * tokens[s]
        assert r["alloc_tokens"] <= cap * (1 + 1e-12)
        assert (r["capped"] == 1) == math.isclose(r["alloc_tokens"], cap, rel_tol=1e-9)
        assert math.isclose(r["epochs"], r["alloc_tokens"] / tokens[s], rel_tol=1e-12)
        # epochs never exceed the cap, and sampling keeps every source
        assert 0 < r["epochs"] <= MAX_EPOCHS * (1 + 1e-12)


def test_epoch_mixture_plan_uncapped_allocs_track_weights(spark, sf_dir):
    rows = epoch_mixture_plan(spark, sf_dir).collect()
    free = [r for r in rows if r["capped"] == 0]
    if len(free) >= 2:
        # alloc/weight is the shared water level for every uncapped source
        levels = [r["alloc_tokens"] / r["total_tokens"] ** MIX_ALPHA for r in free]
        assert max(levels) - min(levels) < 1e-6 * max(levels)


def _unigram_counts(spark, sf_dir):
    from bigdatamlteamrepo_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_src: dict[str, dict[str, int]] = {}
    for r in docs:
        d = per_src.setdefault(r["source"], {})
        for t in r["text"].lower().split():
            d[t] = d.get(t, 0) + 1
    return per_src


def test_source_unigram_divergence_vs_python(spark, sf_dir):
    per_src = _unigram_counts(spark, sf_dir)
    corpus: dict[str, int] = {}
    for d in per_src.values():
        for t, c in d.items():
            corpus[t] = corpus.get(t, 0) + c
    T = sum(corpus.values())
    got = {r["source"]: r.asDict() for r in
           source_unigram_divergence(spark, sf_dir).collect()}
    assert set(got) == set(per_src)
    for s, d in per_src.items():
        ts = sum(d.values())
        kl = sum((c / ts) * math.log((c / ts) / (corpus[t] / T)) for t, c in d.items())
        m = lambda p, q: 0.5 * (p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q)))
        js = sum(m(c / ts, corpus[t] / T) for t, c in d.items())
        covered = sum(corpus[t] for t in d)
        js += 0.5 * math.log(2) * (1 - covered / T)
        r = got[s]
        assert r["n_tokens"] == ts and r["covered_corpus_tokens"] == covered
        assert r["n_distinct_tokens"] == len(d)
        assert abs(r["kl_nats"] - kl) < 1e-6
        assert abs(r["js_nats"] - js) < 1e-6
        # divergence bounds: KL finite & >= 0, JS in [0, ln 2]
        assert 0 <= r["kl_nats"] and 0 <= r["js_nats"] <= math.log(2) + 1e-12


def _embedding_matrix(spark, sf_dir):
    from bigdatamlteamrepo_spark.catalog import load_table

    rows = load_table(spark, sf_dir, "embeddings").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    return X, labels


def test_embedding_dim_stats_vs_numpy(spark, sf_dir):
    X, _ = _embedding_matrix(spark, sf_dir)
    got = {r["dim"]: r.asDict() for r in embedding_dim_stats(spark, sf_dir).collect()}
    assert set(got) == set(range(X.shape[1]))
    tol = 2.0 / _Q  # fixed-point grid resolution
    for d in range(X.shape[1]):
        r = got[d]
        assert r["n_vecs"] == X.shape[0]
        assert abs(r["mean_val"] - X[:, d].mean()) < tol
        assert abs(r["std_val"] - X[:, d].std()) < tol
        assert r["min_val"] == pytest.approx(X[:, d].min(), abs=1e-12)
        assert r["max_val"] == pytest.approx(X[:, d].max(), abs=1e-12)


def test_embedding_health_summary_vs_numpy(spark, sf_dir):
    X, labels = _embedding_matrix(spark, sf_dir)
    centroid = X.mean(axis=0)
    cos = (X @ centroid) / (
        np.linalg.norm(X, axis=1) * np.linalg.norm(centroid)
    )
    norms = np.linalg.norm(X, axis=1)
    got = {r["label"]: r.asDict() for r in
           embedding_health_summary(spark, sf_dir).collect()}
    assert set(got) == set(np.unique(labels).tolist())
    # quantized centroid + 2^-30 cosine grid: generous but meaningful tol
    for lab in got:
        mask = labels == lab
        r = got[lab]
        assert r["n_vecs"] == int(mask.sum())
        assert abs(r["mean_cos_centroid"] - cos[mask].mean()) < 1e-3
        assert abs(r["mean_norm"] - norms[mask].mean()) < 1e-3
        assert r["min_cos_centroid"] <= r["mean_cos_centroid"] <= r["max_cos_centroid"]
        assert -1 - 1e-9 <= r["min_cos_centroid"] and r["max_cos_centroid"] <= 1 + 1e-9
