"""Surgical decontamination: span-level eval-overlap removal that
ships the doc instead of dropping it — fixpoint semantics, zero
residual overlap, and byte-identity for clean docs."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.text import shingles, tokenize
from bigdatamlteamrepo_spark.queries.pipeline import (
    _DECON_W,
    _EVAL_N,
    eval_contamination_spans,
    surgical_decontaminate,
)


def _grams(text: str, w: int = _DECON_W) -> set[str]:
    toks = re.split(r"\s+", text.lower())
    return {
        " ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)
    }


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ev = (
        docs.filter(F.col("doc_id") < _EVAL_N)
        .withColumn("toks", tokenize("text"))
        .filter(F.size("toks") >= _DECON_W)
        .select(F.explode(shingles(F.col("toks"), _DECON_W)).alias("gram"))
    )
    return docs.filter(F.col("doc_id") >= _EVAL_N), ev


def test_fixpoint_reaches_zero_overlap(spark, corpus):
    docs, ev = corpus
    ev_grams = {r.gram for r in ev.distinct().collect()}
    before = eval_contamination_spans(docs, ev).count()
    assert before > 0, "fixture corpus must have eval overlap"

    out = surgical_decontaminate(docs, ev).collect()
    assert len(out) == docs.count(), "surgical mode ships every doc"
    for r in out:
        assert not (_grams(r.text) & ev_grams), r.doc_id


def test_clean_docs_pass_through_byte_identical(spark, corpus):
    docs, ev = corpus
    contaminated = {
        r.doc_id for r in eval_contamination_spans(docs, ev).collect()
    }
    original = {r.doc_id: r.text for r in docs.collect()}
    for r in surgical_decontaminate(docs, ev).collect():
        if r.doc_id not in contaminated:
            assert r.text == original[r.doc_id]
            assert r.n_tokens_cut == 0
        else:
            assert r.n_tokens_cut >= _DECON_W


def test_splice_gram_fixpoint_iterates(spark):
    """A doc where cutting the first contaminated span splices a NEW
    eval gram together — one pass leaves residual overlap, the
    fixpoint removes it."""
    w = _DECON_W
    ev_a = " ".join(f"eva{i}" for i in range(w))
    # prefix = first half of a second eval gram, suffix = second half;
    # they flank the ev_a span, so the cut splices them into ev_b
    ev_b_toks = [f"evb{i}" for i in range(w)]
    pre, post = ev_b_toks[: w // 2], ev_b_toks[w // 2 :]
    filler = ["pad%d" % i for i in range(w)]
    text = " ".join(filler + pre + ev_a.split() + post + filler)
    docs = spark.createDataFrame(
        [(100, text, "en", "s", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    ev = spark.createDataFrame(
        [(ev_a,), (" ".join(ev_b_toks),)], "gram string"
    )
    one_pass_spans = eval_contamination_spans(docs, ev)
    assert one_pass_spans.count() == 1, "only ev_a matches initially"

    out = surgical_decontaminate(docs, ev).collect()
    assert len(out) == 1
    got = _grams(out[0].text)
    assert ev_a not in got and " ".join(ev_b_toks) not in got
    # the pads survive — surgical, not wholesale
    assert "pad0" in out[0].text and "pad%d" % (w - 1) in out[0].text
