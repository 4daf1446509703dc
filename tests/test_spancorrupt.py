"""Span corruption: the (input, target) pair must be LOSSLESS — splicing
each target span back over its sentinel reconstructs the original token
stream exactly — and the accounting query's lengths must match the
materialized pairs."""

from __future__ import annotations

import re

from bigdatamlteamrepo_spark.functions.text import tokenize
from bigdatamlteamrepo_spark.queries.spancorrupt import (
    BLOCK,
    SPAN,
    t5_span_corruption_pairs,
    t5_span_corruption_stats,
)

_SENT = re.compile(r"<extra_id_(\d+)>")


def _reconstruct(input_text: str, target_text: str) -> list[str]:
    spans: dict[str, list[str]] = {}
    cur = None
    for tok in target_text.split():
        m = _SENT.fullmatch(tok)
        if m:
            cur = tok
            spans[cur] = []
        elif cur is not None:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in input_text.split():
        out.extend(spans.get(tok, [tok]) if _SENT.fullmatch(tok) else [tok])
    return out


def test_pairs_are_lossless(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens

    toks = {
        r["doc_id"]: r["toks"]
        for r in _with_tokens(spark, sf_dir)
        .select("doc_id", tokenize("text").alias("toks"))
        .collect()
    }
    rows = t5_span_corruption_pairs(spark, sf_dir).collect()
    assert rows
    n_with_spans = 0
    for r in rows:
        assert _reconstruct(r["input_text"], r["target_text"]) == list(
            toks[r["doc_id"]]
        ), r["doc_id"]
        if r["target_text"]:
            n_with_spans += 1
    assert n_with_spans > 0  # the sample isn't degenerate


def test_stats_lengths_match_pairs(spark, sf_dir):
    stats = {
        r["doc_id"]: r for r in t5_span_corruption_stats(spark, sf_dir).collect()
    }
    for r in t5_span_corruption_pairs(spark, sf_dir).collect():
        s = stats[r["doc_id"]]
        in_toks = r["input_text"].split()
        tgt_toks = r["target_text"].split()
        assert len(in_toks) == s["input_len"]
        assert len(tgt_toks) + 1 == s["target_len"]  # +1 = EOS budget
        n_sent = sum(1 for t in in_toks if _SENT.fullmatch(t))
        assert n_sent == s["n_spans"]
        assert s["n_masked"] == s["n_spans"] * SPAN
        assert s["n_spans"] == s["n_tokens"] // BLOCK


def test_corruption_rate_is_fifteen_percent(spark, sf_dir):
    rows = t5_span_corruption_stats(spark, sf_dir).collect()
    n_tok = sum(r["n_tokens"] for r in rows)
    n_mask = sum(r["n_masked"] for r in rows)
    # exactly SPAN/BLOCK over full blocks; partial tail blocks dilute
    assert 0.10 < n_mask / n_tok <= SPAN / BLOCK
