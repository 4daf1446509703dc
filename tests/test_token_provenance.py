"""ensure_tokens / doc_shingle_sets must reuse a ``toks`` column ONLY
when it carries the whitespace-tokenize provenance marker (ADVICE_r7):
a caller frame with a differently-derived ``toks`` must never silently
change query semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.text import (
    WS_TOKENS_META,
    ensure_tokens,
    has_ws_tokens,
    tokenize_words,
    ws_tokens,
)
from bigdatamlteamrepo_spark.queries.text_dedup import doc_shingle_sets


def _docs(spark):
    return spark.createDataFrame(
        [(1, "Alpha-Beta gamma delta"), (2, "one two three four five")],
        "doc_id int, text string",
    )


def test_tagged_toks_is_reused(spark):
    tagged = _docs(spark).select("doc_id", "text", ws_tokens("text"))
    assert has_ws_tokens(tagged)
    out = ensure_tokens(tagged, "doc_id")
    assert out.columns == ["doc_id", "toks"]
    rows = {r.doc_id: r.toks for r in out.collect()}
    assert rows[1] == ["alpha-beta", "gamma", "delta"]


def test_foreign_toks_not_reused(spark):
    # a word-regex tokenization also named 'toks', WITHOUT the marker:
    # ensure_tokens must recompute the whitespace tokenization from text
    foreign = _docs(spark).select(
        "doc_id", "text", tokenize_words("text").alias("toks")
    )
    assert not has_ws_tokens(foreign)
    out = {r.doc_id: r.toks for r in ensure_tokens(foreign, "doc_id").collect()}
    # whitespace tokenize keeps the hyphenated token; the foreign word
    # tokenization would have split it into ['alpha', 'beta', ...]
    assert out[1] == ["alpha-beta", "gamma", "delta"]


def test_doc_shingle_sets_ignores_foreign_toks(spark):
    docs = _docs(spark)
    foreign = docs.select("doc_id", "text", tokenize_words("text").alias("toks"))
    plain = doc_shingle_sets(docs.select("doc_id", "text"))
    via_foreign = doc_shingle_sets(foreign)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, via_foreign.collect())
    )


def test_marker_survives_projection_and_filter(spark):
    tagged = _docs(spark).select("doc_id", "text", ws_tokens("text"))
    downstream = tagged.filter(F.col("doc_id") > 0).select("doc_id", "toks")
    assert has_ws_tokens(downstream)
    assert downstream.schema["toks"].metadata == WS_TOKENS_META
