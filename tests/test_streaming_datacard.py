"""Streaming data card: the running per-source monitor must equal the
SAME builder run in batch (sums exact, HLL registers associative), and
its exact-sum metrics must agree with the registered corpus_datacard
where the two domains coincide."""

from __future__ import annotations

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.streaming.audit import (
    datacard_running,
    read_documents_stream,
)
from bigdatamlteamrepo_spark.streaming.windows import run_stream_to_memory


def test_stream_card_equals_batch_builder(spark, sf_dir):
    agg = datacard_running(read_documents_stream(spark, sf_dir))
    got = run_stream_to_memory(agg, "datacard_stream", mode="complete")
    batch = datacard_running(load_table(spark, sf_dir, "documents"))
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, batch.collect()), key=repr
    )


def test_stream_card_sums_match_registered_card(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.analytic import corpus_datacard

    stream_like = datacard_running(
        load_table(spark, sf_dir, "documents")
    ).collect()
    card = corpus_datacard(spark, sf_dir).collect()
    reg = {}
    for r in card:
        reg.setdefault(r.source, {})[r.metric] = r.value
    for r in stream_like:
        # exact-sum metrics agree when no doc is empty-token (the
        # builder's Gopher domain); the synthetic corpus has none
        assert reg[r.source]["n_docs"] == float(r.n_docs)
        assert reg[r.source]["total_chars"] == float(r.total_chars)
        assert reg[r.source]["total_tokens"] == float(r.total_tokens)
        assert abs(reg[r.source]["gopher_pass_rate"] - r.gopher_pass_rate) < 1e-12
        assert (
            abs(
                reg[r.source]["mean_type_token_ratio"]
                - r.mean_type_token_ratio
            )
            < 1e-9
        )
        # the HLL estimate must sit within its p=6 error envelope
        # (~13% rse; allow 3 sigma) of the true distinct count
        true = reg[r.source]["n_docs"] * (
            1.0 - reg[r.source]["exact_dup_frac"]
        )
        assert abs(r.approx_distinct_texts - true) <= max(3, 0.4 * true)
