"""Streaming surface: the same window builders run in batch mode (checked
against batch groundtruth) and in streaming mode through a file-source
readStream with watermarks (complete/append semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.streaming import windows as W


def test_tumbling_batch_equals_stream(spark, sf_dir):
    batch = W.tumbling_counts(load_table(spark, sf_dir, "events"))
    stream_src = W.read_events_stream(spark, sf_dir)
    assert stream_src.isStreaming
    streamed = W.run_stream_to_memory(
        W.tumbling_counts(stream_src), "tumbling_out", mode="append"
    )
    b = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    s = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in streamed.collect()
    }
    # append mode with watermark: only windows older than the watermark
    # horizon are emitted; every emitted window must match batch exactly
    assert s, "stream emitted nothing"
    for key, val in s.items():
        assert b[key] == val
    # bounded input: at most the trailing windows may be withheld
    assert len(s) >= len(b) - len({r.event_type for r in batch.collect()})


def test_sliding_batch_multiplicity(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    slid = W.sliding_counts(ev, width="1 hour", slide="15 minutes")
    n_events = ev.count()
    total = slid.agg(F.sum("n_events")).first()[0]
    # each event appears in exactly width/slide = 4 sliding windows
    assert total == 4 * n_events


def test_session_batch_agrees_with_lag_sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sess = W.session_counts(ev, gap="30 minutes")
    per_user = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
    from bigdatamlteamrepo_spark.queries.events import events_user_sessions

    lag_based = events_user_sessions(spark, sf_dir)
    a = {r.user_id: (r.n_sessions, r.n_events) for r in per_user.collect()}
    b = {r.user_id: (r.n_sessions, r.n_events) for r in lag_based.collect()}
    assert a == b


def test_session_stream_runs(spark, sf_dir):
    streamed = W.run_stream_to_memory(
        W.session_counts(W.read_events_stream(spark, sf_dir)),
        "session_out",
        mode="append",
    )
    rows = streamed.collect()
    assert rows
    assert all(r.session_end > r.session_start for r in rows)


def test_streaming_gopher_audit_equals_batch(spark, sf_dir):
    """The selection tier's stream≡batch twin: the SAME rule
    expressions (queries.pipeline.gopher_rule_flags) drive the batch
    doc_gopher_rules query and the streaming per-source audit — results
    must be row-identical."""
    from bigdatamlteamrepo_spark.queries.pipeline import doc_gopher_rules
    from bigdatamlteamrepo_spark.streaming.audit import (
        gopher_audit_stream,
        read_documents_stream,
    )
    from bigdatamlteamrepo_spark.streaming.windows import run_stream_to_memory

    agg = gopher_audit_stream(read_documents_stream(spark, sf_dir))
    got = run_stream_to_memory(agg, "gopher_audit", mode="complete")
    batch = doc_gopher_rules(spark, sf_dir)
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, batch.collect()), key=repr
    )
