"""Property tests for the shard-planning tier (hypothesis over
generated corpora): packing conservation and sampling monotonicity —
invariants that must hold for ANY input, not just the driver fixture."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.shards import SEQ_LEN


def _pack(spark, rows):
    """Mirror doc_pack_plan's core on an in-memory frame."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = df.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        c.withColumn("shard_id", F.floor(F.col("off") / SEQ_LEN))
        .groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
        )
        .collect()
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=1, max_value=400),  # token counts << SEQ_LEN
        ),
        min_size=1,
        max_size=60,
    )
)
def test_packing_conserves_docs_and_tokens(shared_spark, docs):
    rows = [(src, i, n) for i, (src, n) in enumerate(docs)]
    out = _pack(shared_spark, rows)
    assert sum(r.n_docs for r in out) == len(rows)
    assert sum(r.shard_tokens for r in out) == sum(n for _, _, n in rows)
    # shard ids per source are contiguous from 0 (concat-then-chunk
    # leaves no gaps when every doc is shorter than the window)
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.shard_id)
    for ids in by_src.values():
        ids = sorted(ids)
        assert ids == list(range(len(ids)))
    # a window holds at most SEQ_LEN tokens' worth of document STARTS,
    # so shard_tokens < SEQ_LEN + max doc length
    max_doc = max(n for _, _, n in rows)
    for r in out:
        assert r.shard_tokens < SEQ_LEN + max_doc


def test_bucketed_pack_equals_per_source_pack(spark, sf_dir):
    """The skew-split (source, bucket) pack must reconstruct the exact
    global per-source offsets — byte-identical shard stats."""
    from bigdatamlteamrepo_spark.queries.shards import (
        doc_pack_plan,
        doc_pack_plan_bucketed,
    )

    a = {tuple(r) for r in doc_pack_plan(spark, sf_dir).collect()}
    b = {tuple(r) for r in doc_pack_plan_bucketed(spark, sf_dir).collect()}
    assert a == b and a


def test_bucketed_pack_window_partitions_by_bucket(spark, sf_dir):
    """Plan gate: the data-scale cumsum window must be keyed by
    (source, bucket) — parallelism ~docs/PACK_BUCKET, not #sources."""
    from bigdatamlteamrepo_spark.queries.shards import doc_pack_plan_bucketed

    plan = doc_pack_plan_bucketed(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    data_windows = [s for s in specs if "doc_id" in s]  # the cumsum windows
    assert data_windows, plan
    assert all("bucket" in s for s in data_windows), data_windows


def test_shard_assignment_n_shards_parameter(spark, sf_dir):
    """Every shard in [0, n) is populated and positions are dense."""
    from bigdatamlteamrepo_spark.queries.shards import shard_assignment

    out = shard_assignment(spark, sf_dir, 16)
    stats = (
        out.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"))
        .collect()
    )
    assert sorted(r.shard for r in stats) == list(range(16))
    assert all(r.mx == r.n for r in stats)


def test_mixture_rate_monotone_in_source_size(spark):
    """Bigger sources must never get a higher keep-rate (the whole
    point of temperature sampling)."""
    import math

    from bigdatamlteamrepo_spark.queries.shards import MIX_ALPHA

    sizes = [100, 1000, 10_000, 1_000_000]
    rates = [
        round(math.pow(t / sizes[0], MIX_ALPHA - 1.0), 6) for t in sizes
    ]
    assert rates[0] == 1.0
    assert all(a >= b for a, b in zip(rates, rates[1:]))


# reuse the session fixture under a second name so hypothesis's
# function-scoped-fixture health check stays quiet (the session is
# intentionally shared state)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def shared_spark(spark):
    return spark


def test_pack_offsets_consistent_with_plan(spark, sf_dir):
    """doc_pack_offsets is the row-level expansion of doc_pack_plan:
    grouping the per-doc rows by (source, shard) must reproduce the
    plan's rollup exactly, offsets stay inside [0, SEQ_LEN), and a doc
    spans a boundary iff offset + n_tokens overflows the sequence."""
    from bigdatamlteamrepo_spark.queries import QUERIES
    from bigdatamlteamrepo_spark.queries.shards import SEQ_LEN

    offs = QUERIES["doc_pack_offsets"](spark, sf_dir).collect()
    plan = {
        (r.source, r.shard_id): (r.n_docs, r.shard_tokens, r.first_doc, r.last_doc)
        for r in QUERIES["doc_pack_plan"](spark, sf_dir).collect()
    }
    agg: dict = {}
    for r in offs:
        assert 0 <= r.offset_in_shard < SEQ_LEN, r
        assert r.spans_boundary == int(r.offset_in_shard + r.n_tokens > SEQ_LEN), r
        k = (r.source, r.shard_id)
        n, tok, lo, hi = agg.get(k, (0, 0, r.doc_id, r.doc_id))
        agg[k] = (n + 1, tok + r.n_tokens, min(lo, r.doc_id), max(hi, r.doc_id))
    assert agg == plan
