"""Incremental corpus-build capstone: stage-set invariants the oracle
parity check cannot see (it verifies counts; these verify the ids
behind them obey the ingest semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.text_dedup import (
    _INCR_MOD,
    _JACCARD_MIN,
    neardup_incremental_lsh,
)
from bigdatamlteamrepo_spark.queries.textmodel import (
    corpus_incremental_build_summary,
    incremental_stage_frames,
)


@pytest.fixture(scope="module")
def stages(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    frames = incremental_stage_frames(docs)
    out = {
        k: {r.doc_id for r in v.collect()}
        for k, v in frames.items()
        if not k.startswith("_")
    }
    for v in frames.values():
        v.unpersist()
    return out


def test_stage_sets_nest_and_are_batch_only(stages):
    assert stages["s3"] <= stages["s2"] <= stages["s1"]
    assert stages["s3"], "fixture batch must append at least one doc"
    for s in stages.values():
        assert all(d % _INCR_MOD == 0 for d in s)


def test_exact_stage_excludes_index_collisions(spark, sf_dir, stages):
    docs = load_table(spark, sf_dir, "documents")
    keys = docs.select(
        "doc_id", "lang", F.md5("text").alias("h"), F.col("doc_id") % _INCR_MOD
    )
    index_keys = {
        (r.lang, r.h)
        for r in docs.filter(F.col("doc_id") % _INCR_MOD != 0)
        .select("lang", F.md5("text").alias("h"))
        .collect()
    }
    batch_keys = {
        r.doc_id: (r.lang, r.h)
        for r in docs.filter(F.col("doc_id") % _INCR_MOD == 0)
        .select("doc_id", "lang", F.md5("text").alias("h"))
        .collect()
    }
    seen = set()
    for d in sorted(stages["s2"]):
        k = batch_keys[d]
        assert k not in index_keys, f"doc {d} duplicates an index key"
        assert k not in seen, f"doc {d} duplicates a smaller batch survivor"
        seen.add(k)


def test_appended_docs_have_no_index_neardup(spark, sf_dir, stages):
    """neardup_incremental_lsh independently lists every batch doc with
    an index near-dup at the same threshold/candidates — none of them
    may survive to s3."""
    flagged = {
        r.new_doc for r in neardup_incremental_lsh(spark, sf_dir).collect()
    }
    assert flagged, "fixture corpus must have batch-vs-index near-dups"
    assert not (stages["s3"] & flagged)


def test_summary_matches_stage_sets(spark, sf_dir, stages):
    docs = load_table(spark, sf_dir, "documents")
    rows = corpus_incremental_build_summary(spark, sf_dir).collect()
    by_doc = {
        r.doc_id: (r.source, r.n_chars)
        for r in docs.filter(F.col("doc_id") % _INCR_MOD == 0).collect()
    }
    for row in rows:
        docs_in_src = {d for d, (s, _) in by_doc.items() if s == row.source}
        assert row.n_batch == len(docs_in_src)
        assert row.n_gopher == len(stages["s1"] & docs_in_src)
        assert row.n_exact_new == len(stages["s2"] & docs_in_src)
        assert row.n_neardup_new == len(stages["s3"] & docs_in_src)
        assert row.chars_appended == sum(
            by_doc[d][1] for d in stages["s3"] & docs_in_src
        )
