"""Streaming incremental ingest: the foreachBatch stream must equal
the sequential batch fold of the SAME building block, and a single
micro-batch must reproduce the registered batch capstone's stage
semantics exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.text_dedup import _INCR_MOD
from bigdatamlteamrepo_spark.queries.textmodel import incremental_stage_frames
from bigdatamlteamrepo_spark.streaming.ingest import (
    build_ingest_indexes,
    incremental_ingest_stream,
    ingest_batch,
)

_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


@pytest.fixture(scope="module")
def split(spark, sf_dir):
    """(index_docs, batch_halves): the 80% seed corpus and the 20%
    batch split into two arrival waves by doc_id order."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    is_new = F.col("doc_id") % _INCR_MOD == 0
    batch_ids = sorted(
        r.doc_id for r in docs.filter(is_new).select("doc_id").collect()
    )
    mid = batch_ids[len(batch_ids) // 2]
    index = docs.filter(~is_new)
    b1 = docs.filter(is_new & (F.col("doc_id") < mid))
    b2 = docs.filter(is_new & (F.col("doc_id") >= mid))
    return index, (b1, b2)


def _fold_decisions(spark, tmp, index, batches):
    idx = str(tmp / "fold_idx")
    build_ingest_indexes(index, idx)
    rows = []
    for b in batches:
        rows += ingest_batch(b, spark, idx).collect()
    return {r.doc_id: r.decision for r in rows}


def test_stream_equals_sequential_batch_fold(spark, tmp_path, split):
    index, (b1, b2) = split
    expect = _fold_decisions(spark, tmp_path, index, [b1, b2])

    idx = str(tmp_path / "stream_idx")
    build_ingest_indexes(index, idx)
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = incremental_ingest_stream(
        stream,
        idx,
        str(tmp_path / "decisions"),
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    assert n_batches >= 2, "waves must arrive in separate micro-batches"

    from bigdatamlteamrepo_spark.streaming.ingest import read_ingest_decisions

    got = {
        r.doc_id: r.decision
        for r in read_ingest_decisions(spark, str(tmp_path / "decisions")).collect()
    }
    assert got == expect
    assert set(got.values()) >= {"accepted", "gopher_fail"}


def test_single_batch_reproduces_registered_capstone(spark, sf_dir, tmp_path, split):
    index, (b1, b2) = split
    idx = str(tmp_path / "one_idx")
    build_ingest_indexes(index, idx)
    whole = b1.unionByName(b2)
    decisions = {
        r.doc_id: r.decision for r in ingest_batch(whole, spark, idx).collect()
    }

    frames = incremental_stage_frames(
        load_table(spark, sf_dir, "documents")
    )
    stages = {
        k: {r.doc_id for r in v.collect()}
        for k, v in frames.items()
        if not k.startswith("_")
    }
    for v in frames.values():
        v.unpersist()

    assert {d for d, v in decisions.items() if v == "accepted"} == stages["s3"]
    assert {
        d for d, v in decisions.items() if v in ("accepted", "near_dup")
    } == stages["s2"]
    assert {
        d for d, v in decisions.items() if v != "gopher_fail"
    } == stages["s1"]


def test_sequential_ingest_is_stricter_than_batch_at_once(spark, tmp_path):
    """A wave-2 doc exactly duplicating a wave-1 REJECTED doc is still
    dropped (ingested = seen), which the one-shot min-id rule would
    keep only for ACCEPTED wave-1 content — the documented semantic
    difference between the stream fold and the batch capstone."""
    # gopher-passing filler: ≥50 words, mean word length inside
    # (4.2, 5.0), ≥2 stopwords, all-alpha
    base = "the brave tiger hunts small birds and often naps under shade " * 6
    reject_text = "zz " * 60  # fails the stopword floor
    w1 = spark.createDataFrame(
        [(0, base + "alpha", "en", "s", 1), (2, reject_text, "en", "s", 1)],
        _DOC_SCHEMA,
    )
    w2 = spark.createDataFrame(
        [(4, reject_text, "en", "s", 1)], _DOC_SCHEMA
    )
    idx = str(tmp_path / "strict_idx")
    seed = spark.createDataFrame([], _DOC_SCHEMA)
    build_ingest_indexes(seed, idx)
    d1 = {r.doc_id: r.decision for r in ingest_batch(w1, spark, idx).collect()}
    d2 = {r.doc_id: r.decision for r in ingest_batch(w2, spark, idx).collect()}
    assert d1 == {0: "accepted", 2: "gopher_fail"}
    # doc 4 never reaches the exact/near-dup stages (gopher rejects it
    # first, same as doc 2) — but a gopher-PASSING copy of wave-1
    # rejected content must be caught by the exact stage:
    w3 = spark.createDataFrame(
        [(6, base + "alpha", "en", "s", 1)], _DOC_SCHEMA
    )
    d3 = {r.doc_id: r.decision for r in ingest_batch(w3, spark, idx).collect()}
    assert d2 == {4: "gopher_fail"}
    assert d3 == {6: "exact_dup"}


def test_index_compaction_preserves_decisions(spark, tmp_path, split):
    """Compacting the per-trigger appends must not change any future
    ingest decision, and must strictly shrink the file count."""
    import glob

    from bigdatamlteamrepo_spark.streaming.ingest import (
        compact_ingest_indexes,
        ingest_decisions,
    )

    index, (b1, b2) = split
    idx = str(tmp_path / "cmp_idx")
    build_ingest_indexes(index, idx)
    # several small appends -> many files
    for part in (b1, b2):
        ingest_batch(part.repartition(8), spark, idx)
    probe = b1.withColumn("doc_id", F.col("doc_id") + 50_000_000)

    def files(sub):
        return len(glob.glob(str(tmp_path / "cmp_idx" / sub / "*.parquet")))

    before_files = {s: files(s) for s in ("keys", "bands", "sets")}
    before = {
        r.doc_id: r.decision
        for r in ingest_decisions(probe, spark, idx).collect()
    }
    counts = compact_ingest_indexes(spark, idx)
    after_files = {s: files(s) for s in ("keys", "bands", "sets")}
    after = {
        r.doc_id: r.decision
        for r in ingest_decisions(probe, spark, idx).collect()
    }
    assert after == before
    assert set(counts) == {"keys", "bands", "sets"}
    for s in counts:
        assert after_files[s] < before_files[s]
        assert after_files[s] == counts[s]


def test_compaction_preserves_newest_batch_marker(spark, tmp_path, split):
    """keep_last=1: the newest batch subdirectory survives the fold
    (its replay marker must outlive compaction), older ones fold in,
    and a replay of the newest batch still lands exactly once."""
    import glob

    from bigdatamlteamrepo_spark.streaming.ingest import (
        compact_ingest_indexes,
        ingest_batch,
    )

    index, (b1, b2) = split
    idx = str(tmp_path / "keep_idx")
    build_ingest_indexes(index, idx)
    d1 = {r.doc_id: r.decision for r in ingest_batch(b1, spark, idx, batch_id=0).collect()}
    d2 = {r.doc_id: r.decision for r in ingest_batch(b2, spark, idx, batch_id=1).collect()}
    compact_ingest_indexes(spark, idx)
    for sub in ("keys", "bands", "sets"):
        assert os.path.isdir(tmp_path / "keep_idx" / sub / "b1"), sub
        assert not os.path.isdir(tmp_path / "keep_idx" / sub / "b0"), sub
    # replay of the STILL-MARKED newest batch reproduces its decisions
    d2r = {r.doc_id: r.decision for r in ingest_batch(b2, spark, idx, batch_id=1).collect()}
    assert d2r == d2
    # and the index state afterwards equals one clean fold (no dup rows)
    n_keys = (
        spark.read.schema("lang string, h string")
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "keep_idx" / "keys"))
        .count()
    )
    assert n_keys == index.count() + b1.count() + b2.count()
    assert d1  # silence unused warning


def test_compaction_self_heals_interrupted_swap(spark, tmp_path, split):
    """A crash between the two renames (table missing, .old present)
    and a crash before .old deletion (both present) both recover on
    the next compaction run, with no data loss."""
    import shutil

    from bigdatamlteamrepo_spark.streaming.ingest import (
        compact_ingest_indexes,
        ingest_decisions,
    )

    index, (b1, _) = split
    idx = str(tmp_path / "heal_idx")
    build_ingest_indexes(index, idx)
    probe = b1.withColumn("doc_id", F.col("doc_id") + 70_000_000)
    before = {
        r.doc_id: r.decision
        for r in ingest_decisions(probe, spark, idx).collect()
    }

    keys = os.path.join(idx, "keys")
    # crash window 1: src renamed aside, replacement never landed
    os.rename(keys, keys + ".old")
    compact_ingest_indexes(spark, idx)
    assert os.path.isdir(keys) and not os.path.exists(keys + ".old")
    # crash window 2: both live and .old exist (old swap not cleaned)
    shutil.copytree(keys, keys + ".old")
    compact_ingest_indexes(spark, idx)
    assert os.path.isdir(keys) and not os.path.exists(keys + ".old")
    after = {
        r.doc_id: r.decision
        for r in ingest_decisions(probe, spark, idx).collect()
    }
    assert after == before


def test_stream_decon_gate_equals_batch_fold(spark, sf_dir, tmp_path, split):
    """With eval_grams the stream must reproduce the sequential batch
    fold AND the registered ingest_decon_summary's s4 semantics — and
    the gate must be non-vacuous on the driver corpus (eval stand-in
    members arriving in the batch flag as eval_contaminated)."""
    from bigdatamlteamrepo_spark.queries.pipeline import eval_gram_frame
    from bigdatamlteamrepo_spark.queries.textmodel import (
        incremental_stage_frames,
    )
    from bigdatamlteamrepo_spark.streaming.ingest import (
        read_ingest_decisions,
    )

    index, (b1, b2) = split
    docs = load_table(spark, sf_dir, "documents")
    ev = eval_gram_frame(docs).localCheckpoint(eager=True)

    idx = str(tmp_path / "dfold_idx")
    build_ingest_indexes(index, idx)
    expect = {}
    for b in (b1, b2):
        for r in ingest_batch(b, spark, idx, eval_grams=ev).collect():
            expect[r.doc_id] = r.decision

    sidx = str(tmp_path / "dstream_idx")
    build_ingest_indexes(index, sidx)
    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = incremental_ingest_stream(
        stream,
        sidx,
        str(tmp_path / "ddecisions"),
        str(tmp_path / "dckpt"),
        eval_grams=ev,
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: r.decision
        for r in read_ingest_decisions(
            spark, str(tmp_path / "ddecisions")
        ).collect()
    }
    assert got == expect
    assert "eval_contaminated" in set(got.values())

    # the all-at-once fold's accepted set == the registered s4 stage
    frames = incremental_stage_frames(docs, eval_grams=ev)
    s4 = {r.doc_id for r in frames["s4"].collect()}
    for v in frames.values():
        v.unpersist()
    oidx = str(tmp_path / "donce_idx")
    build_ingest_indexes(index, oidx)
    once = {
        r.doc_id: r.decision
        for r in ingest_batch(
            b1.unionByName(b2), spark, oidx, eval_grams=ev
        ).collect()
    }
    assert {d for d, v in once.items() if v == "accepted"} == s4


def test_compaction_keep_last_clamps_to_available_subdirs(spark, tmp_path, split):
    """keep_last larger than the number of batch subdirectories keeps
    ALL of them (the slice must clamp, not wrap to a negative start
    that silently keeps only the newest)."""
    from bigdatamlteamrepo_spark.streaming.ingest import compact_ingest_indexes

    index, (b1, b2) = split
    idx = str(tmp_path / "clamp_idx")
    build_ingest_indexes(index, idx)
    ingest_batch(b1, spark, idx, batch_id=0)
    ingest_batch(b2, spark, idx, batch_id=1)
    compact_ingest_indexes(spark, idx, keep_last=3)
    for sub in ("keys", "bands", "sets"):
        assert os.path.isdir(tmp_path / "clamp_idx" / sub / "b0"), sub
        assert os.path.isdir(tmp_path / "clamp_idx" / sub / "b1"), sub


def test_heal_skips_folded_subdirs_no_duplicate_rows(spark, tmp_path, split):
    """A crash between the tmp->src swap and .old deletion leaves .old
    holding subdirs ALREADY folded into the compacted files; healing
    must restore only the non-folded (kept) ones, or index rows
    duplicate.  Emulated by reconstructing the exact crash state from
    a completed compaction's pre-image."""
    import shutil

    from bigdatamlteamrepo_spark.streaming.ingest import compact_ingest_indexes

    index, (b1, b2) = split
    idx = str(tmp_path / "healdup_idx")
    build_ingest_indexes(index, idx)
    ingest_batch(b1, spark, idx, batch_id=0)
    ingest_batch(b2, spark, idx, batch_id=1)
    keys = os.path.join(idx, "keys")
    pre_image = str(tmp_path / "keys_preimage")
    shutil.copytree(keys, pre_image)
    folded_names = [
        n for n in os.listdir(keys) if n != "b1"  # keep_last=1 keeps b1
    ]
    compact_ingest_indexes(spark, idx)  # folds base files + b0

    def n_keys():
        return (
            spark.read.schema("lang string, h string")
            .option("recursiveFileLookup", "true")
            .parquet(keys)
            .count()
        )

    clean = n_keys()
    # crash state: .old = pre-compaction table, manifest lists folded
    shutil.copytree(pre_image, keys + ".old")
    with open(keys + ".folded", "w") as f:
        f.write("\n".join(folded_names))
    compact_ingest_indexes(spark, idx)  # heals first
    assert not os.path.exists(keys + ".old")
    assert not os.path.exists(keys + ".folded")
    assert not os.path.isdir(os.path.join(keys, "b0"))  # folded: stays out
    assert n_keys() == clean  # no duplicated rows


def test_heal_restores_only_kept_subdir_when_missing(spark, tmp_path, split):
    """Same crash state but with the kept subdir missing from the new
    table (crash before the kept-subdir move): healing restores IT and
    nothing else."""
    import shutil

    from bigdatamlteamrepo_spark.streaming.ingest import compact_ingest_indexes

    index, (b1, b2) = split
    idx = str(tmp_path / "healkeep_idx")
    build_ingest_indexes(index, idx)
    ingest_batch(b1, spark, idx, batch_id=0)
    ingest_batch(b2, spark, idx, batch_id=1)
    keys = os.path.join(idx, "keys")
    pre_image = str(tmp_path / "keys_preimage2")
    shutil.copytree(keys, pre_image)
    folded_names = [n for n in os.listdir(keys) if n != "b1"]
    compact_ingest_indexes(spark, idx)

    def n_keys():
        return (
            spark.read.schema("lang string, h string")
            .option("recursiveFileLookup", "true")
            .parquet(keys)
            .count()
        )

    clean = n_keys()
    shutil.rmtree(os.path.join(keys, "b1"))  # crash before kept move
    shutil.copytree(pre_image, keys + ".old")
    with open(keys + ".folded", "w") as f:
        f.write("\n".join(folded_names))
    compact_ingest_indexes(spark, idx)
    assert os.path.isdir(os.path.join(keys, "b1"))  # kept: restored
    assert not os.path.isdir(os.path.join(keys, "b0"))
    assert n_keys() == clean
