"""Streaming maintenance of the BM25 inverted index
(streaming/index.py): stream-fed increments must answer EXACTLY like a
full rebuild, replays must land exactly once, and compaction must
change file layout only — never an answer."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators.retrieval import (
    bm25_from_index,
    build_inverted_index,
)
from bigdatamlteamrepo_spark.streaming.index import (
    append_batch_to_index,
    compact_index,
    incremental_index_stream,
    read_index_table,
)

_TERMS = ("spark", "join", "stream")
_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    is_new = F.col("doc_id") % 5 == 0
    ids = sorted(r.doc_id for r in docs.filter(is_new).select("doc_id").collect())
    mid = ids[len(ids) // 2]
    return (
        docs,
        docs.filter(~is_new),
        docs.filter(is_new & (F.col("doc_id") < mid)),
        docs.filter(is_new & (F.col("doc_id") >= mid)),
    )


def _scores(spark, idx):
    return [
        (r.doc_id, r.chunk_id, r.bm25)
        for r in bm25_from_index(spark, idx, _TERMS, k=20).collect()
    ]


def test_stream_fed_index_equals_full_rebuild(spark, tmp_path, corpus):
    all_docs, base, b1, b2 = corpus
    full = str(tmp_path / "full_idx")
    build_inverted_index(all_docs, full)
    want = _scores(spark, full)

    idx = str(tmp_path / "stream_idx")
    build_inverted_index(base, idx)
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = incremental_index_stream(stream, idx, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    assert n_batches >= 2, "waves must arrive in separate micro-batches"
    # bit-exact: same docs indexed => same floats (fixed-order scoring)
    assert _scores(spark, idx) == want


def test_replayed_batch_lands_exactly_once(spark, tmp_path, corpus):
    _, base, b1, _ = corpus
    idx = str(tmp_path / "replay_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0, namespace="t")
    once = _scores(spark, idx)
    n_rows = read_index_table(spark, idx, "postings").count()
    # at-least-once replay of the SAME batch id: overwrite, not append
    append_batch_to_index(b1, idx, batch_id=0, namespace="t")
    assert _scores(spark, idx) == once
    assert read_index_table(spark, idx, "postings").count() == n_rows


def test_compaction_preserves_answers_and_folds_increments(
    spark, tmp_path, corpus
):
    _, base, b1, b2 = corpus
    idx = str(tmp_path / "cmp_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0)
    append_batch_to_index(b2, idx, batch_id=1)
    want = _scores(spark, idx)
    counts = compact_index(spark, idx)  # keep_last=1 keeps b1... newest
    assert counts == {"postings": 1, "df": 1, "stats": 1}
    assert os.path.isdir(os.path.join(idx, "postings_inc", "b1"))
    assert not os.path.isdir(os.path.join(idx, "postings_inc", "b0"))
    assert _scores(spark, idx) == want
    # fold the rest too
    compact_index(spark, idx, keep_last=0)
    assert not os.path.isdir(os.path.join(idx, "postings_inc", "b1"))
    assert _scores(spark, idx) == want
    # stats pre-summed to one row per compaction
    assert read_index_table(spark, idx, "stats").count() == 1


def test_stream_only_index_no_prior_base(spark, tmp_path, corpus):
    """An index built ONLY from increments (no build_inverted_index)
    answers like the batch build, before and after its first
    compaction (the no-prior-base swap path)."""
    _, _, b1, b2 = corpus
    both = b1.unionByName(b2)
    full = str(tmp_path / "so_full")
    build_inverted_index(both, full)
    want = _scores(spark, full)
    idx = str(tmp_path / "so_idx")
    append_batch_to_index(b1, idx, batch_id=0)
    append_batch_to_index(b2, idx, batch_id=1)
    assert _scores(spark, idx) == want
    compact_index(spark, idx, keep_last=0)
    assert _scores(spark, idx) == want


def test_heal_after_completed_swap_drops_folded_increments(
    spark, tmp_path, corpus
):
    """Crash between the tmp->base swap and increment deletion: healing
    must DELETE the manifest-listed increments (their rows are in the
    new base) — restoring or re-reading them would double-count."""
    _, base, b1, b2 = corpus
    idx = str(tmp_path / "heal_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0)
    append_batch_to_index(b2, idx, batch_id=1)
    compact_index(spark, idx, keep_last=0)
    want = _scores(spark, idx)
    n_post = read_index_table(spark, idx, "postings").count()
    # reconstruct the crash state: .old = any dir, manifest lists an
    # increment subdir that we resurrect as if deletion never ran
    post = os.path.join(idx, "postings")
    shutil.copytree(post, post + ".old")
    resurrected = os.path.join(idx, "postings_inc", "b0")
    os.makedirs(os.path.dirname(resurrected), exist_ok=True)
    shutil.copytree(post, resurrected)  # stand-in folded increment
    with open(post + ".folded", "w") as f:
        f.write("b0")
    compact_index(spark, idx)  # heals first
    assert not os.path.exists(post + ".old")
    assert not os.path.exists(post + ".folded")
    assert not os.path.isdir(resurrected)
    assert read_index_table(spark, idx, "postings").count() == n_post
    assert _scores(spark, idx) == want


def test_heal_restores_base_when_swap_died(spark, tmp_path, corpus):
    """Crash between base->old and tmp->base: the base is missing and
    .old holds the pre-image; healing restores it and the increments
    (never deleted in this window) still answer."""
    _, base, b1, _ = corpus
    idx = str(tmp_path / "heal2_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0)
    want = _scores(spark, idx)
    post = os.path.join(idx, "postings")
    os.rename(post, post + ".old")
    with open(post + ".folded", "w") as f:
        f.write("b0")
    compact_index(spark, idx, keep_last=1)  # heals, then nothing to fold
    assert os.path.isdir(post)
    assert not os.path.exists(post + ".old")
    assert not os.path.exists(post + ".folded")
    assert os.path.isdir(os.path.join(idx, "postings_inc", "b0"))
    assert _scores(spark, idx) == want


def test_compaction_keeps_newest_per_namespace(spark, tmp_path, corpus):
    """Batch ids restart at 0 per checkpoint namespace (ADVICE_r7): a
    dead run's high-id batch must not displace the LIVE stream's
    replayable newest batch from the keep_last protection.  Folding the
    live batch would let its at-least-once replay recreate the subdir
    and double-count rows already folded into the base."""
    _, base, b1, b2 = corpus
    idx = str(tmp_path / "ns_idx")
    build_inverted_index(base, idx)
    # dead run: two batches under namespace 'dead', ids up to 5
    append_batch_to_index(b1, idx, batch_id=0, namespace="dead")
    append_batch_to_index(b1, idx, batch_id=5, namespace="dead")
    # live run restarted with a fresh checkpoint: its newest id is 0
    append_batch_to_index(b2, idx, batch_id=0, namespace="live")
    want = _scores(spark, idx)

    compact_index(spark, idx, keep_last=1)
    inc = os.path.join(idx, "postings_inc")
    # newest of EACH namespace survives; only the dead run's stale
    # batch folds
    assert os.path.isdir(os.path.join(inc, "bdead-5"))
    assert os.path.isdir(os.path.join(inc, "blive-0"))
    assert not os.path.isdir(os.path.join(inc, "bdead-0"))
    assert _scores(spark, idx) == want

    # the at-least-once replay of the live batch lands exactly once
    append_batch_to_index(b2, idx, batch_id=0, namespace="live")
    assert _scores(spark, idx) == want


def test_single_compactor_lease(spark, tmp_path, corpus):
    """The compaction crash-safety story assumes ONE maintainer
    (VERDICT_r7 #6): a second concurrent compactor must refuse loudly
    (CompactionLeaseHeld), and a crashed compactor's stale lease is
    stolen after the TTL."""
    from bigdatamlteamrepo_spark.streaming.ingest import (
        CompactionLeaseHeld,
        _acquire_compaction_lease,
        _release_compaction_lease,
    )

    _, base, b1, b2 = corpus
    idx = str(tmp_path / "lease_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0)
    append_batch_to_index(b2, idx, batch_id=1)

    lease = _acquire_compaction_lease(spark, idx)
    assert os.path.exists(os.path.join(idx, "_compaction.lease"))
    with pytest.raises(CompactionLeaseHeld):
        compact_index(spark, idx)
    # the refused attempt folded nothing
    assert os.path.isdir(os.path.join(idx, "postings_inc", "b0"))
    _release_compaction_lease(spark, lease)

    # crashed compactor: lease left behind, older than the TTL → stolen
    _acquire_compaction_lease(spark, idx)
    lease_file = os.path.join(idx, "_compaction.lease")
    stale = os.path.getmtime(lease_file) - 3600
    os.utime(lease_file, (stale, stale))
    counts = compact_index(spark, idx)
    assert counts  # proceeded
    assert not os.path.exists(lease_file)  # released on exit


def test_trigger_during_interrupted_compaction(spark, tmp_path, corpus):
    """A LIVE trigger landing while a compactor sits mid-swap (base
    renamed to .old, manifest written, crash before tmp->base) must
    neither corrupt nor be lost: increments are batch-scoped
    subdirectories that never touch the swap, so the append succeeds,
    the next compaction heals first, and the final index answers like
    a from-scratch build over all docs."""
    all_docs, base, b1, b2 = corpus
    full = str(tmp_path / "mid_full")
    build_inverted_index(all_docs, full)
    want = _scores(spark, full)

    idx = str(tmp_path / "mid_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0, namespace="live")
    # crash state mid-swap on postings: base moved aside, manifest
    # names b0 as folded-in-flight (its rows are NOT in any base yet —
    # this is the window between base->old and tmp->base, where tmp
    # vanished with the crash)
    post = os.path.join(idx, "postings")
    os.rename(post, post + ".old")
    with open(post + ".folded", "w") as f:
        f.write("blive-0")

    # the live trigger writes its next batch — untouched by the swap
    append_batch_to_index(b2, idx, batch_id=1, namespace="live")
    assert os.path.isdir(os.path.join(idx, "postings_inc", "blive-1"))

    # next maintenance heals (restores base, keeps b0) then folds
    compact_index(spark, idx, keep_last=0)
    assert _scores(spark, idx) == want


def test_retired_namespace_drains(spark, tmp_path, corpus):
    """retire_after_sec: a namespace whose newest batch is older than
    the horizon can no longer replay (its checkpoint is gone), so
    compaction folds it COMPLETELY instead of protecting its newest
    batch forever — dead restarts stop accreting unfoldable subdirs."""
    _, base, b1, b2 = corpus
    idx = str(tmp_path / "retire_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0, namespace="dead")
    append_batch_to_index(b2, idx, batch_id=0, namespace="live")
    want = _scores(spark, idx)
    # age the dead namespace's subdirs beyond the horizon
    for t in ("postings", "df", "stats"):
        p = os.path.join(idx, f"{t}_inc", "bdead-0")
        old = os.path.getmtime(p) - 3600
        os.utime(p, (old, old))
    compact_index(spark, idx, keep_last=1, retire_after_sec=600)
    inc = os.path.join(idx, "postings_inc")
    assert not os.path.isdir(os.path.join(inc, "bdead-0"))  # drained
    assert os.path.isdir(os.path.join(inc, "blive-0"))  # protected
    assert _scores(spark, idx) == want


def test_stale_lease_steal_race_single_winner(spark, tmp_path, corpus):
    """Two contenders seeing the SAME stale lease: the rename-based
    steal admits exactly one (the loser's rename finds the file gone
    and raises instead of deleting the winner's fresh lease)."""
    from bigdatamlteamrepo_spark.streaming.ingest import (
        CompactionLeaseHeld,
        _acquire_compaction_lease,
        _release_compaction_lease,
    )

    _, base, _, _ = corpus
    idx = str(tmp_path / "race_idx")
    build_inverted_index(base, idx)
    lease_file = os.path.join(idx, "_compaction.lease")
    _acquire_compaction_lease(spark, idx)
    stale = os.path.getmtime(lease_file) - 3600
    os.utime(lease_file, (stale, stale))
    # contender A steals successfully
    lease = _acquire_compaction_lease(spark, idx)
    # contender B arrives while A holds a FRESH lease: refused — the
    # delete+create scheme would have deleted A's lease here
    with pytest.raises(CompactionLeaseHeld):
        _acquire_compaction_lease(spark, idx)
    assert os.path.exists(lease_file)
    _release_compaction_lease(spark, lease)


def test_overrun_compactor_release_spares_stolen_lease(spark, tmp_path, corpus):
    """ADVICE_r8 #1: compactor A outlives the TTL, contender B steals
    the lease; A's finally-release must NOT delete B's fresh lease —
    the owner token mismatches, so release is a no-op and a third
    contender is still refused."""
    from bigdatamlteamrepo_spark.streaming.ingest import (
        CompactionLeaseHeld,
        _acquire_compaction_lease,
        _release_compaction_lease,
    )

    _, base, _, _ = corpus
    idx = str(tmp_path / "token_idx")
    build_inverted_index(base, idx)
    lease_file = os.path.join(idx, "_compaction.lease")

    lease_a = _acquire_compaction_lease(spark, idx)
    # A runs past the TTL...
    stale = os.path.getmtime(lease_file) - 3600
    os.utime(lease_file, (stale, stale))
    # ...B steals and holds a FRESH lease
    lease_b = _acquire_compaction_lease(spark, idx)
    # A finishes and releases: token mismatch → no-op
    _release_compaction_lease(spark, lease_a)
    assert os.path.exists(lease_file)
    # a third contender is still refused while B works
    with pytest.raises(CompactionLeaseHeld):
        _acquire_compaction_lease(spark, idx)
    # B's own release (token matches) removes the lease
    _release_compaction_lease(spark, lease_b)
    assert not os.path.exists(lease_file)


def test_retire_checks_checkpoint_liveness(spark, tmp_path, corpus):
    """ADVICE_r8 #2: a live-but-idle stream (namespace marker points at
    a checkpoint dir that still exists) keeps its replay protection
    past the mtime horizon; a namespace whose recorded checkpoint is
    gone drains."""
    from bigdatamlteamrepo_spark.streaming.ingest import _record_namespace

    _, base, b1, b2 = corpus
    idx = str(tmp_path / "liveness_idx")
    build_inverted_index(base, idx)
    append_batch_to_index(b1, idx, batch_id=0, namespace="idle")
    append_batch_to_index(b2, idx, batch_id=0, namespace="gone")
    want = _scores(spark, idx)

    ck_idle = str(tmp_path / "ck_idle")
    os.makedirs(ck_idle)  # checkpoint still on disk: stream can replay
    _record_namespace(spark, idx, "idle", ck_idle)
    _record_namespace(spark, idx, "gone", str(tmp_path / "ck_gone"))  # absent

    # age BOTH namespaces beyond the horizon
    for ns in ("idle", "gone"):
        for t in ("postings", "df", "stats"):
            p = os.path.join(idx, f"{t}_inc", f"b{ns}-0")
            old = os.path.getmtime(p) - 3600
            os.utime(p, (old, old))
    compact_index(spark, idx, keep_last=1, retire_after_sec=600)
    inc = os.path.join(idx, "postings_inc")
    assert os.path.isdir(os.path.join(inc, "bidle-0"))  # protected: ckpt alive
    assert not os.path.isdir(os.path.join(inc, "bgone-0"))  # drained
    assert _scores(spark, idx) == want
