"""Streaming incremental corpus ingest: the full curation gate
(Gopher → exact dedup → LSH near-dup) applied per micro-batch against
PERSISTED index tables that the stream itself maintains — the
continuously-running form of the batch capstone
(queries/textmodel.corpus_incremental_build_summary).

Why ``foreachBatch`` and not stateful operators: one ingest decision
needs a gopher scan, two grouped aggregations, three equi-joins and an
anti-join — far outside what append-mode streaming or
``applyInPandasWithState`` can express, and the index is shared
corpus-wide state, not per-key state.  ``foreachBatch`` hands each
micro-batch over as a static DataFrame, so the EXACT batch
implementation (queries/textmodel.batch_ingest_stages) runs unchanged
and stream ≡ sequential-batch-fold holds by construction (pinned in
tests/test_streaming_ingest.py).

Exactly-once on an at-least-once runtime: every write lands in a
batch-scoped subdirectory (``b<batch_id>/``) with overwrite semantics,
and a replayed trigger first DELETES its own subdirectories — so a
crash between the decisions write and the index fold replays cleanly:
the partial contribution is removed before decisions are recomputed,
and both writes land exactly once.  Tables are read with
``recursiveFileLookup`` (plain appends from batch-mode callers and
batch subdirectories coexist).

Semantics note: sequential ingest is STRICTER than the one-shot batch
query.  Every arriving doc joins the index (ingested = seen, the
conservative reading — a rejected doc's content still counts as known),
so a later micro-batch's doc near-duplicating an earlier REJECTED doc
is dropped, where the batch-at-once min-id rule would keep it.  On a
single micro-batch the two coincide exactly (pinned in tests).

Scale: per micro-batch cost is O(|batch|) hash/signature work plus
equi-joins against the index tables; the index grows by |batch| rows
per trigger and never rescans.  At 100 TB the band table is bucketed by
``band`` and the key table by ``(lang, h)`` so the probe side shuffles
only the batch (lsh_band_rows documents the layout); here the indexes
are parquet directories — the local stand-in for the same contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.text_dedup import (
    doc_shingle_sets,
    lsh_band_rows,
)
from bigdatamlteamrepo_spark.queries.textmodel import batch_ingest_stages

#: index subdirectories: md5 content keys, LSH band rows, shingle sets
_KEYS, _BANDS, _SETS = "keys", "bands", "sets"
_TABLES = (_KEYS, _BANDS, _SETS)

_EMPTY = {
    _KEYS: "lang string, h string",
    _BANDS: "doc_id bigint, band string",
    _SETS: "doc_id bigint, s array<string>",
}


def _batch_frames(batch: DataFrame) -> dict[str, DataFrame]:
    """The batch's index contributions, shingle sets computed ONCE and
    shared between the band rows and the caller (persisted — caller
    unpersists after its writes/decisions materialize)."""
    sets = doc_shingle_sets(batch).persist()
    return {
        _KEYS: batch.select("lang", F.md5("text").alias("h")),
        _BANDS: lsh_band_rows(sets, F.col("s")),
        _SETS: sets,
    }


def build_ingest_indexes(docs: DataFrame, index_dir: str) -> None:
    """Seed the persisted index tables from an already-ingested corpus
    (one-time backfill; after this the stream maintains them)."""
    frames = _batch_frames(docs)
    for sub in _TABLES:
        frames[sub].write.mode("overwrite").parquet(
            os.path.join(index_dir, sub)
        )
    frames[_SETS].unpersist()


def _read_index(spark: SparkSession, index_dir: str, sub: str) -> DataFrame:
    """One index table, or a typed empty frame for a genuinely
    never-seeded path.  Any OTHER read failure propagates: silently
    treating a broken index as empty would accept every duplicate in
    the corpus (and an interrupted compaction leaves a recoverable
    ``.old`` sibling that must not be mistaken for 'unseeded')."""
    path = os.path.join(index_dir, sub)
    if not os.path.exists(path):
        for leftover in (path + ".old", path + ".compacting"):
            if os.path.exists(leftover):
                raise RuntimeError(
                    f"index table {path} missing but {leftover} exists — "
                    "interrupted compaction; restore it (mv) before "
                    "resuming the ingest"
                )
        return spark.createDataFrame([], _EMPTY[sub])
    return (
        spark.read.schema(_EMPTY[sub])
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def ingest_decisions(
    batch: DataFrame,
    spark: SparkSession,
    index_dir: str,
    frames: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """(doc_id, source, n_chars, decision) for one batch of arriving
    docs against the CURRENT index tables.  ``decision``:
    ``gopher_fail`` | ``exact_dup`` | ``near_dup`` | ``accepted``
    (first failing stage, the doc_quality_filter routing convention).
    Pure read — index maintenance is :func:`append_to_indexes`.
    ``frames`` optionally carries :func:`_batch_frames` output so the
    batch's sets/bands are computed once per trigger."""
    index_keys = _read_index(spark, index_dir, _KEYS).distinct()
    index_bands = _read_index(spark, index_dir, _BANDS)
    index_sets = _read_index(spark, index_dir, _SETS)
    stages = batch_ingest_stages(
        batch,
        index_keys,
        index_bands,
        index_sets,
        bsets=frames[_SETS] if frames else None,
        bbands=frames[_BANDS] if frames else None,
    )
    base = batch.select("doc_id", "source", "n_chars")
    for name in ("s1", "s2", "s3"):
        base = base.join(
            stages[name].withColumn(f"__{name}", F.lit(1)), "doc_id", "left"
        )
    out = base.select(
        "doc_id",
        "source",
        "n_chars",
        F.when(F.col("__s1").isNull(), "gopher_fail")
        .when(F.col("__s2").isNull(), "exact_dup")
        .when(F.col("__s3").isNull(), "near_dup")
        .otherwise("accepted")
        .alias("decision"),
    ).localCheckpoint(eager=True)
    for name, frame in stages.items():
        if frames is None or frame is not frames.get(_SETS):
            frame.unpersist()
    return out


def append_to_indexes(
    batch: DataFrame,
    index_dir: str,
    batch_id: int | None = None,
    frames: dict[str, DataFrame] | None = None,
) -> None:
    """Every arriving doc joins the index — accepted or not (ingested
    = seen; a rejected doc's content still counts as known).  With a
    ``batch_id`` the contribution lands in an overwrite-semantics
    subdirectory (replay-idempotent); without one it appends in place
    (batch-mode callers)."""
    own = frames if frames is not None else _batch_frames(batch)
    for sub in _TABLES:
        path = os.path.join(index_dir, sub)
        if batch_id is not None:
            own[sub].write.mode("overwrite").parquet(
                os.path.join(path, f"b{batch_id}")
            )
        else:
            own[sub].write.mode("append").parquet(path)
    if frames is None:
        own[_SETS].unpersist()


def ingest_batch(
    batch: DataFrame,
    spark: SparkSession,
    index_dir: str,
    batch_id: int | None = None,
) -> DataFrame:
    """One full ingest step: decide, then fold the batch into the
    index.  Returns the decisions frame (already materialized, so the
    decisions reflect the PRE-append index state).  The batch-mode
    building block the stream applies per trigger — fold it over
    splits by hand to get the reference semantics the stream must
    match.  On a replay (same ``batch_id``), any partial contribution
    from a crashed attempt is removed before deciding."""
    if batch_id is not None:
        for sub in _TABLES:
            partial = os.path.join(index_dir, sub, f"b{batch_id}")
            if os.path.exists(partial):
                shutil.rmtree(partial)
    frames = _batch_frames(batch)
    out = ingest_decisions(batch, spark, index_dir, frames=frames)
    append_to_indexes(batch, index_dir, batch_id=batch_id, frames=frames)
    frames[_SETS].unpersist()
    return out


def read_ingest_decisions(spark: SparkSession, decisions_dir: str) -> DataFrame:
    """The decisions log (batch-scoped subdirectories)."""
    return (
        spark.read.schema("doc_id bigint, source string, n_chars bigint, decision string")
        .option("recursiveFileLookup", "true")
        .parquet(decisions_dir)
    )


def compact_ingest_indexes(
    spark: SparkSession, index_dir: str, target_mb: int = 128
) -> dict[str, int]:
    """Compact the per-trigger subdirectory writes into ~``target_mb``
    files, sorted within files on the probe key so row-group min/max
    stats prune the next batch's joins — the OPTIMIZE half of running
    this ingest indefinitely.  Run it between triggers (the swap is
    rename-based: the original is moved aside, the compacted tree
    moved in, THEN the original deleted — an interruption leaves a
    ``.old`` sibling that :func:`_read_index` refuses to ignore, never
    a silently-empty table).  Returns the output file count per table."""
    from bigdatamlteamrepo_spark.sources.layout import compact_parquet

    out = {}
    for sub, sort_cols in (
        (_KEYS, ("lang", "h")),
        (_BANDS, ("band",)),
        (_SETS, ("doc_id",)),
    ):
        src = os.path.join(index_dir, sub)
        if not os.path.exists(src):
            continue
        tmp, old = src + ".compacting", src + ".old"
        out[sub] = compact_parquet(
            spark,
            src,
            tmp,
            target_mb,
            sort_within_by=sort_cols,
            recursive=True,
        )
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
    return out


def incremental_ingest_stream(
    stream_docs: DataFrame,
    index_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
):
    """Wire a streaming documents source into the ingest: per trigger,
    write this micro-batch's decisions to ``decisions_dir`` and fold
    the batch into the index tables — both into batch-scoped overwrite
    subdirectories, so an at-least-once replay lands exactly once.
    Returns the started query."""
    spark = stream_docs.sparkSession

    def _process(batch: DataFrame, batch_id: int) -> None:
        ingest_batch(batch, spark, index_dir, batch_id=batch_id).write.mode(
            "overwrite"
        ).parquet(os.path.join(decisions_dir, f"b{batch_id}"))

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
