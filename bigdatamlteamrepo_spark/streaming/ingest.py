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
are plain parquet appends — the local stand-in for the same contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.textmodel import (
    batch_ingest_stages,
    doc_shingle_sets,
)

#: index subdirectories: md5 content keys, LSH band rows, shingle sets
_KEYS, _BANDS, _SETS = "keys", "bands", "sets"

_EMPTY = {
    _KEYS: "lang string, h string",
    _BANDS: "doc_id bigint, band string",
    _SETS: "doc_id bigint, s array<string>",
}


def build_ingest_indexes(docs: DataFrame, index_dir: str) -> None:
    """Seed the persisted index tables from an already-ingested corpus
    (one-time backfill; after this the stream maintains them)."""
    from bigdatamlteamrepo_spark.queries.text_dedup import lsh_band_rows

    docs.select("lang", F.md5("text").alias("h")).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, _KEYS))
    sets = doc_shingle_sets(docs).persist()
    sets.write.mode("overwrite").parquet(os.path.join(index_dir, _SETS))
    lsh_band_rows(sets, F.col("s")).write.mode("overwrite").parquet(
        os.path.join(index_dir, _BANDS)
    )
    sets.unpersist()


def _read_index(spark: SparkSession, index_dir: str, sub: str) -> DataFrame:
    path = os.path.join(index_dir, sub)
    try:
        return spark.read.parquet(path)
    except Exception:  # first trigger against an unseeded index
        return spark.createDataFrame([], _EMPTY[sub])


def ingest_decisions(
    batch: DataFrame, spark: SparkSession, index_dir: str
) -> DataFrame:
    """(doc_id, source, n_chars, decision) for one batch of arriving
    docs against the CURRENT index tables.  ``decision``:
    ``gopher_fail`` | ``exact_dup`` | ``near_dup`` | ``accepted``
    (first failing stage, the doc_quality_filter routing convention).
    Pure read — index maintenance is :func:`append_to_indexes`."""
    index_keys = _read_index(spark, index_dir, _KEYS).distinct()
    index_bands = _read_index(spark, index_dir, _BANDS)
    index_sets = _read_index(spark, index_dir, _SETS)
    stages = batch_ingest_stages(batch, index_keys, index_bands, index_sets)
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
    for frame in stages.values():
        frame.unpersist()
    return out


def append_to_indexes(batch: DataFrame, index_dir: str) -> None:
    """Every arriving doc joins the index — accepted or not (ingested
    = seen; a rejected doc's content still counts as known)."""
    from bigdatamlteamrepo_spark.queries.text_dedup import lsh_band_rows

    batch.select("lang", F.md5("text").alias("h")).write.mode(
        "append"
    ).parquet(os.path.join(index_dir, _KEYS))
    sets = doc_shingle_sets(batch).persist()
    sets.write.mode("append").parquet(os.path.join(index_dir, _SETS))
    lsh_band_rows(sets, F.col("s")).write.mode("append").parquet(
        os.path.join(index_dir, _BANDS)
    )
    sets.unpersist()


def ingest_batch(
    batch: DataFrame, spark: SparkSession, index_dir: str
) -> DataFrame:
    """One full ingest step: decide, then fold the batch into the
    index.  Returns the decisions frame (already materialized, so the
    decisions reflect the PRE-append index state).  The batch-mode
    building block the stream applies per trigger — fold it over
    splits by hand to get the reference semantics the stream must
    match."""
    out = ingest_decisions(batch, spark, index_dir)
    append_to_indexes(batch, index_dir)
    return out


def compact_ingest_indexes(
    spark: SparkSession, index_dir: str, target_mb: int = 128
) -> dict[str, int]:
    """Compact the per-trigger parquet appends (one file-set per
    micro-batch) into ~``target_mb`` files, sorted within files on the
    probe key so row-group min/max stats prune the next batch's joins
    — the OPTIMIZE half of running this ingest indefinitely.  Safe to
    run between triggers (each table is rebuilt beside the original,
    then swapped in); returns the output file count per table."""
    import shutil

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
        tmp = src + ".compacting"
        out[sub] = compact_parquet(
            spark, src, tmp, target_mb, sort_within_by=sort_cols
        )
        shutil.rmtree(src)
        os.rename(tmp, src)
    return out


def incremental_ingest_stream(
    stream_docs: DataFrame,
    index_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
):
    """Wire a streaming documents source into the ingest: per trigger,
    write this micro-batch's decisions to ``decisions_dir`` and fold
    the batch into the index tables.  Returns the started query."""
    spark = stream_docs.sparkSession

    def _process(batch: DataFrame, _batch_id: int) -> None:
        ingest_decisions(batch, spark, index_dir).write.mode(
            "append"
        ).parquet(decisions_dir)
        append_to_indexes(batch, index_dir)

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
