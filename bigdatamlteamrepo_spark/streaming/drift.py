"""Streaming distribution-drift monitor: per-trigger KL/JS of the
corpus-so-far against a pinned reference unigram distribution.

The batch core (``queries.health.unigram_divergence_against_ref``) is
reused verbatim — the stream only maintains the additive sufficient
statistic, per-(source, token) counts, which fold across micro-batches
by summation.  Mechanics mirror ``streaming.ingest``: each trigger
writes its count contribution into a batch-scoped overwrite
subdirectory (namespaced by the checkpoint location), so at-least-once
replays land exactly once; the per-trigger drift snapshot is the
divergence of the folded counts vs the static reference table.

Scale: the maintained state is the (source, token) count table —
Zipf-collapsed vocabulary × sources, orders of magnitude smaller than
the corpus — and each trigger's work is one micro-batch tokenize + one
vocab-sized aggregation + the tiny per-source reduce.  The reference
table is static and vocab-sized.  Per-trigger subdirectory appends are
foldable by ``streaming.ingest.compact_ingest_indexes``-style
compaction if a long-lived monitor accumulates many triggers.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdatamlteamrepo_spark.queries.health import (
    unigram_counts,
    unigram_divergence_against_ref,
)
from bigdatamlteamrepo_spark.streaming.ingest import _batch_tag, _exists, _join

_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("c_st", T.LongType()),
    ]
)
_REF_SCHEMA = T.StructType(
    [
        T.StructField("token", T.StringType()),
        T.StructField("c_t", T.LongType()),
    ]
)


def build_reference_distribution(docs: DataFrame, ref_dir: str) -> None:
    """Pin the reference unigram distribution (token, c_t) from a
    baseline corpus — the distribution every later batch is audited
    against."""
    (
        unigram_counts(docs)
        .groupBy("token")
        .agg(F.sum("c_st").cast("bigint").alias("c_t"))
        .write.mode("overwrite")
        .parquet(ref_dir)
    )


def read_running_counts(spark: SparkSession, counts_dir: str) -> DataFrame:
    """The folded (source, token, c_st) state across every trigger so
    far; typed-empty before the first trigger."""
    if not _exists(spark, counts_dir):
        return spark.createDataFrame([], _COUNT_SCHEMA)
    return (
        spark.read.schema(_COUNT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(counts_dir)
        .groupBy("source", "token")
        .agg(F.sum("c_st").cast("bigint").alias("c_st"))
    )


def drift_snapshot(
    spark: SparkSession, counts_dir: str, ref_dir: str
) -> DataFrame:
    """Divergence of the corpus-so-far vs the pinned reference — the
    same frame the batch core produces on a fully-materialized corpus."""
    ref = spark.read.schema(_REF_SCHEMA).parquet(ref_dir)
    return unigram_divergence_against_ref(
        read_running_counts(spark, counts_dir), ref
    )


def drift_monitor_stream(
    stream_docs: DataFrame,
    ref_dir: str,
    counts_dir: str,
    snapshots_dir: str,
    checkpoint_dir: str,
):
    """Wire a streaming documents source into the drift monitor: per
    trigger, fold the batch's counts into the running state and write
    the post-fold drift snapshot to a batch-scoped subdirectory.
    Returns the started query."""
    spark = stream_docs.sparkSession
    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def _process(batch: DataFrame, batch_id: int) -> None:
        tag = _batch_tag(batch_id, ns)
        unigram_counts(batch).write.mode("overwrite").parquet(
            _join(counts_dir, tag)
        )
        drift_snapshot(spark, counts_dir, ref_dir).write.mode(
            "overwrite"
        ).parquet(_join(snapshots_dir, tag))

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def source_entropy_snapshot(counts: DataFrame) -> DataFrame:
    """Per-source token Shannon entropy of the corpus-so-far, computed
    from the SAME maintained (source, token, c_st) state the divergence
    monitor folds — entropy is a function of the count table, so the
    stream gets a second quality signal (collapsing diversity = mode
    failure upstream, e.g. a crawler stuck in a template farm) for zero
    additional state.

    Columns: (source, tok_n, tok_distinct, tok_h_micro) — same
    micro-bit fixed-point discipline as ``queries/entropy.py``."""
    from bigdatamlteamrepo_spark.queries.entropy import entropy_from_counts

    cc = counts.select("source", F.col("token").alias("sym"), F.col("c_st").alias("c"))
    return entropy_from_counts(cc, ["source"], "tok")
