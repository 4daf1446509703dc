"""Streaming maintenance of the BM25 inverted index
(operators/retrieval.py) — the retrieval twin of the dedup-index
ingest tier (streaming/ingest.py).

Layout: the BASE tables (``postings/``, ``df/``, ``stats/``) stay
exactly as :func:`~bigdatamlteamrepo_spark.operators.retrieval.
build_inverted_index` writes them (pbucket directory-partitioned).
Each micro-batch's contributions land in sibling increment dirs
(``postings_inc/b{ns}-{id}/`` ...), written with **overwrite** into a
batch-scoped subdirectory — the exactly-once-under-at-least-once
discipline of streaming/ingest.py: a replayed foreachBatch call
rewrites the same subdirectory instead of double-appending.

Increments carry ``pbucket`` as a plain column with files sorted on
(pbucket, term): directory partitioning and batch subdirectories don't
compose (partition discovery refuses mixed-depth leaves, and
``recursiveFileLookup`` disables it), so increments rely on row-group
min/max pruning — the same trade the ingest compactor makes.  The
read path unions base + increments; ``compact_index`` folds
increments back into the partitioned base (rename-swap with a
``.folded`` manifest, self-healing — same crash windows as
streaming/ingest.py and the same recovery discipline).

At 100 TB: per-trigger cost is O(batch tokens); the base is never
read by an append; queries read k pbucket partitions of the base plus
the (few, compaction-bounded) increment subdirs with the term
predicate pushed into their sorted row groups.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.retrieval import (
    N_PBUCKETS,
    _chunk_stream,
    hash32,
)
from bigdatamlteamrepo_spark.streaming.ingest import (
    _acquire_compaction_lease,
    _batch_tag,
    _kept_newest,
    _ns_checkpoint_alive,
    _record_namespace,
    _release_compaction_lease,
    _tag_batch_id,
    _delete,
    _exists,
    _join,
    _list_children,
    _read_text,
    _rename,
    _write_text,
)

#: increment-table schemas (pbucket is a DATA column here)
#: pbucket is INT: the base tables' directory-partition values are
#: re-inferred as int on read, and unionByName needs exact type match
_INC_SCHEMAS = {
    "postings": (
        "term string, doc_id bigint, chunk_id bigint, dl int,"
        " tf bigint, pbucket int"
    ),
    "df": "term string, df bigint, pbucket int",
    "stats": "n_ch bigint, tot_dl bigint",
}
_TABLES = tuple(_INC_SCHEMAS)


def _batch_frames(docs: DataFrame) -> dict[str, DataFrame]:
    """One chunk pass → the three per-batch index contributions
    (same expressions as build_inverted_index / append_to_inverted_index
    so incremental ≡ rebuild stays pinned)."""
    ch = _chunk_stream(docs).persist()
    postings = (
        ch.select(
            "doc_id",
            "chunk_id",
            F.size("ctoks").alias("dl"),
            F.explode("ctoks").alias("term"),
        )
        .groupBy("term", "doc_id", "chunk_id", "dl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn(
            "pbucket", (hash32(F.col("term")) % N_PBUCKETS).cast("int")
        )
    )
    df = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .withColumn(
            "pbucket", (hash32(F.col("term")) % N_PBUCKETS).cast("int")
        )
    )
    stats = ch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ch"),
        F.sum(F.size("ctoks")).cast("bigint").alias("tot_dl"),
    )
    return {"postings": postings, "df": df, "stats": stats, "__ch": ch}


def append_batch_to_index(
    docs: DataFrame,
    index_dir: str,
    batch_id: int = 0,
    namespace: str = "",
) -> None:
    """Fold one micro-batch into the index increments: every table's
    contribution OVERWRITES its batch-scoped subdirectory, so an
    at-least-once replay of the same batch lands exactly once."""
    frames = _batch_frames(docs)
    tag = _batch_tag(batch_id, namespace)
    (
        frames["postings"]
        .sortWithinPartitions("pbucket", "term")
        .write.mode("overwrite")
        .parquet(_join(index_dir, "postings_inc", tag))
    )
    (
        frames["df"]
        .sortWithinPartitions("pbucket", "term")
        .write.mode("overwrite")
        .parquet(_join(index_dir, "df_inc", tag))
    )
    frames["stats"].coalesce(1).write.mode("overwrite").parquet(
        _join(index_dir, "stats_inc", tag)
    )
    frames["__ch"].unpersist()


def incremental_index_stream(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
):
    """Wire a streaming documents source into the index: per trigger,
    the batch's postings/df/stats contributions land in batch-scoped
    overwrite subdirectories namespaced by the checkpoint location
    (a restarted stream with a fresh checkpoint can never clobber an
    older run's contributions).  Returns the started query."""
    ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]
    _record_namespace(
        stream_docs.sparkSession, index_dir, ns, checkpoint_dir
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        append_batch_to_index(batch, index_dir, batch_id=batch_id, namespace=ns)

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------------------------------------
# Read path: base ∪ increments
# --------------------------------------------------------------------------


def _inc_subdirs(spark: SparkSession, index_dir: str, table: str) -> list[str]:
    root = _join(index_dir, f"{table}_inc")
    if not _exists(spark, root):
        return []
    return sorted(
        c[1] for c in _list_children(spark, root) if c[2]
    )


def read_index_table(
    spark: SparkSession, index_dir: str, table: str, missing_ok: bool = False
) -> DataFrame:
    """``table`` rows across the partitioned base and every increment
    subdirectory.  The base read keeps pbucket directory-partition
    pruning; increment reads push the pbucket/term predicates into
    their sorted row groups.

    ``missing_ok=False`` (the default) raises when NEITHER the base nor
    any increment exists: a mistyped ``index_dir`` must fail loudly,
    not read as an empty index (zero query results)."""
    incs = _inc_subdirs(spark, index_dir, table)
    if (
        not missing_ok
        and not incs
        and not _exists(spark, _join(index_dir, table))
    ):
        raise FileNotFoundError(
            f"no index table at {index_dir}/{table} (base or *_inc) — "
            "build_inverted_index / append_batch_to_index first"
        )
    return read_index_table_subset(spark, index_dir, table, incs)


# --------------------------------------------------------------------------
# Compaction (OPTIMIZE): fold increments into the partitioned base
# --------------------------------------------------------------------------


def _heal_index(spark: SparkSession, index_dir: str) -> None:
    """Recover an interrupted compaction.  Crash windows (per table,
    write order: tmp → manifest → base→old → tmp→base → delete incs →
    delete old → delete manifest):

    * ``.compacting`` present → the swap never happened; discard it
      (the increments are all still in place).
    * ``.old`` present, base missing → the swap died between renames;
      restore the old base (increments untouched — exact pre-image).
    * ``.old`` alongside a live base → the swap completed, so the
      ``.folded`` manifest's increment subdirs are already IN the new
      base — delete them (restoring or re-reading them would double-
      count) and drop ``.old``.
    * manifest present with NO ``.old`` and NO ``.compacting`` but a
      live base → the stream-only first compaction (no prior base to
      rename aside) completed its swap; delete the folded increments.
      (With a prior base this state is unreachable: before the
      base→old rename the ``.compacting`` dir still exists.)"""
    for table in _TABLES:
        base = _join(index_dir, table)
        tmp, old, man = base + ".compacting", base + ".old", base + ".folded"
        tmp_present = _exists(spark, tmp)
        if tmp_present:
            _delete(spark, tmp)

        def _drop_folded() -> None:
            if _exists(spark, man):
                for sub in _read_text(spark, man).split():
                    p = _join(index_dir, f"{table}_inc", sub)
                    if _exists(spark, p):
                        _delete(spark, p)

        if _exists(spark, old):
            if not _exists(spark, base):
                _rename(spark, old, base)
            else:
                _drop_folded()
                _delete(spark, old)
        elif (
            not tmp_present
            and _exists(spark, man)
            and _exists(spark, base)
        ):
            _drop_folded()
        if _exists(spark, man):
            _delete(spark, man)


def compact_index(
    spark: SparkSession,
    index_dir: str,
    keep_last: int = 1,
    retire_after_sec: float | None = None,
) -> dict[str, int]:
    """Fold increment subdirectories into the partitioned base tables
    (rename-swap, self-healing).  The ``keep_last`` NEWEST increments
    per table and PER CHECKPOINT NAMESPACE survive as-is — the only
    batch an at-least-once restart can replay is the last uncommitted
    one of its own checkpoint, and folding its subdir would let the
    replay double-land; batch ids restart at 0 per checkpoint, so a
    global newest-by-id pick could fold the live stream's replayable
    batch in favor of a dead run's high-id one (the
    streaming/ingest.py rule, ADVICE_r7).
    df/stats contributions pre-SUM during the fold, so the compacted
    read answers exactly like the increment fold (pinned in tests).
    Guarded by the single-compactor lease (streaming/ingest.py): a
    second concurrent compactor raises ``CompactionLeaseHeld``.
    Returns folded-increment counts per table."""
    lease = _acquire_compaction_lease(spark, index_dir)
    try:
        return _compact_index_locked(
            spark, index_dir, keep_last, retire_after_sec
        )
    finally:
        _release_compaction_lease(spark, lease)


def _compact_index_locked(
    spark: SparkSession,
    index_dir: str,
    keep_last: int,
    retire_after_sec: float | None = None,
) -> dict[str, int]:
    _heal_index(spark, index_dir)
    out = {}
    alive = (
        _ns_checkpoint_alive(spark, index_dir)
        if retire_after_sec is not None
        else None
    )
    for table in _TABLES:
        root = _join(index_dir, f"{table}_inc")
        if not _exists(spark, root):
            continue
        subs = sorted(
            [c for c in _list_children(spark, root) if c[2]],
            key=lambda c: (_tag_batch_id(c[0]), c[3], c[0]),
        )
        kept = _kept_newest(subs, keep_last, retire_after_sec, alive)
        fold = [c for c in subs if c[0] not in kept]
        if not fold:
            continue
        base = _join(index_dir, table)
        tmp, old, man = base + ".compacting", base + ".old", base + ".folded"
        merged = read_index_table_subset(
            spark, index_dir, table, [c[1] for c in fold]
        )
        if table == "postings":
            (
                merged.repartition("pbucket")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("pbucket")
                .parquet(tmp)
            )
        elif table == "df":
            (
                merged.groupBy("term", "pbucket")
                .agg(F.sum("df").cast("bigint").alias("df"))
                .select("term", "df", "pbucket")
                .repartition("pbucket")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("pbucket")
                .parquet(tmp)
            )
        else:  # stats
            (
                merged.agg(
                    F.sum("n_ch").cast("bigint").alias("n_ch"),
                    F.sum("tot_dl").cast("bigint").alias("tot_dl"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
        _write_text(spark, man, "\n".join(c[0] for c in fold))
        if _exists(spark, base):
            _rename(spark, base, old)
        _rename(spark, tmp, base)
        for c in fold:
            _delete(spark, c[1])
        if _exists(spark, old):
            _delete(spark, old)
        _delete(spark, man)
        out[table] = len(fold)
    return out


def read_index_table_subset(
    spark: SparkSession, index_dir: str, table: str, inc_paths: list[str]
) -> DataFrame:
    """Base ∪ a GIVEN set of increment subdirectories (the compaction
    fold input)."""
    parts = []
    base = _join(index_dir, table)
    if _exists(spark, base):
        parts.append(spark.read.parquet(base))
    if inc_paths:
        parts.append(
            spark.read.schema(_INC_SCHEMAS[table]).parquet(*inc_paths)
        )
    if not parts:
        return spark.createDataFrame([], _INC_SCHEMAS[table])
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
