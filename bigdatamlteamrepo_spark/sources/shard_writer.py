"""Training-shard sink: deal a corpus to N deterministic shards and
write them as partitioned parquet with a manifest.

The write-side complement of the shard-planning queries
(queries/shards.py): ``shard=<k>/`` directories a trainer's data
loader consumes, each file internally ordered by the same portable
hash that assigned the shard — so a re-run over identical input
produces byte-identical shard contents (modulo parquet encoding), and
any single shard can be re-read in a reproducible order without
consulting the others.

Scale shape: one hash-partition shuffle on the shard id plus a local
sort per partition — Spark's native ``repartition +
sortWithinPartitions`` path; no global ordering, no driver state.  The
manifest is an aggregate over the assignment (one row per shard),
computed in the same job graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.shards import N_SHARDS, hash32


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
    split_col: str | None = None,
) -> DataFrame:
    """Write ``docs`` to ``out_dir`` partitioned by deterministic shard;
    return the manifest (shard, n_docs, min/max id, id_checksum).

    The manifest checksum (sum of 32-bit id hashes mod 2^63) lets an
    independent reader re-derive and verify shard membership without
    re-listing files.

    ``split_col``: when the frame carries split labels (the
    build_training_corpus ``assign_splits`` path), partition the layout
    by (split, shard) so a loader opens ONLY its split's directories —
    train never lists val/test files — and key the manifest the same
    way.  Shard membership stays a pure function of the id hash, so a
    doc keeps its shard number whichever split it lands in."""
    assigned = docs.withColumn("__h", hash32(F.col(id_col))).withColumn(
        "shard", F.col("__h") % n_shards
    )
    parts = [split_col, "shard"] if split_col else ["shard"]
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions(*parts, "__h", id_col)
        .drop("__h")
        .write.mode("overwrite")
        .partitionBy(*parts)
        .parquet(out_dir)
    )
    manifest = (
        assigned.groupBy(*parts)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
            (F.sum("__h") % F.lit(2**63 - 1)).alias("id_checksum"),
        )
        .orderBy(*parts)
    )
    manifest.coalesce(1).write.mode("overwrite").json(out_dir + "/_manifest")
    return manifest


def read_training_shard(spark, out_dir: str, shard: int) -> DataFrame:
    """Read one shard back, in its written (hash, id) order.

    Partition pruning on the ``shard=<k>`` directory means only that
    shard's files are touched — verified by the partition-pruning plan
    test pattern (tests/test_plans.py).
    """
    return (
        spark.read.option("basePath", out_dir)
        .parquet(f"{out_dir}/shard={shard}")
    )
