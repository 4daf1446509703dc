"""Exactly-once-style streaming sinks via ``foreachBatch``.

Structured Streaming guarantees at-least-once delivery to foreachBatch:
after a crash the last uncommitted epoch is REPLAYED, so a naive
append sink duplicates it.  The standard idempotence recipe: key every
write by ``batch_id`` so a replay overwrites its own previous attempt
instead of appending a second copy (`partitionBy(batch_id)` + dynamic
partition overwrite).

This is the pattern for any non-transactional target (parquet dirs,
object stores, key-value upserts); transactional sinks (Delta, JDBC
with txn) can instead commit (batch_id, data) atomically and skip
already-seen ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(out_dir: str):
    """foreachBatch function writing each epoch to ``batch_id=N`` with
    dynamic partition overwrite — replaying an epoch replaces its own
    output, never duplicates it."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write


def write_stream_idempotent(agg: DataFrame, out_dir: str, checkpoint: str):
    """Attach the idempotent parquet sink to a streaming DataFrame."""
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(idempotent_parquet_writer(out_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
