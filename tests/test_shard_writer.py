"""Shard sink roundtrip: deterministic deal, partitioned layout,
manifest consistency, pruning-friendly single-shard reads."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.shards import N_SHARDS, shard_of
from bigdatamlteamrepo_spark.sources.shard_writer import (
    read_training_shard,
    write_training_shards,
)
from tests.conftest import SF_DIR


def test_shard_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    n_docs = docs.count()

    manifest = write_training_shards(docs, out).collect()

    assert sum(r.n_docs for r in manifest) == n_docs
    assert {r.shard for r in manifest} <= set(range(N_SHARDS))

    # layout: one directory per non-empty shard
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == len(manifest)

    back = spark.read.parquet(out)
    assert back.count() == n_docs
    # every row landed in the shard the portable hash assigns
    mism = back.withColumn("expect", shard_of(F.col("doc_id"))).filter(
        F.col("shard") != F.col("expect")
    )
    assert mism.count() == 0


def test_single_shard_read_matches_assignment(spark, tmp_path):
    out = str(tmp_path / "shards")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    write_training_shards(docs, out)

    one = read_training_shard(spark, out, shard=0)
    got = {r.doc_id for r in one.collect()}
    want = {
        r.doc_id
        for r in docs.withColumn("s", shard_of(F.col("doc_id")))
        .filter(F.col("s") == 0)
        .collect()
    }
    assert got == want and got

    # the scan only reads the shard=0 directory (partition pruning)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "shard=0" in plan or one.inputFiles()
    for f in one.inputFiles():
        assert "shard=0" in f


def test_rewrite_is_deterministic(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = {r.shard: r.id_checksum for r in write_training_shards(docs, a).collect()}
    mb = {r.shard: r.id_checksum for r in write_training_shards(docs, b).collect()}
    assert ma == mb
