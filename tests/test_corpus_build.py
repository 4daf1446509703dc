"""End-to-end corpus build (bigdatamlteamrepo_spark/pipelines.py):
stage monotonicity, shard/report consistency, and manifest checksum
verifiability — the composed run over the same operators the registry
value-checks individually."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.pipelines import build_training_corpus
from bigdatamlteamrepo_spark.queries.shards import hash32


def test_build_training_corpus_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    res = build_training_corpus(spark, sf_dir, out, n_shards=4)
    report = res["report"].collect()
    assert report, "empty report"
    for r in report:
        # stage survivors shrink monotonically
        assert (
            r["n_input"]
            >= r["n_gopher"]
            >= r["n_exact"]
            >= r["n_neardup"]
            >= r["n_selected"]
        ), r
        assert r["n_selected"] >= 0
    # something must actually ship and something must be filtered
    total_in = sum(r["n_input"] for r in report)
    total_out = sum(r["n_selected"] for r in report)
    assert 0 < total_out < total_in

    # shards on disk: row count equals the selected frame; the manifest
    # checksum re-derives from the shard files themselves
    disk = spark.read.parquet(out)
    assert disk.count() == total_out
    man = {r["shard"]: r for r in res["manifest"].collect()}
    recomputed = (
        disk.withColumn("__h", hash32(F.col("doc_id")))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("__h") % F.lit(2**63 - 1)).alias("id_checksum"),
        )
        .collect()
    )
    assert {r["shard"] for r in recomputed} == set(man)
    for r in recomputed:
        assert r["n_docs"] == man[r["shard"]]["n_docs"]
        assert r["id_checksum"] == man[r["shard"]]["id_checksum"]

    # selected docs pass the LM gate by construction: every shipped doc
    # carries a doc_id from the original corpus (no synthesis)
    orig_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    shipped_ids = {r["doc_id"] for r in disk.select("doc_id").collect()}
    assert shipped_ids <= orig_ids
