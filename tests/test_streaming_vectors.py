"""Streaming IVF-PQ index maintenance (streaming/vectors.py): frozen-
quantizer appends must equal the batch append, replays must land
exactly once, compaction must be read-invariant, and the persisted-
index query path must see increments."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators.pq import (
    build_ivfpq_index,
    ivfpq_index_topk,
    read_index_part,
)
from bigdatamlteamrepo_spark.streaming.vectors import (
    append_vectors_batch,
    assign_cells,
    compact_vector_index,
    incremental_vector_index_stream,
)

_VEC_SCHEMA = "vec_id bigint, embedding array<float>"
_SPLIT = 60  # base corpus: vec_id < _SPLIT; the rest arrives streaming


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


@pytest.fixture()
def seeded_index(spark, emb, tmp_path):
    idx = str(tmp_path / "vidx")
    build_ivfpq_index(
        emb.filter(F.col("vec_id") < _SPLIT), idx, n_cells=4, kmeans_codebooks=False
    )
    return idx


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_equals_batch_append(spark, emb, seeded_index, tmp_path):
    new = emb.filter(F.col("vec_id") >= _SPLIT)
    mid = _SPLIT + (emb.count() - _SPLIT) // 2
    src = str(tmp_path / "src")
    os.makedirs(src)
    new.filter(F.col("vec_id") < mid).coalesce(1).write.mode("append").parquet(src)
    new.filter(F.col("vec_id") >= mid).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(_VEC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = incremental_vector_index_stream(
        stream, seeded_index, str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    assert n_batches >= 2

    # every corpus vector is now in the index, exactly once
    vecs = read_index_part(spark, seeded_index, "vectors")
    assert _rows(vecs, ["vec_id"]) == _rows(emb, ["vec_id"])
    # streamed cells match the frozen-quantizer assignment rule
    centroids = spark.read.parquet(seeded_index + "/centroids")
    want = {
        r.vec_id: r.cell for r in assign_cells(new, centroids).collect()
    }
    got = {
        r.vec_id: r.cell
        for r in vecs.filter(F.col("vec_id") >= _SPLIT).collect()
    }
    assert got == want
    # codes table is complete and m rows per vector
    codes = read_index_part(spark, seeded_index, "codes")
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == emb.count()
    assert {r["count"] for r in per_vec} == {4}


def test_replayed_batch_lands_exactly_once(spark, emb, seeded_index):
    new = emb.filter(F.col("vec_id") >= _SPLIT).limit(20)
    append_vectors_batch(new, seeded_index, batch_id=0, namespace="ns1")
    once = _rows(
        read_index_part(spark, seeded_index, "vectors"), ["vec_id", "cell"]
    )
    # at-least-once replay: same (namespace, batch_id) overwrites
    append_vectors_batch(new, seeded_index, batch_id=0, namespace="ns1")
    again = _rows(
        read_index_part(spark, seeded_index, "vectors"), ["vec_id", "cell"]
    )
    assert again == once


def test_compaction_read_invariant_and_partitioned(spark, emb, seeded_index, tmp_path):
    new = emb.filter(F.col("vec_id") >= _SPLIT)
    append_vectors_batch(new, seeded_index, batch_id=0, namespace="live")
    before_v = _rows(
        read_index_part(spark, seeded_index, "vectors"), ["vec_id", "cell"]
    )
    before_c = _rows(
        read_index_part(spark, seeded_index, "codes"),
        ["vec_id", "s", "code", "cell"],
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    topk_before = _rows(
        ivfpq_index_topk(spark, seeded_index, q, k=5, exclude_self=True),
        ["query_id", "neighbor_id", "rank"],
    )

    counts = compact_vector_index(spark, seeded_index, keep_last=0)
    assert counts == {"codes": 1, "vectors": 1}
    # increments folded away, base re-partitioned by cell
    assert not os.listdir(os.path.join(seeded_index, "vectors_inc"))
    assert any(
        d.startswith("cell=")
        for d in os.listdir(os.path.join(seeded_index, "vectors"))
    )
    assert (
        _rows(read_index_part(spark, seeded_index, "vectors"), ["vec_id", "cell"])
        == before_v
    )
    assert (
        _rows(
            read_index_part(spark, seeded_index, "codes"),
            ["vec_id", "s", "code", "cell"],
        )
        == before_c
    )
    assert (
        _rows(
            ivfpq_index_topk(spark, seeded_index, q, k=5, exclude_self=True),
            ["query_id", "neighbor_id", "rank"],
        )
        == topk_before
    )


def test_query_path_finds_streamed_neighbors(spark, emb, seeded_index):
    """A streamed vector identical to a query must surface at rank 1 —
    the freshness contract: search sees new vectors without a rebuild."""
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.lit(10_000).cast("long").alias("vec_id"), "embedding"
    )
    append_vectors_batch(probe, seeded_index, batch_id=7, namespace="fresh")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    top = ivfpq_index_topk(
        spark, seeded_index, q, k=3, exclude_self=True
    ).collect()
    best = min(top, key=lambda r: r.rank)
    assert best.neighbor_id == 10_000
    assert best.cosine_sim == pytest.approx(1.0, abs=1e-6)


def test_cell_occupancy_monitor(spark, emb, seeded_index):
    """The drift monitor's operational face: base vs streamed per-cell
    counts reconcile with the index contents before and after
    compaction."""
    from bigdatamlteamrepo_spark.streaming.vectors import cell_occupancy

    new = emb.filter(F.col("vec_id") >= _SPLIT)
    append_vectors_batch(new, seeded_index, batch_id=0, namespace="mon")
    occ = {r.cell: (r.n_base, r.n_streamed) for r in cell_occupancy(
        spark, seeded_index
    ).collect()}
    assert sum(b for b, _ in occ.values()) == _SPLIT
    assert sum(s for _, s in occ.values()) == emb.count() - _SPLIT
    # after compaction everything is base
    compact_vector_index(spark, seeded_index, keep_last=0)
    occ2 = {r.cell: (r.n_base, r.n_streamed) for r in cell_occupancy(
        spark, seeded_index
    ).collect()}
    assert sum(b for b, _ in occ2.values()) == emb.count()
    assert all(s == 0 for _, s in occ2.values())
    # totals per cell are conserved by compaction
    assert {c: b + s for c, (b, s) in occ.items()} == {
        c: b for c, (b, _) in occ2.items()
    }
