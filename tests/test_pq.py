"""Product quantization (operators/pq.py): encoding invariants,
compression contract, and ADC ranking sanity."""

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.operators.pq import (
    PQ_K,
    PQ_M,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_encode_shape_and_range(spark, emb):
    codes = pq_encode(emb, pq_codebooks(emb))
    n_vec = emb.count()
    # exactly m codes per vector, every code a valid centroid id
    assert codes.count() == n_vec * PQ_M
    bad = codes.filter((F.col("code") < 0) | (F.col("code") >= PQ_K)).count()
    assert bad == 0
    per_vec = codes.groupBy("vec_id").count().filter(F.col("count") != PQ_M).count()
    assert per_vec == 0


def test_anchor_vectors_encode_to_themselves(spark, emb):
    # a codebook anchor's nearest centroid in every subspace is itself
    # (distance 0; tie-break by centroid id cannot displace an exact hit
    # unless two anchors share a subvector — not the case here)
    codes = pq_encode(emb.filter(F.col("vec_id") < PQ_K), pq_codebooks(emb))
    mismatched = codes.filter(F.col("code") != F.col("vec_id")).count()
    assert mismatched == 0


def test_adc_topk_contract(spark, emb):
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = pq_adc_topk(emb, qs, k=5, exclude_self=True).toPandas()
    assert len(out) == 15
    assert set(out.columns) == {
        "query_id",
        "neighbor_id",
        "adc_score",
        "cosine_sim",
        "rank",
    }
    for qid, grp in out.groupby("query_id"):
        assert sorted(grp["rank"]) == [1, 2, 3, 4, 5]
        # ranks follow adc_score descending
        ordered = grp.sort_values("rank")["adc_score"].tolist()
        assert ordered == sorted(ordered, reverse=True)
        assert (grp["neighbor_id"] != qid).all()


def test_adc_recall_vs_exact(spark, emb):
    """ADC is approximate, but on the driver corpus the code-ranked
    top-10 must overlap the exact cosine top-10 well above chance."""
    from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity

    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    approx = pq_adc_topk(emb, qs, k=10, exclude_self=True).toPandas()
    exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("cos"),
        )
        .toPandas()
    )
    total_hits = 0
    for qid, grp in approx.groupby("query_id"):
        truth = set(
            exact[exact.query_id == qid]
            .sort_values(["cos", "vec_id"], ascending=[False, True])
            .head(10)["vec_id"]
        )
        total_hits += len(set(grp["neighbor_id"]) & truth)
    # random 10-of-499 overlap ≈ 0.2 hits/query; require far above that
    assert total_hits >= 9, f"ADC recall too low: {total_hits}/30"


def test_adc_retrieve_then_rerank_on_clustered_data(spark):
    """On clustered vectors PQ codes preserve COARSE neighborhoods:
    every ADC-returned neighbor comes from the query's cluster, and the
    standard retrieve-R-then-exact-rerank composition (take the ADC
    top-R's cosine_sim, keep the best 10) recovers the true top-10.
    Within a tight cluster all members quantize to the same codes, so
    the raw ADC ORDER inside a cluster is id-tie-break — which is why
    re-rank is part of the operator's contract, not an optimization."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(6, 32)) * 3
    rows = []
    for i in range(300):
        v = centers[i % 6] + rng.normal(scale=0.15, size=32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    qs = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity

    # ADC shortlist of 50 per query, re-ranked by the exact cosine the
    # operator already fetches for its survivors
    shortlist = pq_adc_topk(emb, qs, k=50, m=4, sub=8, exclude_self=True).toPandas()
    # coarse-neighborhood property: shortlist stays inside the cluster
    same_cluster = (shortlist["neighbor_id"] % 6) == (shortlist["query_id"] % 6)
    assert same_cluster.mean() >= 0.95, same_cluster.mean()

    exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("cos"),
        )
        .toPandas()
    )
    hits = 0
    for qid, grp in shortlist.groupby("query_id"):
        reranked = set(
            grp.sort_values(["cosine_sim", "neighbor_id"], ascending=[False, True])
            .head(10)["neighbor_id"]
        )
        truth = set(
            exact[exact.query_id == qid]
            .sort_values(["cos", "vec_id"], ascending=[False, True])
            .head(10)["vec_id"]
        )
        hits += len(reranked & truth)
    assert hits / 60 >= 0.9, f"retrieve+rerank recall {hits}/60"


def test_ivfpq_clustered_recall_and_pruning(spark):
    """IVF→PQ→re-rank on clustered vectors: with one data-derived
    anchor per cluster and n_probe=1, a query touches only its own
    cell, and the re-ranked top-10 matches the exact top-10 (all true
    neighbors are intra-cluster by construction)."""
    import numpy as np

    from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity
    from bigdatamlteamrepo_spark.operators.pq import ivfpq_topk

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 32)) * 3
    rows = []
    for i in range(300):
        v = centers[i % 6] + rng.normal(scale=0.15, size=32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    qs = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = ivfpq_topk(
        emb, qs, k=10, n_anchors=6, n_probe=1, rerank=49, m=4, sub=8,
        exclude_self=True,
    ).toPandas()
    # pruning: neighbors only from the query's own cluster
    assert ((out["neighbor_id"] % 6) == (out["query_id"] % 6)).all()
    exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("cos"),
        )
        .toPandas()
    )
    hits = 0
    for qid, grp in out.groupby("query_id"):
        truth = set(
            exact[exact.query_id == qid]
            .sort_values(["cos", "vec_id"], ascending=[False, True])
            .head(10)["vec_id"]
        )
        hits += len(set(grp["neighbor_id"]) & truth)
    assert hits / 60 >= 0.95, f"IVFPQ recall {hits}/60"


def test_kmeans_codebooks_quality_path(spark):
    """The sampled-KMeans codebook (quality path) must plug into the
    unchanged ADC pipeline and preserve coarse neighborhoods on
    clustered data exactly like the first-k oracle codebook does: the
    retrieve-then-exact-rerank composition recovers the true top-10."""
    import numpy as np

    from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity
    from bigdatamlteamrepo_spark.operators.pq import pq_codebooks_kmeans

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(6, 32)) * 3
    rows = []
    for i in range(300):
        v = centers[i % 6] + rng.normal(scale=0.15, size=32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    qs = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    books = pq_codebooks_kmeans(emb, k=16, m=4, sub=8)
    assert books.count() == 64  # k centroids × m subspaces
    shortlist = pq_adc_topk(
        emb, qs, k=50, m=4, sub=8, exclude_self=True, books=books
    ).toPandas()
    same_cluster = (shortlist["neighbor_id"] % 6) == (shortlist["query_id"] % 6)
    assert same_cluster.mean() >= 0.95, same_cluster.mean()
    exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("cos"),
        )
        .toPandas()
    )
    hits = 0
    for qid, grp in shortlist.groupby("query_id"):
        reranked = set(
            grp.sort_values(["cosine_sim", "neighbor_id"], ascending=[False, True])
            .head(10)["neighbor_id"]
        )
        truth = set(
            exact[exact.query_id == qid]
            .sort_values(["cos", "vec_id"], ascending=[False, True])
            .head(10)["vec_id"]
        )
        hits += len(reranked & truth)
    assert hits / 60 >= 0.9, f"kmeans-codebook retrieve+rerank recall {hits}/60"


def test_persisted_ivfpq_index_recall_and_partition_pruning(spark, tmp_path):
    """Build the on-disk IVF-PQ layout, query it, and assert BOTH the
    retrieval quality (clustered data: re-ranked top-10 == exact
    top-10) and the scale contract: the codes and vectors scans carry
    the probed cells as PARTITION filters, so un-probed cell
    directories are never read."""
    import numpy as np

    from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity
    from bigdatamlteamrepo_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    rng = np.random.default_rng(31)
    centers = rng.normal(size=(6, 32)) * 3
    rows = []
    for i in range(300):
        v = centers[i % 6] + rng.normal(scale=0.15, size=32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx, n_cells=6, m=4, sub=8)

    qs = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = ivfpq_index_topk(
        spark, idx, qs, k=10, n_probe=1, rerank=50, m=4, sub=8, exclude_self=True
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # probed cells pushed into the scans as partition filters: require
    # NON-EMPTY PartitionFilters mentioning the cell column on >=2 scans
    # (every FileSourceScanExec prints an empty 'PartitionFilters: []'
    # line, so a bare count would be vacuously true)
    pruned = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln
        and "cell" in ln.split("PartitionFilters", 1)[1]
    ]
    assert len(pruned) >= 2, plan[:800]

    got = out.toPandas()
    exact = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_similarity(F.col("embedding"), F.col("q_emb")).alias("cos"),
        )
        .toPandas()
    )
    hits = 0
    for qid, grp in got.groupby("query_id"):
        mine = set(grp.sort_values("rank").head(10)["neighbor_id"])
        truth = set(
            exact[exact.query_id == qid]
            .sort_values(["cos", "vec_id"], ascending=[False, True])
            .head(10)["vec_id"]
        )
        hits += len(mine & truth)
    assert hits / 60 >= 0.95, f"persisted IVFPQ recall {hits}/60"
