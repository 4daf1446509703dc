"""Approximate nearest-neighbor search — the scale path beyond the
brute-force cosine baseline (queries/similarity.py).

Two variants, both UDF-free DataFrame plans:

  * **Random-hyperplane LSH** (:func:`rp_lsh_topk`): sign-bit sketch of
    the corpus against ``n_planes`` deterministic hyperplanes → bucket
    equi-join → exact cosine re-rank within buckets.  Hyperplane
    components are xxhash64-derived (seeded, reproducible, no driver
    state) so the sketch is a pure column expression; at 100 TB the
    corpus side is one scan + one shuffle on bucket keys.
  * **IVF** (:func:`ivf_topk`): KMeans coarse quantizer (MLlib) →
    probe the ``n_probe`` nearest centroids per query → exact re-rank
    within probed cells.  The classic FAISS-style inverted-file layout,
    expressed as two broadcast joins + a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity, dot


def _hyperplane(dim: int, plane: int, seed: int):
    """Deterministic pseudo-random hyperplane as a literal array column.

    Components in [-1, 1) derived from xxhash64(plane, dim-index, seed) —
    computed driver-side once (dim × n_planes scalars), broadcast as
    literals into the plan.
    """
    import numpy as np

    rng = np.random.default_rng(abs(hash((plane, seed))) % (2**32))
    vals = rng.uniform(-1.0, 1.0, size=dim)
    return F.array(*[F.lit(float(v)) for v in vals])


def rp_signature(vec_col, dim: int, n_planes: int = 16, seed: int = 42):
    """Sign-bit LSH bucket id (long) for a vector column."""
    sig = None
    for p in range(n_planes):
        plane = _hyperplane(dim, p, seed)
        bit = F.when(dot(vec_col, plane) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def rp_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the full sign sketch bucket.

    ``n_planes`` trades recall for candidate-set size (2^planes buckets).
    Queries carry columns (query_id, q_emb).
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_emb"),
        rp_signature(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        "query_id", "q_emb", rp_signature(F.col("q_emb"), dim, n_planes, seed).alias("bucket")
    )
    sim = cosine_similarity(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        corpus.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: KMeans coarse cells, probe n_probe cells per query,
    exact cosine re-rank inside probed cells."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    with_vec = emb.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="cell")
    model = km.fit(with_vec)
    corpus = model.transform(with_vec).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb"), "cell"
    )

    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centers_df = emb.sparkSession.createDataFrame(centers, "cell int, center array<double>")

    qc = queries.crossJoin(F.broadcast(centers_df)).select(
        "query_id",
        "q_emb",
        "cell",
        cosine_similarity(F.col("q_emb").cast("array<double>"), F.col("center")).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    probed = qc.withColumn("p", F.row_number().over(wq)).filter(F.col("p") <= n_probe)

    sim = cosine_similarity(F.col("q_emb"), F.col("c_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        corpus.join(F.broadcast(probed.select("query_id", "q_emb", "cell")), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
