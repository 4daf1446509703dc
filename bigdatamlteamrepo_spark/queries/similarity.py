"""Similarity search over the ``embeddings`` corpus (array<float>).

Brute-force cosine top-k is the exactness baseline: broadcast the
(small) query set against the corpus, compute cosine as a sequential
expression fold (functions/vectors.py — no UDF), rank per query with a
window.  At 100 TB the corpus side stays partitioned and the query side
is broadcast, so the scan is embarrassingly parallel; the top-k window
shuffles only (query_id, candidate) pairs that survive, and an IVF/LSH
bucketed variant (operators/similarity.py) bounds the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.numeric import dsum
from bigdatamlteamrepo_spark.functions.vectors import (
    cosine_similarity,
    dot_expr,
    l2_norm,
    norm_expr,
)
from bigdatamlteamrepo_spark.queries.registry import query

_N_QUERIES = 5
_TOP_K = 10

_COS_SQL = (
    f"({dot_expr('q.embedding', 'c.embedding')} / "
    f"({norm_expr('q.embedding')} * {norm_expr('c.embedding')}))"
)


@query(
    "knn_cosine_topk",
    oracle=f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL} AS cosine_sim
  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {_N_QUERIES}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
         ) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM ranked WHERE rank <= {_TOP_K}
""",
    bench=True,
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    sim = cosine_similarity(F.col("q_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
    )


@query(
    "embedding_label_stats",
    oracle=f"""
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST({norm_expr('embedding')} AS DECIMAL(30,9))) AS DOUBLE)
         / COUNT(*) AS avg_norm,
       MIN(vec_id) AS min_vec_id
FROM embeddings
GROUP BY label
""",
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norm = l2_norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (dsum(norm, 9) / F.count(F.lit(1))).alias("avg_norm"),
        F.min("vec_id").alias("min_vec_id"),
    )


@query(
    "embedding_label_centroids",
    priority=90,
    oracle="""
WITH e AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
)
SELECT label, dim,
       CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,9))) AS DOUBLE)
         / COUNT(*) AS centroid_val,
       COUNT(*) AS n_vecs
FROM e
GROUP BY label, dim
""",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).withColumnsRenamed({"pos": "dim", "col": "v"})
    return ex.groupBy("label", "dim").agg(
        (dsum("v", 9) / F.count(F.lit(1))).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
