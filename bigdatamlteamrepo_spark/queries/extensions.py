"""Extension-tier queries: SimHash dedup, embedding near-dup, ANN
(approximate similarity search).

``embedding_neardup_pairs`` is oracle-checked (exact plan).  The ANN
variants and SimHash use engine-specific hashing (xxhash64, MLlib
KMeans) with no DuckDB twin → registered without oracle; the driver
records a rows-only check and the pytest suite asserts recall against
the exact baseline on planted-cluster fixtures (test_ann_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.vectors import dot_expr, norm_expr
from bigdatamlteamrepo_spark.operators.dedup import (
    embedding_neardup_pairs as _emb_pairs,
    simhash_neardup_pairs as _simhash_pairs,
)
from bigdatamlteamrepo_spark.operators.similarity import ivf_topk, rp_lsh_topk
from bigdatamlteamrepo_spark.queries.registry import query

_NEARDUP_THRESHOLD = 0.35

_COS = (
    f"({dot_expr('a.embedding', 'b.embedding')} / "
    f"({norm_expr('a.embedding')} * {norm_expr('b.embedding')}))"
)


@query(
    "embedding_neardup_pairs",
    oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS} >= {_NEARDUP_THRESHOLD}
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb_pairs(emb, threshold=_NEARDUP_THRESHOLD)


@query("simhash_neardup_pairs")
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _simhash_pairs(docs, max_hamming=6)


def _queries_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


@query("ann_rp_lsh_topk", bench=True)
def ann_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return rp_lsh_topk(emb, _queries_set(spark, sf_dir), k=10, dim=64, n_planes=4)


@query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _queries_set(spark, sf_dir), k=10, n_cells=8, n_probe=3)
