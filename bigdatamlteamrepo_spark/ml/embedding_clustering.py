"""Embedding-space clustering: spherical KMeans (cosine geometry).

KMeans on L2-normalized vectors with euclidean distance is equivalent
to clustering by cosine similarity (‖a−b‖² = 2−2·cos for unit vectors)
— the standard trick that reuses MLlib's scalable k-means|| for cosine
workloads (IVF coarse quantizers, topic-ish embedding bucketing).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.vectors import l2_norm


def normalize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append a unit-L2 ``unit_vec`` column (rows with zero norm dropped)."""
    norm = l2_norm(F.col(vec_col))
    return (
        df.withColumn("__norm", norm)
        .filter(F.col("__norm") > 0)
        .withColumn(
            "unit_vec",
            F.transform(F.col(vec_col).cast("array<double>"), lambda x: x / F.col("__norm")),
        )
        .drop("__norm")
    )


def spherical_kmeans(
    df: DataFrame,
    k: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster embeddings by cosine via normalized KMeans; returns the
    input rows + ``cluster``."""
    data = normalize_embeddings(df, vec_col).withColumn(
        "__v", array_to_vector("unit_vec")
    )
    km = KMeans(k=k, seed=seed, featuresCol="__v", predictionCol="cluster")
    model = km.fit(data)
    return model.transform(data).drop("__v", "unit_vec")
