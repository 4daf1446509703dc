"""Restaurant clustering + recommendation (category_model.ipynb) as one
lazy DataFrame/MLlib pipeline.

Reference shape: pandas MultiLabelBinarizer (382 one-hot cols) + concat
axis=1 + dropna + index re-alignment + sklearn Scaler/PCA(0.95)/KMeans,
then an eager driver-loop recommendation query.

Spark-first re-expression (SURVEY §3.2):
  * never split the frame — no positional concat / index alignment
    (J2/J3); every stage appends columns to one DataFrame;
  * MultiLabelBinarizer → ``CountVectorizer(binary=True)`` (M6 vector
    form — the scale-safe choice: 382 columns → one sparse vector);
  * StandardScaler(withMean) → PCA with *variance-threshold* k (M8:
    Spark PCA takes fixed k only, so fit once at a cap, read
    ``explainedVariance``, slice to the smallest k reaching the
    threshold via VectorSlicer — slicing the full-k projection equals
    the k-component projection since components are orthonormal);
  * KMeans(k=7, seed) — MLlib k-means|| init differs from sklearn
    k-means++ so cluster IDs are not comparable (FIXTURES §3):
    correctness is structural;
  * the recommendation query becomes a single deterministic plan:
    agg → broadcast ranked cluster list → membership filter → window
    order → limit, instead of a driver loop accumulating pandas chunks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.feature import (
    CountVectorizer,
    CountVectorizerModel,
    PCA,
    PCAModel,
    StandardScaler,
    StandardScalerModel,
    VectorAssembler,
    VectorSlicer,
)
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NUMERIC_COLS = ["score", "ratings", "lat", "lng"]


def split_categories(df: DataFrame, trim: bool = False) -> DataFrame:
    """Split the comma-joined category string (c0:11).

    Faithful mode (default) keeps leading spaces on tokens — the
    reference splits on ',' only, so ``' Burritos'`` and ``'Burritos'``
    are distinct categories in its output.  ``trim=True`` is clean mode.
    """
    arr = F.split(F.col("category").cast("string"), ",")
    if trim:
        # NB: not `F.transform(arr, F.trim)` — transform passes (x, i) to
        # two-arg callables and F.trim(col, trimStr) accepts two.
        arr = F.transform(arr, lambda x: F.trim(x))
    return df.withColumn("category_array", F.array_distinct(arr))


@dataclass
class RestaurantClusterModel:
    """Fitted stages + derived summary tables."""

    cv_model: CountVectorizerModel
    scaler_model: StandardScalerModel
    pca_model: PCAModel
    pca_k: int
    kmeans_model: KMeansModel
    assembler: VectorAssembler
    slicer: VectorSlicer
    clustered: DataFrame           # input rows + 'cluster'
    cluster_summary: DataFrame     # (cluster, category, prevalence)

    def top_categories(self, per_cluster: int = 7) -> DataFrame:
        """Top-n categories per cluster by mean prevalence (O2 window)."""
        w = Window.partitionBy("cluster").orderBy(
            F.desc("prevalence"), F.asc("category")
        )
        return (
            self.cluster_summary.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= per_cluster)
            .orderBy("cluster", "rank")
        )


def choose_pca_k(explained_variance, threshold: float) -> int:
    """Smallest k with cumulative explained variance ≥ threshold."""
    cum = 0.0
    for i, v in enumerate(explained_variance):
        cum += float(v)
        if cum >= threshold:
            return i + 1
    return len(explained_variance)


def fit_restaurant_clusters(
    df: DataFrame,
    *,
    k: int = 7,
    seed: int = 30,
    variance_threshold: float = 0.95,
    pca_cap: int = 60,
    min_category_df: float = 1.0,
) -> RestaurantClusterModel:
    """Fit the full clustering pipeline on a restaurants DataFrame
    (columns: restaurant_id, name, score, ratings, full_address, lat,
    lng, category).
    """
    data = split_categories(df).na.drop(subset=NUMERIC_COLS)

    cv = CountVectorizer(
        inputCol="category_array", outputCol="cat_vec", binary=True, minDF=min_category_df
    )
    cv_model = cv.fit(data)
    data = cv_model.transform(data)

    assembler = VectorAssembler(
        inputCols=[*NUMERIC_COLS, "cat_vec"], outputCol="raw_features"
    )
    data = assembler.transform(data)

    # sklearn StandardScaler uses population σ (ddof=0), MLlib sample σ
    # (ddof=1): a constant factor √(n/(n-1)) per column — irrelevant to
    # cluster structure, handled by test tolerances (FIXTURES §6).
    scaler = StandardScaler(
        inputCol="raw_features", outputCol="scaled", withMean=True, withStd=True
    )
    scaler_model = scaler.fit(data)
    data = scaler_model.transform(data).cache()

    n_features = len(cv_model.vocabulary) + len(NUMERIC_COLS)
    cap = min(pca_cap, n_features)
    pca = PCA(k=cap, inputCol="scaled", outputCol="pca_full")
    pca_model = pca.fit(data)
    pca_k = choose_pca_k(pca_model.explainedVariance, variance_threshold)
    slicer = VectorSlicer(
        inputCol="pca_full", outputCol="features", indices=list(range(pca_k))
    )
    data = slicer.transform(pca_model.transform(data))

    km = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cluster")
    kmeans_model = km.fit(data)
    clustered = kmeans_model.transform(data).drop(
        "raw_features", "scaled", "pca_full", "features"
    ).cache()

    sizes = clustered.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_rows"))
    summary = (
        clustered.select("cluster", F.explode("category_array").alias("category"))
        .groupBy("cluster", "category")
        .agg(F.count(F.lit(1)).alias("n_with"))
        .join(F.broadcast(sizes), "cluster")
        .select(
            "cluster",
            "category",
            (F.col("n_with").cast("double") / F.col("n_rows")).alias("prevalence"),
        )
        .cache()
    )
    return RestaurantClusterModel(
        cv_model, scaler_model, pca_model, pca_k, kmeans_model,
        assembler, slicer, clustered, summary,
    )


def recommend_restaurants(
    model: RestaurantClusterModel, input_categories: list[str], n: int = 5
) -> DataFrame:
    """The reference's recommendation query (c1) as one plan.

    Case-insensitive category matching against known categories; unknown
    inputs are ignored (empty result if none match).  Clusters are
    ranked by Σ mean-prevalence of the requested categories; rows come
    from clusters in rank order, restricted to rows containing ≥1
    requested category, deterministic within-cluster order by
    restaurant_id (clean-mode fix of the reference's file-order).
    """
    known = {c.lower(): c for c in model.cv_model.vocabulary}
    valid = [known[c.lower()] for c in input_categories if c.lower() in known]
    clustered = model.clustered
    if not valid:
        return clustered.filter(F.lit(False)).select(
            "restaurant_id", "name", "score", "ratings", "cluster"
        ).withColumn("cluster_rank", F.lit(0))

    scores = (
        model.cluster_summary.filter(F.col("category").isin(valid))
        .groupBy("cluster")
        .agg(F.sum("prevalence").alias("cluster_score"))
    )
    rank_w = Window.orderBy(F.desc("cluster_score"), F.asc("cluster"))
    ranked = scores.withColumn("cluster_rank", F.row_number().over(rank_w))

    valid_arr = F.array(*[F.lit(v) for v in valid])
    return (
        clustered.filter(F.arrays_overlap("category_array", valid_arr))
        .join(F.broadcast(ranked), "cluster")
        .orderBy("cluster_rank", "restaurant_id")
        .select(
            "restaurant_id", "name", "score", "ratings", "cluster", "cluster_rank"
        )
        .limit(n)
    )
