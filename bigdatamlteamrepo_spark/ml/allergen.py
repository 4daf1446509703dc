"""Allergen-detection pipelines (the reference's flagship ML workload,
MLP.ipynb) re-expressed as MLlib pipelines.

Coverage of SURVEY.md §2.8:
  M1/M2   HashingTF + IDF featurization over ingredient *phrases*
  M3/M4   StopWordsRemover + NGram(2) bigram variant (phrase-level
          semantics quirk preserved: a phrase is removed only if the
          whole phrase equals a stopword)
  M5      StringIndexer / IndexToString label round-trip
  M10-12  RandomForest / LogisticRegression(weightCol) / MLP estimators
  M17     Pipeline composition (incl. pre-fitted stages)
  M18/M21 hand-built ParamMap CrossValidator + per-allergen loop
  M19/20  Binary + Multiclass evaluators
  A6/A8   confusion matrix as pivot; classification report as pure agg

Engine fixes over the reference (clean mode, SURVEY §7): featurized
training data is cached before ``fit`` (the reference recomputes the
labeling subtree ≥6×, §3.1), every random op is seeded, and the
class-weight column comes from a broadcast join, not a Python UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    LogisticRegression,
    MultilayerPerceptronClassifier,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import IDF, HashingTF, IndexToString, NGram, StopWordsRemover, StringIndexer
from pyspark.ml.tuning import CrossValidator
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.arrays import (
    first_match_category,
    has_any_keyword,
    has_any_keyword_substr,
    lower_array,
    multi_hot_columns,
)
from bigdatamlteamrepo_spark.ml.recipes import ALLERGEN_CATEGORIES, ALLERGENS
from bigdatamlteamrepo_spark.operators.sampling import class_weights, undersample_to_balance

# ---------------------------------------------------------------------------
# Labeling (MLP.ipynb:c0:23-29, c5:31-38, c6:29-44, c7:27-39)
# ---------------------------------------------------------------------------


def with_ingredient_array(df: DataFrame, col: str = "ingredients") -> DataFrame:
    """Normalize: lowercase every ingredient phrase (c0:23)."""
    return df.withColumn("ingredient_array", lower_array(col))


def with_binary_label(df: DataFrame, mode: str = "phrase") -> DataFrame:
    """``Has_Allergen`` 0/1 from the 26-term list (c0:26-29).

    ``mode='phrase'`` is the reference's exact-phrase membership;
    ``mode='substr'`` labels by substring containment — the semantics of
    free-form corpora where allergens appear inside longer phrases
    (used with the substring metric fixture)."""
    labeler = has_any_keyword if mode == "phrase" else has_any_keyword_substr
    return df.withColumn(
        "Has_Allergen", labeler(F.col("ingredient_array"), ALLERGENS)
    )


def with_category_label(df: DataFrame, categories=None, out: str = "AllergenCategory") -> DataFrame:
    """First-match-wins category (c6 UDF semantics, pure-column form)."""
    cats = categories or ALLERGEN_CATEGORIES
    return df.withColumn(out, first_match_category(F.col("ingredient_array"), cats))


def with_multihot_labels(df: DataFrame) -> DataFrame:
    """Per-allergen ``is_{cat}`` 0/1 columns (c7:27-39)."""
    cols = multi_hot_columns(F.col("ingredient_array"), ALLERGEN_CATEGORIES)
    return df.withColumns(cols)


# ---------------------------------------------------------------------------
# Featurization + estimators
# ---------------------------------------------------------------------------


def tfidf_stages(
    input_col: str = "ingredient_array",
    num_features: int = 5000,
    min_doc_freq: int = 0,
) -> list:
    """HashingTF + IDF over whole ingredient phrases (c0:48-52)."""
    tf = HashingTF(inputCol=input_col, outputCol="rawFeatures", numFeatures=num_features)
    idf = IDF(inputCol="rawFeatures", outputCol="features", minDocFreq=min_doc_freq)
    return [tf, idf]


def binary_estimator(
    kind: str,
    num_features: int = 5000,
    seed: int = 42,
    weight_col: str | None = None,
    max_iter: int = 100,
):
    """The reference's three binary classifiers (c0:61, c1:54, c2:41)."""
    if kind == "rf":
        return RandomForestClassifier(
            labelCol="label", featuresCol="features", numTrees=100, seed=seed
        )
    if kind == "lr":
        return LogisticRegression(
            labelCol="label",
            featuresCol="features",
            maxIter=max_iter,
            **({"weightCol": weight_col} if weight_col else {}),
        )
    if kind == "mlp":
        return MultilayerPerceptronClassifier(
            labelCol="label",
            featuresCol="features",
            layers=[num_features, 64, 32, 2],
            maxIter=max_iter,
            blockSize=128,
            seed=seed,
        )
    raise ValueError(f"unknown estimator kind {kind!r}")


def _undersample_to_balance_hash(
    data: DataFrame, label: str, id_col: str, seed: int
) -> DataFrame:
    """Partition-invariant undersample: rank rows within each class by a
    content hash and keep ``minority_count`` per class — same semantics
    as ``orderBy(rand).limit`` rebalancing, but the kept set depends
    only on row CONTENT, never on partitioning."""
    from pyspark.sql import Window

    counts = data.groupBy(label).agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n")).first()[0]
    w = Window.partitionBy(label).orderBy(
        F.xxhash64(id_col, F.lit("us"), F.lit(seed)), F.col(id_col)
    )
    return (
        data.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= min_n)
        .drop("__rk")
    )


@dataclass
class BinaryResult:
    model: PipelineModel
    predictions: DataFrame
    metrics: dict[str, float] = field(default_factory=dict)


def fit_binary(
    df: DataFrame,
    kind: str = "mlp",
    *,
    num_features: int = 5000,
    balance: str | None = None,  # None | 'undersample' | 'weight'
    split=(0.8, 0.2),
    seed: int = 42,
    max_iter: int = 100,
    label_mode: str = "phrase",
    deterministic_split: bool = False,
    id_col: str = "doc_id",
) -> BinaryResult:
    """End-to-end binary pipeline: label → (re)balance → TF-IDF → fit →
    evaluate (AUC/accuracy/F1).  Mirrors MLP.ipynb cells 0-2.

    ``deterministic_split=True`` replaces the reference's
    partitioning-dependent ``randomSplit`` / ``orderBy(rand)``
    undersampling with content-hash equivalents keyed on ``id_col``
    (xxhash64 split decision, hash-ranked undersample, fixed 32-way
    hash repartition before fit) so the measured metrics are invariant
    to ``spark.sql.shuffle.partitions`` and input layout — the property
    the metric-reproduction suite (MLMETRICS.md) depends on.  Default
    ``False`` keeps the reference's R2/R4 semantics.
    """
    data = with_binary_label(with_ingredient_array(df), label_mode).withColumn(
        "label", F.col("Has_Allergen").cast("double")
    )
    weight_col = None
    if balance == "undersample":
        if deterministic_split:
            data = _undersample_to_balance_hash(data, "label", id_col, seed)
        else:
            data = undersample_to_balance(data, "label", seed=seed)
    elif balance == "weight":
        data = class_weights(data, "label")
        weight_col = "classWeightCol"

    if deterministic_split:
        u = (
            F.pmod(F.xxhash64(id_col, F.lit("split"), F.lit(seed)), F.lit(10000))
            / 10000.0
        )
        frac = split[0] / (split[0] + split[1])
        train = (
            data.filter(u < frac)
            .repartition(32, id_col)
            .sortWithinPartitions(id_col)
        )
        test = data.filter(u >= frac)
    else:
        train, test = data.randomSplit(list(split), seed=seed)
    train = train.cache()  # fix for the reference's repeated recompute (§3.1)
    est = binary_estimator(kind, num_features, seed, weight_col, max_iter)
    pipe = Pipeline(stages=[*tfidf_stages(num_features=num_features), est])
    model = pipe.fit(train)
    preds = model.transform(test).cache()

    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(preds)
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(preds)
    f1 = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    ).evaluate(preds)
    train.unpersist()
    return BinaryResult(model, preds, {"auc": auc, "accuracy": acc, "f1": f1})


# ---------------------------------------------------------------------------
# Multiclass variants (c5: bigram 5-class incl. none; c6: 6-class, none
# filtered out)
# ---------------------------------------------------------------------------


def fit_multiclass_bigram(
    df: DataFrame,
    *,
    num_features: int = 5000,
    layers_hidden=(128, 64),
    max_iter: int = 50,
    seed: int = 42,
    split=(0.8, 0.2),
    split_seed: int | None = None,
    categories=None,
    faithful_leaky_indexer: bool = False,
) -> BinaryResult:
    """StopWords → NGram(2) → TF-IDF → MLP over bigram-of-phrase tokens
    (MLP.ipynb:c5).  The NGram operates on adjacent ingredient *phrases*
    — the reference's order-of-listing quirk, preserved.

    ``faithful_leaky_indexer=True`` reproduces the reference's label
    leak (StringIndexer fitted on the FULL frame, c5:58); default clean
    mode fits it on train only (SURVEY §7 fidelity-mode policy).

    ``split_seed``: the reference uses DIFFERENT seeds for the split
    and the MLP in c5 (``randomSplit(..., seed=100)`` at c5:67 vs MLP
    ``seed=42`` at c5:52) — pass 100 to reproduce that exact config;
    default None reuses ``seed`` for both.
    """
    from bigdatamlteamrepo_spark.ml.recipes import BIGRAM_CATEGORIES

    cats = categories or BIGRAM_CATEGORIES
    data = with_category_label(with_ingredient_array(df), cats, out="category")
    n_classes = len(cats) + 1  # + 'none'

    remover = StopWordsRemover(inputCol="ingredient_array", outputCol="filtered")
    ngram = NGram(n=2, inputCol="filtered", outputCol="bigrams")
    tf = HashingTF(inputCol="bigrams", outputCol="rawFeatures", numFeatures=num_features)
    idf = IDF(inputCol="rawFeatures", outputCol="features")
    indexer = StringIndexer(inputCol="category", outputCol="label")
    if faithful_leaky_indexer:
        indexer = indexer.fit(data)  # pre-fitted on the full frame (c5:58)
    mlp = MultilayerPerceptronClassifier(
        labelCol="label",
        featuresCol="features",
        layers=[num_features, *layers_hidden, n_classes],
        maxIter=max_iter,
        blockSize=128,
        seed=seed,
    )
    train, test = data.randomSplit(list(split), seed=split_seed if split_seed is not None else seed)
    train = train.cache()
    model = Pipeline(stages=[remover, ngram, tf, idf, indexer, mlp]).fit(train)
    preds = model.transform(test).cache()
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(preds)
    f1 = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    ).evaluate(preds)
    train.unpersist()
    return BinaryResult(model, preds, {"accuracy": acc, "f1": f1})


def fit_multiclass_six(
    df: DataFrame,
    *,
    num_features: int = 5000,
    max_iter: int = 100,
    seed: int = 42,
    split=(0.8, 0.2),
) -> BinaryResult:
    """6-allergen-class MLP with 'none' rows filtered out (MLP.ipynb:c6).

    Reproduces the reference's structure: StringIndexer fitted on the
    *train* split, then passed as a pre-fitted stage inside the Pipeline
    (M17 fitted-stage mixing, c6:70).
    """
    data = with_category_label(with_ingredient_array(df)).filter(
        F.col("AllergenCategory") != "none"
    )
    train, test = data.randomSplit(list(split), seed=seed)
    train = train.cache()
    indexer_model = StringIndexer(
        inputCol="AllergenCategory", outputCol="label"
    ).fit(train)
    n_classes = len(indexer_model.labels)
    tf = HashingTF(
        inputCol="ingredient_array", outputCol="rawFeatures", numFeatures=num_features
    )
    idf = IDF(inputCol="rawFeatures", outputCol="features")
    mlp = MultilayerPerceptronClassifier(
        labelCol="label",
        featuresCol="features",
        layers=[num_features, 64, 32, n_classes],
        maxIter=max_iter,
        blockSize=128,
        seed=seed,
    )
    back = IndexToString(
        inputCol="prediction", outputCol="predictedCategory", labels=indexer_model.labels
    )
    model = Pipeline(stages=[indexer_model, tf, idf, mlp, back]).fit(train)
    preds = model.transform(test).cache()
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(preds)
    f1 = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    ).evaluate(preds)
    train.unpersist()
    return BinaryResult(model, preds, {"accuracy": acc, "f1": f1})


# ---------------------------------------------------------------------------
# Per-allergen CV loop (MLP.ipynb:c7) — hand-built param maps because
# numFeatures must equal layers[0] (constraint-coupled grid, M18).
# ---------------------------------------------------------------------------


#: hidden-layer options per numFeatures — the reference couples ONE
#: option to 2000 and TWO to 5000 (SURVEY M18: "12 maps: numF∈{2000
#: (1 layer-opt), 5000 (2 opts)} × minDf∈{0,2} × maxIter∈{50,100}"),
#: giving (1+2)·2·2 = 12 maps → ×3 folds ×6 labels = 216 fits
DEFAULT_HIDDEN_OPTIONS = {2000: [(64, 32)], 5000: [(64, 32), (128, 64)]}


def build_param_maps(tf: HashingTF, idf: IDF, mlp: MultilayerPerceptronClassifier,
                     num_features=(2000, 5000), min_doc_freq=(0, 2), max_iter=(50, 100),
                     hidden_options=None):
    """Raw list-of-dict ParamMaps with the numFeatures↔layers coupling."""
    maps = []
    for nf in num_features:
        opts = (
            hidden_options if hidden_options is not None else DEFAULT_HIDDEN_OPTIONS
        ).get(nf, [(64, 32)])
        for hidden in opts:
            for mdf in min_doc_freq:
                for mi in max_iter:
                    maps.append(
                        {
                            tf.numFeatures: nf,
                            idf.minDocFreq: mdf,
                            mlp.maxIter: mi,
                            mlp.layers: [nf, *hidden, 2],
                        }
                    )
    return maps


def per_allergen_cv(
    df: DataFrame,
    allergens: list[str] | None = None,
    *,
    num_features=(2000, 5000),
    min_doc_freq=(0, 2),
    max_iter=(50, 100),
    num_folds: int = 3,
    parallelism: int = 4,
    seed: int = 42,
    split=(0.8, 0.2),
) -> dict[str, dict[str, float]]:
    """One-vs-rest CV per allergen category (c7:82-99): for each label,
    CrossValidator over the coupled grid, report AUC + accuracy.

    Engine improvement: ``parallelism`` fits param maps concurrently
    (the reference runs 216 fits serially).
    """
    labels = allergens or list(ALLERGEN_CATEGORIES)
    data = with_multihot_labels(with_ingredient_array(df)).cache()
    results: dict[str, dict[str, float]] = {}
    for cat in labels:
        labeled = data.withColumn("label", F.col(f"is_{cat}").cast("double"))
        train, test = labeled.randomSplit(list(split), seed=seed)
        tf = HashingTF(inputCol="ingredient_array", outputCol="rawFeatures")
        idf = IDF(inputCol="rawFeatures", outputCol="features")
        mlp = MultilayerPerceptronClassifier(
            labelCol="label", featuresCol="features", blockSize=128, seed=seed
        )
        pipe = Pipeline(stages=[tf, idf, mlp])
        evaluator = BinaryClassificationEvaluator(
            labelCol="label", metricName="areaUnderROC"
        )
        cv = CrossValidator(
            estimator=pipe,
            estimatorParamMaps=build_param_maps(
                tf, idf, mlp, num_features, min_doc_freq, max_iter
            ),
            evaluator=evaluator,
            numFolds=num_folds,
            parallelism=parallelism,
            seed=seed,
        )
        model = cv.fit(train)
        preds = model.transform(test)
        results[cat] = {
            "auc": evaluator.evaluate(preds),
            "accuracy": MulticlassClassificationEvaluator(
                labelCol="label", predictionCol="prediction", metricName="accuracy"
            ).evaluate(preds),
        }
    data.unpersist()
    return results


# ---------------------------------------------------------------------------
# Reporting (A6 crosstab-as-pivot, A8 classification-report-as-agg)
# ---------------------------------------------------------------------------


def confusion_matrix(preds: DataFrame, classes: list[float] | None = None) -> DataFrame:
    """pd.crosstab analogue with forced value set + sorted axes (c0:74-82)."""
    values = classes or [0.0, 1.0]
    return (
        preds.groupBy("label")
        .pivot("prediction", values)
        .count()
        .na.fill(0)
        .orderBy("label")
    )


def classification_report(preds: DataFrame) -> DataFrame:
    """Per-class precision/recall/F1/support as one aggregation pass
    (sklearn.classification_report analogue, SQL-expressible)."""
    cell = preds.groupBy("label", "prediction").agg(F.count(F.lit(1)).alias("n"))
    per_label = cell.groupBy("label").agg(
        F.sum("n").alias("support"),
        F.sum(F.when(F.col("prediction") == F.col("label"), F.col("n")).otherwise(0)).alias("tp"),
    )
    per_pred = cell.groupBy("prediction").agg(F.sum("n").alias("predicted_n"))
    joined = per_label.join(
        per_pred, per_label.label == per_pred.prediction, "left"
    ).select(
        "label",
        "support",
        (F.col("tp") / F.col("predicted_n")).alias("precision"),
        (F.col("tp") / F.col("support")).alias("recall"),
    )
    return joined.withColumn(
        "f1",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    ).orderBy("label")
