"""ML workloads: allergen classification (the reference's flagship),
clustering + recommendation, seq2seq data pipeline, metrics-log ops,
deterministic fixtures."""

from bigdatamlteamrepo_spark.ml.allergen import (
    classification_report,
    confusion_matrix,
    fit_binary,
    fit_multiclass_bigram,
    fit_multiclass_six,
    per_allergen_cv,
    with_binary_label,
    with_category_label,
    with_ingredient_array,
    with_multihot_labels,
)
from bigdatamlteamrepo_spark.ml.clustering import (
    fit_restaurant_clusters,
    recommend_restaurants,
)
from bigdatamlteamrepo_spark.ml.recipes import generate_recipes
from bigdatamlteamrepo_spark.ml.restaurants import generate_restaurants

__all__ = [
    "classification_report",
    "confusion_matrix",
    "fit_binary",
    "fit_multiclass_bigram",
    "fit_multiclass_six",
    "per_allergen_cv",
    "with_binary_label",
    "with_category_label",
    "with_ingredient_array",
    "with_multihot_labels",
    "fit_restaurant_clusters",
    "recommend_restaurants",
    "generate_recipes",
    "generate_restaurants",
]
