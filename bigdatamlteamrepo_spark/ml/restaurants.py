"""Synthetic restaurants fixture (FIXTURES.md §3): 7 planted cluster
archetypes (category bundle + geo blob + score distribution) so
KMeans(k=7) can recover structure.  Pure Spark-expression generation
(xxhash64-keyed), deterministic for a given seed, scalable.

Category strings are comma-joined **with a space after each comma**, so
the faithful split-on-',' path reproduces the reference's
leading-space category tokens (category_model.ipynb:c0:11 quirk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: archetype → (category bundle, (lat, lng) center, score center)
ARCHETYPES: list[tuple[list[str], tuple[float, float], float]] = [
    (["Mexican", "Burritos", "Tacos"], (34.05, -118.24), 4.2),
    (["Italian", "Pizza", "Pasta"], (40.71, -74.00), 4.0),
    (["Sushi", "Japanese", "Ramen"], (47.60, -122.33), 4.5),
    (["Burgers", "American", "Fries"], (41.88, -87.63), 3.6),
    (["Indian", "Curry", "Tandoori"], (37.77, -122.42), 4.1),
    (["African", "Ethiopian", "Injera"], (38.90, -77.04), 4.3),
    (["Vegan", "Salads", "Juice"], (30.27, -97.74), 3.9),
]

_EXTRAS = ["Coffee", "Dessert", "Breakfast", "Bar", "Takeout", "Family"]


def _h(cols, mod: int):
    return F.pmod(F.xxhash64(*cols), F.lit(mod))


def _unit(cols):
    """Deterministic pseudo-uniform in [0,1)."""
    return _h(cols, 1_000_000).cast("double") / 1_000_000.0


def generate_restaurants(
    spark: SparkSession, n_rows: int = 3000, seed: int = 42, null_frac: float = 0.05
) -> DataFrame:
    df = spark.range(n_rows).withColumnRenamed("id", "restaurant_id")
    df = df.withColumn("__s", F.lit(seed))
    arch = _h(["restaurant_id", F.lit("arch"), "__s"], len(ARCHETYPES)).cast("int")

    bundles = F.array(
        *[F.array(*[F.lit(c) for c in cats]) for cats, _, _ in ARCHETYPES]
    )
    lats = F.array(*[F.lit(c[0]) for _, c, _ in ARCHETYPES])
    lngs = F.array(*[F.lit(c[1]) for _, c, _ in ARCHETYPES])
    score_centers = F.array(*[F.lit(s) for _, _, s in ARCHETYPES])
    extras = F.array(*[F.lit(x) for x in _EXTRAS])

    extra = F.get(extras, _h(["restaurant_id", F.lit("x"), "__s"], len(_EXTRAS)).cast("int"))
    cats = F.concat(F.get(bundles, arch), F.array(extra))
    category = F.array_join(cats, ", ")  # space after comma → quirk fodder

    lat = F.get(lats, arch) + (_unit(["restaurant_id", F.lit("lat"), "__s"]) - 0.5) * 0.2
    lng = F.get(lngs, arch) + (_unit(["restaurant_id", F.lit("lng"), "__s"]) - 0.5) * 0.2
    score = F.get(score_centers, arch) + (_unit(["restaurant_id", F.lit("sc"), "__s"]) - 0.5) * 0.6
    ratings = (_unit(["restaurant_id", F.lit("rt"), "__s"]) * 500).cast("double")

    null_mask_score = _unit(["restaurant_id", F.lit("ns"), "__s"]) < null_frac
    null_mask_rat = _unit(["restaurant_id", F.lit("nr"), "__s"]) < null_frac

    return df.select(
        "restaurant_id",
        F.concat(F.lit("Restaurant #"), F.col("restaurant_id").cast("string")).alias("name"),
        F.when(~null_mask_score, F.round(score, 2)).alias("score"),
        F.when(~null_mask_rat, F.round(ratings, 0)).alias("ratings"),
        F.concat(F.lit("No. "), F.col("restaurant_id").cast("string"), F.lit(" Main St")).alias("full_address"),
        F.round(lat, 6).alias("lat"),
        F.round(lng, 6).alias("lng"),
        category.alias("category"),
    )
