"""Synthetic recipe corpus (FIXTURES.md §1) + allergen label semantics.

The reference's allergen corpus (``/content/test.json``) is not public,
so tests run on a deterministic synthetic analogue.  Generation is pure
Spark expressions over ``spark.range`` — xxhash64-keyed selection from
literal vocabularies — so the same fixture is reproducible at any scale
with no driver-side loop (the 100 TB stance applies to test data too).

Label semantics reproduced from the reference (data, not code):
  * ``ALLERGENS`` — the 26-term binary-label keyword list
    (MLP.ipynb:c0:16-20);
  * ``ALLERGEN_CATEGORIES`` — the 6-category first-match-wins map of the
    multi-label/multiclass cells (MLP.ipynb:c6:19-27); match order is
    dict insertion order, exactly like the reference UDF's outer loop;
  * ``BIGRAM_CATEGORIES`` — the 4-category variant of the bigram
    multiclass cell (MLP.ipynb:c5:25-28).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALLERGENS = [
    "milk", "eggs", "egg yolks", "egg whites", "peanuts", "almonds", "pecans",
    "walnuts", "soy", "soybeans", "wheat", "gluten", "fish", "shrimp", "crab",
    "lobster", "shellfish", "cheese", "parmesan", "parmigiano", "cheddar",
    "mozzarella", "butter", "cream", "yogurt",
]

ALLERGEN_CATEGORIES: dict[str, list[str]] = {
    "dairy": ["milk", "cheese", "butter", "cream", "yogurt",
              "parmigiano", "parmesan", "mozzarella", "cheddar"],
    "eggs": ["eggs", "egg yolks", "egg whites"],
    "nuts": ["peanuts", "almonds", "pecans", "walnuts"],
    "seafood": ["fish", "shrimp", "crab", "lobster", "shellfish"],
    "gluten": ["wheat", "gluten", "all-purpose flour"],
    "soy": ["soy", "soybeans", "tofu", "soy sauce"],
}

BIGRAM_CATEGORIES: dict[str, list[str]] = {
    "dairy": ["milk", "cheese", "parmesan", "butter", "cream", "yogurt"],
    "nuts": ["peanuts", "almonds", "pecans", "walnuts"],
    "shellfish": ["shrimp", "crab", "lobster", "shellfish"],
    "gluten": ["wheat", "gluten", "flour"],
}

#: non-allergen fillers (multi-word phrases included so whole-phrase
#: membership — not substring — semantics get exercised)
FILLERS = [
    "salt", "pepper", "olive oil", "garlic", "onion", "tomato", "basil",
    "rice", "chicken", "beef", "carrot", "celery", "potato", "sugar",
    "honey", "vinegar", "lemon juice", "cilantro", "cumin", "paprika",
    "oregano", "thyme", "bay leaf", "ginger", "scallions", "zucchini",
    "bell pepper", "mushrooms", "spinach", "kale", "brown sugar",
    "maple syrup", "corn starch", "baking powder", "vanilla extract",
    "red pepper flakes", "sesame seeds", "lime", "coconut", "avocado",
]

_ALL_ALLERGEN_TERMS = sorted({k for kws in ALLERGEN_CATEGORIES.values() for k in kws} | set(ALLERGENS))


def _pick(arr_lit, hash_cols, n_lit: int):
    """Deterministic element pick: vocab[xxhash64(...) mod len]."""
    idx = F.pmod(F.xxhash64(*hash_cols), F.lit(n_lit)).cast("int")
    return F.get(arr_lit, idx)


def generate_recipes(
    spark: SparkSession, n_rows: int = 2000, allergen_frac: float = 0.3, seed: int = 42
) -> DataFrame:
    """Deterministic recipe corpus: ``doc_id, title, ingredients,
    directions, ner`` with ≈``allergen_frac`` of rows containing ≥1
    allergen phrase, mixed-case to exercise ``transform(lower)``.
    """
    fillers = F.array(*[F.lit(x) for x in FILLERS])
    allergens = F.array(*[F.lit(x) for x in _ALL_ALLERGEN_TERMS])
    df = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    df = df.withColumn("__seed", F.lit(seed))

    n_ing = (F.pmod(F.xxhash64("doc_id", F.lit("n"), "__seed"), F.lit(10)) + 3).cast("int")
    has_allergen = (
        F.pmod(F.xxhash64("doc_id", F.lit("al"), "__seed"), F.lit(1000))
        < int(allergen_frac * 1000)
    )
    n_allergen = F.when(
        has_allergen,
        (F.pmod(F.xxhash64("doc_id", F.lit("na"), "__seed"), F.lit(3)) + 1).cast("int"),
    ).otherwise(F.lit(0))

    filler_part = F.transform(
        F.sequence(F.lit(1), n_ing),
        lambda i: _pick(fillers, ["doc_id", i, F.lit("f"), "__seed"], len(FILLERS)),
    )
    # NB: sequence(1, 0) yields a DESCENDING [1,0], not empty — guard n=0.
    allergen_part = F.when(n_allergen > 0, F.transform(
        F.sequence(F.lit(1), n_allergen),
        lambda i: _pick(allergens, ["doc_id", i, F.lit("a"), "__seed"], len(_ALL_ALLERGEN_TERMS)),
    )).otherwise(F.array().cast("array<string>"))
    ingredients = F.concat(allergen_part, filler_part)
    # mixed case: initcap roughly half the phrases, keyed by content hash
    ingredients = F.transform(
        ingredients,
        lambda x: F.when(F.pmod(F.xxhash64(x, F.col("doc_id")), F.lit(2)) == 0, F.initcap(x)).otherwise(x),
    )

    directions = F.array(
        F.concat(F.lit("Combine ingredient set "), F.col("doc_id").cast("string")),
        F.lit("Cook until done."),
        F.lit("Serve warm."),
    )
    return df.select(
        "doc_id",
        F.concat(F.lit("Recipe #"), F.col("doc_id").cast("string")).alias("title"),
        ingredients.alias("ingredients"),
        directions.alias("directions"),
        F.transform(ingredients, F.lower).alias("ner"),
    )
