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

#: extra fillers for the PHRASE-labeled matched corpus
#: (:func:`generate_recipes_matched`) ONLY.  With 40 fillers the
#: fixture's phrase-bigram contexts repeat across train/test far more
#: than the reference's free-form ingredient lists, which left the
#: bigram-5class accuracy +0.057 above the reference (r5 verdict item
#: 10); 80 fillers dilute the bigram context space to the reference's
#: regime (measured: bigram 0.735/0.714 vs reference 0.745/0.741, all
#: other reference metrics simultaneously inside ±0.05 — MLMETRICS.md).
#: Unigram allergen evidence is untouched (same allergen/collider
#: machinery).  None of these contains an allergen term as a substring
#: (guarded in tests), and none hash-collides with an allergen bucket
#: at numFeatures=5000 (that would be an undocumented collider —
#: "polenta" was rejected for landing in the "peanuts" bucket).  The
#: SUBSTR twin keeps the original 40: its RF-diffusion result is tuned
#: against that vocabulary.
_MATCHED_EXTRA_FILLERS = [
    "watercress", "star anise", "pumpkin seeds", "white wine", "red wine",
    "apple cider", "dijon mustard", "hot sauce", "tamarind paste",
    "oyster sauce", "rice vinegar", "balsamic vinegar", "canola oil",
    "grapeseed oil", "shallots", "leeks", "fennel", "parsnip", "turnip",
    "radish", "arugula", "romaine", "cabbage", "broccoli", "cauliflower",
    "green beans", "snap peas", "chickpeas", "black beans", "lentils",
    "quinoa", "couscous", "orzo", "farro", "barley",
    "rosemary", "sage", "tarragon", "dill", "chives",
]

MATCHED_FILLERS = FILLERS + _MATCHED_EXTRA_FILLERS


#: benign phrases mined to hash into the SAME HashingTF(5000) bucket as
#: an allergen phrase (MurmurHash3 seed 42, the MLlib default) — they
#: make a document's feature vector indistinguishable from an allergen
#: document, bounding every model's accuracy below 1 exactly like the
#: unseen-phrase noise of the reference's real corpus.  Mined offline
#: with HashingTF.indexOf; only valid at numFeatures=5000.
COLLIDER_PHRASES = [
    # → bucket of "milk" (949)
    "roasted chicory 15", "sweet endive 46", "tender plantain 34",
    # → "eggs" (1289)
    "roasted saffron", "whole anise 20", "fresh fennel 20",
    # → "cheese" (2313)
    "pickled allspice 30", "minced radicchio 43", "wild fennel 31",
    # → "butter" (3398)
    "zesty juniper 35", "dried allspice 49", "dried plantain 44",
    # → "wheat" (2071)
    "toasted coriander 22", "minced coriander 26", "sliced marjoram 1",
    # → "soy" (1237)
    "smoked nutmeg 8", "pickled sorrel 36", "minced cardamom 24",
    # → "shrimp" (881)
    "pickled chicory 24", "pickled radicchio 49", "ground clove 52",
    # → "almonds" (788)
    "dried cardamom 29", "candied coriander 1", "rustic allspice 39",
]


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


# ---------------------------------------------------------------------------
# Substring-labeled fixture (round 3): evidence DIFFUSED across buckets.
# ---------------------------------------------------------------------------

#: composite-phrase builders for the substring fixture: each positive doc
#: carries "<prefix> <allergen-term>" — labeled by SUBSTRING containment,
#: featurized (phrase-level HashingTF) into a DIFFERENT bucket per
#: (prefix, term) combination
SUBSTR_PREFIXES = [
    "fresh", "organic", "chopped", "diced", "whole", "sliced",
    "dried", "minced", "grated", "crushed", "shredded", "melted",
    "softened", "cubed", "pureed", "blanched", "roasted", "smoked",
    "cold", "warm",
]


def _murmur3_32(data: bytes, seed: int = 42) -> int:
    """MurmurHash3 x86_32 (Austin Appleby, public domain) — the hash
    behind Spark MLlib's HashingTF term bucketing (default seed 42).
    Pure-Python replica so the fixture can mine bucket collisions
    without a JVM; validated against HashingTF.indexOf on 14 vectors
    (test_ml_allergen)."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    def mix_k1(k1: int) -> int:
        return (rotl((k1 * 0xCC9E2D51) & 0xFFFFFFFF, 15) * 0x1B873593) & 0xFFFFFFFF

    h1 = seed
    n4 = len(data) // 4 * 4
    for i in range(0, n4, 4):
        h1 ^= mix_k1(int.from_bytes(data[i : i + 4], "little"))
        h1 = (rotl(h1, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF
    k1 = 0
    rem = len(data) - n4
    if rem == 3:
        k1 ^= data[n4 + 2] << 16
    if rem >= 2:
        k1 ^= data[n4 + 1] << 8
    if rem >= 1:
        k1 ^= data[n4]
        h1 ^= mix_k1(k1)
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def hashing_tf_bucket(term: str, num_features: int = 5000) -> int:
    """The HashingTF(numFeatures) bucket of a term (nonNegativeMod of the
    signed 32-bit murmur3)."""
    h = _murmur3_32(term.encode("utf-8"))
    if h >= 0x80000000:
        h -= 0x100000000
    return ((h % num_features) + num_features) % num_features


_MINE_ADJS = [
    "roasted", "sweet", "tender", "pickled", "wild", "zesty", "toasted",
    "smoked", "candied", "rustic", "ground", "golden", "stone", "river",
]
_MINE_NOUNS = [
    "chicory", "endive", "plantain", "saffron", "anise", "fennel",
    "allspice", "radicchio", "juniper", "coriander", "marjoram", "nutmeg",
    "sorrel", "cardamom", "clove", "tarragon", "lovage", "chervil",
]


def substr_variants(n_variants: int) -> list[str]:
    """The first ``n_variants`` composite allergen phrases, prefix-major
    so small counts still cover every allergen term."""
    out = [f"{p} {t}" for p in SUBSTR_PREFIXES for t in ALLERGENS]
    if n_variants > len(out):
        raise ValueError(f"at most {len(out)} variants available")
    return out[:n_variants]


def mine_substr_colliders(
    n_variants: int, n_buckets: int = 24, per_bucket: int = 2,
    num_features: int = 5000,
) -> list[str]:
    """Benign phrases mined (deterministically, pure Python) to hash into
    the HashingTF buckets of the first ``n_buckets`` variant phrases —
    the substring fixture's analogue of :data:`COLLIDER_PHRASES`.  Mined
    phrases never contain an allergen substring, so they stay labeled
    negative while being feature-identical to positive evidence."""
    targets = [
        hashing_tf_bucket(v, num_features) for v in substr_variants(n_variants)
    ][:n_buckets]
    found: dict[int, list[str]] = {b: [] for b in targets}
    need = {b for b in targets if len(found[b]) < per_bucket}
    for i in range(200):
        for adj in _MINE_ADJS:
            for noun in _MINE_NOUNS:
                cand = f"{adj} {noun} {i}"
                if any(a in cand for a in ALLERGENS):
                    continue
                b = hashing_tf_bucket(cand, num_features)
                if b in need:
                    found[b].append(cand)
                    if len(found[b]) >= per_bucket:
                        need.discard(b)
        if not need:
            break
    assert not need, f"collider mining exhausted with buckets missing: {need}"
    return [p for b in targets for p in found[b][:per_bucket]]


def generate_recipes_matched(
    spark: SparkSession,
    n_rows: int = 9780,
    seed: int = 1956,
    allergen_frac: float = 0.295,
    collider_frac: float = 0.025,
    doubled_collider_frac: float = 0.03,
) -> DataFrame:
    """Distribution-matched analogue of the reference's ≈9.8 k-doc
    allergen corpus (BASELINE.md: 1956 test rows at 20 %, 577 positive).

    Difficulty is injected structurally, not by random label flips, so
    the reference's capacity ordering RF < LR < MLP emerges for the same
    reasons it does on real data:

    * ``collider_frac`` negatives carry ONE phrase from
      :data:`COLLIDER_PHRASES` — feature-identical to an allergen doc at
      numFeatures=5000, an irreducible FP for EVERY model (the analogue
      of the real corpus's unseen/ambiguous phrases);
    * ``doubled_collider_frac`` negatives carry the same collider TWICE
      — TF=2 in an allergen bucket.  A non-monotone rule (count 1 =
      allergen, count 2 = benign) that trees and MLPs can represent but
      a monotone-in-features logistic regression cannot — the LR↔MLP
      accuracy gap;
    * shallow (depth-5) forests additionally dilute the 26-way keyword
      OR across random feature subsets — the RF weakness.

    Class balance ≈ ``allergen_frac`` positives, matching 577/1956.
    """
    fillers = F.array(*[F.lit(x) for x in MATCHED_FILLERS])
    allergens = F.array(*[F.lit(x) for x in _ALL_ALLERGEN_TERMS])
    colliders = F.array(*[F.lit(x) for x in COLLIDER_PHRASES])
    df = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    df = df.withColumn("__seed", F.lit(seed))

    u = F.pmod(F.xxhash64("doc_id", F.lit("type"), "__seed"), F.lit(100000)) / 100000.0
    is_pos = u < allergen_frac
    c1_hi = allergen_frac + collider_frac
    is_coll1 = (u >= allergen_frac) & (u < c1_hi)
    is_coll2 = (u >= c1_hi) & (u < c1_hi + doubled_collider_frac)

    n_ing = (F.pmod(F.xxhash64("doc_id", F.lit("n"), "__seed"), F.lit(10)) + 3).cast("int")
    n_allergen = F.when(
        is_pos,
        (F.pmod(F.xxhash64("doc_id", F.lit("na"), "__seed"), F.lit(3)) + 1).cast("int"),
    ).otherwise(F.lit(0))

    filler_part = F.transform(
        F.sequence(F.lit(1), n_ing),
        lambda i: _pick(fillers, ["doc_id", i, F.lit("f"), "__seed"], len(MATCHED_FILLERS)),
    )
    # distinct picks: a repeated allergen phrase would put TF=2 in an
    # allergen bucket and blur the doubled-collider count signal
    allergen_part = F.when(n_allergen > 0, F.array_distinct(F.transform(
        F.sequence(F.lit(1), n_allergen),
        lambda i: _pick(allergens, ["doc_id", i, F.lit("a"), "__seed"], len(_ALL_ALLERGEN_TERMS)),
    ))).otherwise(F.array().cast("array<string>"))

    collider = _pick(colliders, ["doc_id", F.lit("c"), "__seed"], len(COLLIDER_PHRASES))
    collider_part = (
        F.when(is_coll1, F.array(collider))
        .when(is_coll2, F.array(collider, collider))
        .otherwise(F.array().cast("array<string>"))
    )

    ingredients = F.concat(allergen_part, collider_part, filler_part)
    ingredients = F.transform(
        ingredients,
        lambda x: F.when(
            F.pmod(F.xxhash64(x, F.col("doc_id")), F.lit(2)) == 0, F.initcap(x)
        ).otherwise(x),
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


def generate_recipes_matched_substr(
    spark: SparkSession,
    n_rows: int = 9780,
    seed: int = 1956,
    allergen_frac: float = 0.295,
    collider_frac: float = 0.025,
    doubled_collider_frac: float = 0.03,
    n_variants: int = 420,
) -> DataFrame:
    """Substring-labeled twin of :func:`generate_recipes_matched` that
    reproduces the reference's RF gap (MLP.ipynb:c4:6 — RF 0.77 while
    LR 0.93 / MLP 0.98).

    The exact-phrase fixture concentrates all positive evidence in ≤26
    HashingTF buckets, which even a depth-5 forest partially covers —
    its RF scored 0.93 (MLMETRICS.md).  Here every positive doc instead
    carries composite phrases "<prefix> <term>" drawn from
    ``n_variants`` combinations — labeled positive by SUBSTRING
    containment (:func:`...arrays.has_any_keyword_substr`), hashed into
    ``n_variants`` DIFFERENT buckets.  A 100-tree depth-5 forest picks
    √5000 ≈ 71 random candidate features per split and covers ≤31
    features per tree, so diffused evidence is mostly invisible to any
    single tree — the same dilution the reference's free-form real
    corpus causes.  LR/MLP sum small weights across all buckets and are
    unaffected; the collider/doubled-collider mechanism (here mined
    against the variant buckets) keeps their ceilings at the reference
    levels."""
    fillers = F.array(*[F.lit(x) for x in FILLERS])
    variants = F.array(*[F.lit(x) for x in substr_variants(n_variants)])
    mined = mine_substr_colliders(n_variants)
    colliders = F.array(*[F.lit(x) for x in mined])
    df = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    df = df.withColumn("__seed", F.lit(seed))

    u = F.pmod(F.xxhash64("doc_id", F.lit("type"), "__seed"), F.lit(100000)) / 100000.0
    is_pos = u < allergen_frac
    c1_hi = allergen_frac + collider_frac
    is_coll1 = (u >= allergen_frac) & (u < c1_hi)
    is_coll2 = (u >= c1_hi) & (u < c1_hi + doubled_collider_frac)

    n_ing = (F.pmod(F.xxhash64("doc_id", F.lit("n"), "__seed"), F.lit(10)) + 3).cast("int")
    n_allergen = F.when(
        is_pos,
        (F.pmod(F.xxhash64("doc_id", F.lit("na"), "__seed"), F.lit(3)) + 1).cast("int"),
    ).otherwise(F.lit(0))

    filler_part = F.transform(
        F.sequence(F.lit(1), n_ing),
        lambda i: _pick(fillers, ["doc_id", i, F.lit("f"), "__seed"], len(FILLERS)),
    )
    allergen_part = F.when(n_allergen > 0, F.array_distinct(F.transform(
        F.sequence(F.lit(1), n_allergen),
        lambda i: _pick(variants, ["doc_id", i, F.lit("a"), "__seed"], n_variants),
    ))).otherwise(F.array().cast("array<string>"))

    collider = _pick(colliders, ["doc_id", F.lit("c"), "__seed"], len(mined))
    collider_part = (
        F.when(is_coll1, F.array(collider))
        .when(is_coll2, F.array(collider, collider))
        .otherwise(F.array().cast("array<string>"))
    )

    ingredients = F.concat(allergen_part, collider_part, filler_part)
    ingredients = F.transform(
        ingredients,
        lambda x: F.when(
            F.pmod(F.xxhash64(x, F.col("doc_id")), F.lit(2)) == 0, F.initcap(x)
        ).otherwise(x),
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
