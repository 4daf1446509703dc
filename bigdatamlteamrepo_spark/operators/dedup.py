"""Deduplication operator family (LLM-pipeline extension tier).

Four tiers, each a pure DataFrame plan:
  * exact           — md5 groupBy (queries/text_dedup.py)
  * MinHash + LSH   — portable md5 minhash → band join (queries/text_dedup.py)
  * SimHash         — 64-bit sign-sum fingerprint, 4×16-bit banding (here)
  * embedding-cosine near-dup — exact threshold pairs via KMeans-cell
    blocking with triangle-inequality pruning (here), plus the RP-LSH
    candidates-then-verify variant (queries/extensions.py)

SimHash design: per token, the first 16 hex chars of ``md5(token)``
supply 64 bits (two 32-bit words, portable to the DuckDB oracle via
``('0x' || hex)::BIGINT``); fingerprint bit *b* is 1 iff the majority of
tokens have bit *b* set.  Everything is one explode + one groupBy: the
64 conditional sums compile to a single hash-aggregate pass — no UDFs,
no driver state.  Near-dup candidates = fingerprints equal on at least
one of four 16-bit bands, which by pigeonhole is COMPLETE for Hamming
distance ≤ 3 (the standard 64-bit/4-band guarantee); candidates are then
exact-Hamming filtered.  Bucket keyspace is 4 × 2^16 ≈ 262k per band
*slice*, and unlike a fixed 2×16-bit split of a 32-bit fingerprint the
64-bit space keeps within-bucket populations from saturating as the
corpus grows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.text import tokenize

_WORD_BITS = 32


def _hex_word(tok: Column, start: int) -> Column:
    """32-bit word from md5 hex chars [start, start+8) as a long."""
    return F.conv(F.substring(F.md5(tok), start, 8), 16, 10).cast("long")


def _vote_word(word: Column, prefix: str) -> list[Column]:
    """±1 majority-vote sums for each of a word's 32 bits."""
    return [
        F.sum(
            F.when(F.shiftright(word, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"{prefix}{b}")
        for b in range(_WORD_BITS)
    ]


def _assemble(prefix: str) -> Column:
    """Pack 32 vote columns into a 32-bit fingerprint word (long)."""
    fp = None
    for b in range(_WORD_BITS):
        bit = F.when(F.col(f"{prefix}{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return fp


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sh_lo, sh_hi) — 64-bit SimHash as two 32-bit words.

    Duplicate tokens intentionally count with multiplicity (standard
    SimHash weighting by term frequency).  md5-derived bits keep the
    fingerprint bit-for-bit reproducible in the DuckDB oracle.
    """
    toks = docs.select(id_col, F.explode(tokenize(text_col)).alias("tok"))
    toks = toks.withColumn("w1", _hex_word(F.col("tok"), 1)).withColumn(
        "w2", _hex_word(F.col("tok"), 9)
    )
    agg = toks.groupBy(id_col).agg(
        *_vote_word(F.col("w1"), "lo"), *_vote_word(F.col("w2"), "hi")
    )
    return agg.select(id_col, _assemble("lo").alias("sh_lo"), _assemble("hi").alias("sh_hi"))


def simhash_neardup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs via 16-bit banding + exact Hamming filter.

    With 4 bands over 64 bits, any pair within Hamming distance ≤ 3
    shares at least one band (pigeonhole) — so for ``max_hamming`` ≤ 3
    the result is EXACTLY all pairs within that distance; beyond 3 the
    banding is a (documented) recall<1 candidate generator.  The exact
    Hamming filter runs on the raw band-join output BEFORE the distinct,
    so the shuffled dedup payload is only the surviving near-dup pairs,
    not the full candidate multiset.
    """
    fp = simhash_fingerprints(docs, text_col, id_col)
    band_cols = [
        F.col("sh_lo").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright("sh_lo", 16).bitwiseAND(F.lit(0xFFFF)),
        F.col("sh_hi").bitwiseAND(F.lit(0xFFFF)),
        F.shiftright("sh_hi", 16).bitwiseAND(F.lit(0xFFFF)),
    ]
    bands = fp.select(
        id_col,
        "sh_lo",
        "sh_hi",
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.sh_lo").bitwiseXOR(F.col("b.sh_lo"))) + F.bit_count(
        F.col("a.sh_hi").bitwiseXOR(F.col("b.sh_hi"))
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    fit_sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """EXACT embedding-cosine near-duplicates: all pairs with cosine ≥
    threshold — no candidate loss — via KMeans-cell blocking with
    triangle-inequality block pruning.

    On unit-normalized vectors cos(a,b) ≥ t ⟺ ‖â−b̂‖ ≤ r = √(2−2t), so
    with each vector assigned to its nearest of ``n_cells`` centroids
    (fit on a sample — never feed a 100 TB corpus whole into iterative
    KMeans) and per-cell radii ρ, a block pair (X, Y) can contain a
    qualifying pair only if ‖c_X − c_Y‖ ≤ ρ_X + ρ_Y + r — every other
    block pair is provably empty and never joined.  The plan is two hash
    equi-joins on cell ids (no BroadcastNestedLoop / cartesian); the
    exact cosine verify runs only inside surviving blocks.

    Pruning power is data-dependent: clustered corpora (the real-world
    case) prune most of the K² grid; an adversarially uniform corpus
    prunes nothing — exact threshold joins on gapless data are
    inherently Ω(n²) comparisons, and the scale levers are this blocking
    plus the LSH candidates-then-verify variant
    (queries/extensions.py:embedding_neardup_lsh) when approximate
    recall is acceptable.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity, l2_norm

    r = float(np.sqrt(max(0.0, 2.0 - 2.0 * threshold)))

    unit = F.transform(
        F.col(vec_col).cast("array<double>"), lambda x: x / F.col("__n")
    )
    normed = (
        emb.select(id_col, vec_col)
        .withColumn("__n", l2_norm(F.col(vec_col)))
        .filter(F.col("__n") > 0)  # zero vectors have NULL cosine — never qualify
        .withColumn("__unit", unit)
        .withColumn("__v", array_to_vector("__unit"))
    )
    fit_set = (
        normed.sample(withReplacement=False, fraction=fit_sample_fraction, seed=seed)
        if fit_sample_fraction is not None
        else normed
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="cell").fit(
        fit_set
    )
    centers = {i: np.asarray(c, dtype=float) for i, c in enumerate(model.clusterCenters())}
    centers_df = emb.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in centers.items()],
        "cell int, center array<double>",
    )

    # cache: the normalize+assign lineage feeds the radii collect AND
    # both sides of the pair join — without this it recomputes 3×.
    # (At cluster scale, swap for MEMORY_AND_DISK or drop the cache and
    # accept one extra columnar scan — the radii pass needs all rows.)
    assigned = model.transform(normed).select(id_col, vec_col, "__unit", "cell").cache()
    # per-cell radius: max distance of members to their assigned centroid
    dist_sq = F.aggregate(
        F.zip_with(F.col("__unit"), F.col("center"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    radii = {
        row["cell"]: row["rho"]
        for row in assigned.join(F.broadcast(centers_df), "cell")
        .groupBy("cell")
        .agg(F.max(F.sqrt(dist_sq)).alias("rho"))
        .collect()
    }

    eps = 1e-9  # absorbs FP error in the driver-side centroid distances
    grid = [
        (i, j)
        for i in centers
        for j in centers
        if i in radii and j in radii
        and float(np.linalg.norm(centers[i] - centers[j]))
        <= radii[i] + radii[j] + r + eps
    ]
    grid_df = emb.sparkSession.createDataFrame(grid, "cell_a int, cell_b int")

    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("cell").alias("cell_a")
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("cell").alias("cell_b")
    )
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        a.join(F.broadcast(grid_df), "cell_a")
        .join(b, "cell_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
