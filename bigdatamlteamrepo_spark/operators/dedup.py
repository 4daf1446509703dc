"""Deduplication operator family (LLM-pipeline extension tier).

Four tiers, each a pure DataFrame plan:
  * exact           — md5 groupBy (queries/text_dedup.py)
  * MinHash + LSH   — portable md5 minhash → band join (queries/text_dedup.py)
  * SimHash         — 32-bit sign-sum fingerprint, Hamming-bucket pairing (here)
  * embedding-cosine near-dup — threshold pairs over vectors (here +
    queries/similarity oracle)

SimHash design: per token, ``xxhash64(token)`` supplies 32 bits; the
fingerprint bit *b* is 1 iff the majority of tokens have bit *b* set.
Everything is one explode + one groupBy: the 32 conditional sums
compile to a single hash-aggregate pass — no UDFs, no driver state.
Near-dup candidates = fingerprints equal on at least one 16-bit half
(Hamming-distance banding), then exact Hamming filter ≤ ``max_hamming``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.text import tokenize

_N_BITS = 32


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) — 32-bit SimHash over whitespace tokens.

    Duplicate tokens intentionally count with multiplicity (standard
    SimHash weighting by term frequency).
    """
    toks = docs.select(id_col, F.explode(tokenize(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(_N_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    fp = None
    for b in range(_N_BITS):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select(id_col, fp.alias("simhash"))


def _popcount32(c: Column) -> Column:
    """Hamming weight of the low 32 bits via the classic SWAR bit trick
    (expression-only; Spark has no builtin popcount)."""
    x = c.bitwiseAND(F.lit(0xFFFFFFFF))
    x = x - F.shiftright(x, 1).bitwiseAND(F.lit(0x55555555))
    x = x.bitwiseAND(F.lit(0x33333333)) + F.shiftright(x, 2).bitwiseAND(F.lit(0x33333333))
    x = (x + F.shiftright(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    return F.shiftright(x * F.lit(0x01010101), 24).bitwiseAND(F.lit(0xFF))


def simhash_neardup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 6
) -> DataFrame:
    """Candidate pairs via half-fingerprint banding + exact Hamming filter.

    With 2 bands of 16 bits, any pair within Hamming distance ≤ 1 per
    half shares a band; ``max_hamming`` then bounds the verified
    distance.  Scale: both band joins are equi-joins on 16-bit keys.
    """
    fp = simhash_fingerprints(docs, text_col, id_col)
    lo = fp.withColumn("band", F.col("simhash").bitwiseAND(F.lit(0xFFFF)))
    hi = fp.withColumn("band", F.shiftright("simhash", 16).bitwiseAND(F.lit(0xFFFF)))
    bands = lo.withColumn("half", F.lit(0)).unionByName(hi.withColumn("half", F.lit(1)))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.half") == F.col("b.half"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = _popcount32(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicates: all pairs with cosine ≥ threshold.

    Brute-force O(n²) — correct baseline for bounded corpora; the LSH
    path (operators/similarity.py) is the 100 TB candidate generator.
    """
    from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
