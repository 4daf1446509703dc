"""Text-analysis + deduplication queries over ``documents``.

This family covers (a) the reference's keyword-labeling surface
(MLP.ipynb allergen pipeline shapes, re-targeted at the driver's
``documents`` corpus) and (b) the LLM-training-data-pipeline extensions:
token stats, quality scoring, exact dedup, MinHash/LSH near-dedup,
n-gram Jaccard.

Scale notes:
  * labeling/tokenization are pure row-level expressions — no shuffle,
    full codegen, embarrassingly parallel at 100 TB;
  * exact dedup groups by md5(text): one shuffle on a uniform key;
  * MinHash signatures are row-level; LSH banding turns near-dedup into
    an equi-join on band keys (shuffle on band, no O(n²) compare);
  * n-gram Jaccard runs only within blocking cells (lang, source) —
    the standard blocking strategy that bounds pair explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.arrays import first_match_category, has_any_keyword
from bigdatamlteamrepo_spark.functions.text import minhash_value, shingles, tokenize
from bigdatamlteamrepo_spark.queries.registry import query

#: flagship keyword set (allergen-keyword analogue over the synthetic vocab)
LABEL_KEYWORDS = ["spark", "join", "stream"]

#: first-match-wins category map (MLP.ipynb:c5:31-38 shape; order matters)
CATEGORY_MAP = {
    "compute": ["spark", "query", "hash"],
    "relational": ["join", "merge", "filter"],
    "streaming": ["stream", "window", "batch"],
    "storage": ["table", "row", "column"],
}

_TOKENS_SQL = "string_split_regex(lower(text), '\\s+')"


def _with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn("toks", tokenize("text"))


# --------------------------------------------------------------------------
# Flagship: keyword labeling + class distribution (SURVEY §7 minimum slice:
# read → tokenize/lower → arrays_overlap label → groupBy(label).count()).
# --------------------------------------------------------------------------


@query(
    "doc_keyword_label_counts",
    oracle=f"""
SELECT CASE WHEN list_has_any({_TOKENS_SQL},
            ['spark', 'join', 'stream']) THEN 1 ELSE 0 END AS has_keyword,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
""",
    bench=True,
)
def doc_keyword_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _with_tokens(spark, sf_dir)
        .withColumn("has_keyword", has_any_keyword(F.col("toks"), LABEL_KEYWORDS))
        .groupBy("has_keyword")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# First-match-wins multiclass labeling (MLP.ipynb:c5:31-38 CASE chain).
# --------------------------------------------------------------------------


@query(
    "doc_category_distribution",
    oracle=f"""
WITH t AS (SELECT lang, {_TOKENS_SQL} AS toks FROM documents)
SELECT CASE
         WHEN list_has_any(toks, ['spark', 'query', 'hash']) THEN 'compute'
         WHEN list_has_any(toks, ['join', 'merge', 'filter']) THEN 'relational'
         WHEN list_has_any(toks, ['stream', 'window', 'batch']) THEN 'streaming'
         WHEN list_has_any(toks, ['table', 'row', 'column']) THEN 'storage'
         ELSE 'none'
       END AS category,
       lang,
       COUNT(*) AS n_docs
FROM t
GROUP BY 1, 2
""",
)
def doc_category_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _with_tokens(spark, sf_dir)
        .withColumn("category", first_match_category(F.col("toks"), CATEGORY_MAP))
        .groupBy("category", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Multi-hot label matrix distribution (MLP.ipynb:c7:27-39 is_{cat} columns).
# --------------------------------------------------------------------------


@query(
    "doc_multihot_label_totals",
    oracle=f"""
WITH t AS (SELECT {_TOKENS_SQL} AS toks FROM documents)
SELECT CAST(SUM(CASE WHEN list_has_any(toks, ['spark', 'query', 'hash']) THEN 1 ELSE 0 END) AS BIGINT) AS n_compute,
       CAST(SUM(CASE WHEN list_has_any(toks, ['join', 'merge', 'filter']) THEN 1 ELSE 0 END) AS BIGINT) AS n_relational,
       CAST(SUM(CASE WHEN list_has_any(toks, ['stream', 'window', 'batch']) THEN 1 ELSE 0 END) AS BIGINT) AS n_streaming,
       CAST(SUM(CASE WHEN list_has_any(toks, ['table', 'row', 'column']) THEN 1 ELSE 0 END) AS BIGINT) AS n_storage,
       COUNT(*) AS n_docs
FROM t
""",
)
def doc_multihot_label_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_tokens(spark, sf_dir)
    aggs = [
        F.sum(has_any_keyword(F.col("toks"), kws)).alias(f"n_{name}")
        for name, kws in CATEGORY_MAP.items()
    ]
    return df.agg(*aggs, F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------
# Token statistics per language (counting, quality aggregates).
# --------------------------------------------------------------------------


@query(
    "doc_token_stats_by_lang",
    oracle=f"""
WITH t AS (SELECT lang, n_chars, len({_TOKENS_SQL}) AS n_tokens FROM documents)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
       MAX(n_tokens) AS max_tokens
FROM t
GROUP BY lang
""",
)
def doc_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_tokens(spark, sf_dir).withColumn("n_tokens", F.size("toks"))
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# Per-document quality score (row-level; integer-derived doubles are
# bit-deterministic so no rounding is needed for the oracle).
# --------------------------------------------------------------------------


@query(
    "doc_quality_scores",
    oracle=f"""
WITH t AS (SELECT doc_id, n_chars, {_TOKENS_SQL} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique_tokens,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
       CAST(n_chars AS DOUBLE) / len(toks) AS chars_per_token
FROM t
WHERE len(toks) > 0
""",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_tokens(spark, sf_dir)
    n = F.size("toks")
    uniq = F.size(F.array_distinct("toks"))
    return df.filter(n > 0).select(
        "doc_id",
        n.alias("n_tokens"),
        uniq.alias("n_unique_tokens"),
        (uniq.cast("double") / n.cast("double")).alias("type_token_ratio"),
        (F.col("n_chars").cast("double") / n.cast("double")).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# BPE-ish token counting: sub-word-style splitting on word boundaries /
# digit runs / punctuation (a regex approximation of byte-pair behavior
# for counting purposes), identical regex semantics in both engines.
# --------------------------------------------------------------------------

_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


@query(
    "doc_bpe_token_counts",
    oracle=f"""
WITH t AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_bpe,
         len({_TOKENS_SQL}) AS n_ws
  FROM documents
)
SELECT lang,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_ws) AS DOUBLE) AS bpe_per_word
FROM t
GROUP BY lang
""",
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(f"({_BPE_RE})"), 1)
    )
    n_ws = F.size(tokenize("text"))
    t = docs.select("lang", n_bpe.alias("n_bpe"), n_ws.alias("n_ws"))
    return t.groupBy("lang").agg(
        F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
        F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
        (
            F.sum("n_bpe").cast("double") / F.sum("n_ws").cast("double")
        ).alias("bpe_per_word"),
    )


# --------------------------------------------------------------------------
# Document fingerprinting: winnowing over a character rolling hash —
# k-char shingles hashed (md5, portable), minimum per sliding window of
# w hashes = the classic winnowing fingerprint set (MOSS).  Output is
# the per-document fingerprint count + extrema (bounded row size).
# --------------------------------------------------------------------------

_K_CHARS = 8
_WINNOW_W = 4


@query(
    "doc_winnowing_fingerprints",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - {_K_CHARS} + 2),
                        i -> md5(substring(text, i, {_K_CHARS}))) AS hs
  FROM documents
  WHERE length(text) >= {_K_CHARS + _WINNOW_W - 1}
),
fp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(hs) - {_WINNOW_W} + 2),
                        i -> list_min(hs[i:i+{_WINNOW_W - 1}]))) AS fps
  FROM h
)
SELECT doc_id,
       len(fps) AS n_fingerprints,
       list_min(fps) AS min_fp,
       list_max(fps) AS max_fp
FROM fp
""",
)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _K_CHARS + _WINNOW_W - 1
    )
    hs = F.transform(
        F.sequence(F.lit(1), F.length("text") - (_K_CHARS - 1)),
        lambda i: F.md5(F.col("text").substr(i, F.lit(_K_CHARS))),
    )
    docs = docs.withColumn("hs", hs)
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("hs") - _WINNOW_W),
            lambda i: F.array_min(F.slice("hs", i + 1, _WINNOW_W)),
        )
    )
    return docs.select(
        "doc_id",
        F.size(fps).alias("n_fingerprints"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
    )


# --------------------------------------------------------------------------
# Language identification (marker-word voting; see functions/langid.py).
# Driver docs' lang column is text-uncorrelated → rows-only here;
# accuracy is asserted on a real multilingual fixture in tests.
# --------------------------------------------------------------------------


@query("doc_language_id")
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamlteamrepo_spark.functions.langid import language_id

    df = _with_tokens(spark, sf_dir)
    return (
        df.withColumn("predicted_lang", language_id(F.col("toks")))
        .groupBy("predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Token-distribution entropy per document: -Σ p·ln(p) over token
# frequencies.  Portability trick: fold over the SORTED distinct token
# list so both engines sum identical doubles in identical order.
# --------------------------------------------------------------------------


@query(
    "doc_token_entropy",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
),
d AS (
  SELECT doc_id, toks, list_sort(list_distinct(toks)) AS dt, len(toks) AS n
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       list_sum(list_transform(dt,
         x -> -(CAST(len(list_filter(toks, y -> y = x)) AS DOUBLE) / n)
              * ln(CAST(len(list_filter(toks, y -> y = x)) AS DOUBLE) / n)
       )) AS token_entropy,
       len(dt) AS n_unique
FROM d
""",
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _with_tokens(spark, sf_dir).filter(F.size("toks") > 0)
    dt = F.array_sort(F.array_distinct("toks"))
    n = F.size("toks").cast("double")
    p = lambda x: F.size(F.filter(F.col("toks"), lambda y: y == x)).cast("double") / n
    terms = F.transform(dt, lambda x: -p(x) * F.log(p(x)))
    entropy = F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    return df.select(
        "doc_id",
        entropy.alias("token_entropy"),
        F.size(dt).alias("n_unique"),
    )


# --------------------------------------------------------------------------
# Exact dedup: md5(text) grouping; keep = min(doc_id) per hash
# (hash-groupBy dedup — one shuffle on a uniform key at any scale).
# --------------------------------------------------------------------------


@query(
    "dedup_exact_by_lang",
    oracle="""
WITH kept AS (
  SELECT lang, md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
  FROM documents GROUP BY lang, md5(text)
)
SELECT lang,
       COUNT(*) AS n_kept,
       CAST(SUM(n_copies) AS BIGINT) AS n_total,
       CAST(SUM(n_copies - 1) AS BIGINT) AS n_removed
FROM kept GROUP BY lang
""",
)
def dedup_exact_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = (
        docs.groupBy("lang", F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_copies").cast("bigint").alias("n_total"),
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("n_removed"),
    )


# --------------------------------------------------------------------------
# MinHash signatures (portable md5-based minhash, SQL-expressible; see
# functions/text.py docstring for the 100 TB design rationale).
# --------------------------------------------------------------------------

_N_HASHES = 4


def _minhash_sql(seed: int) -> str:
    return (
        "list_min(list_transform("
        "list_transform(range(1, greatest(len(toks) - 2, 0) + 1), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), "
        f"s -> md5('{seed}|' || s)))"
    )


@query(
    "minhash_signatures",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
SELECT doc_id,
       {_minhash_sql(0)} AS mh_0,
       {_minhash_sql(1)} AS mh_1,
       {_minhash_sql(2)} AS mh_2,
       {_minhash_sql(3)} AS mh_3
FROM t
WHERE len(toks) >= 3
""",
    bench=True,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamlteamrepo_spark.functions.text import minhash_values

    df = _with_tokens(spark, sf_dir).filter(F.size("toks") >= 3)
    sh = shingles(F.col("toks"), 3)
    mh = df.select("doc_id", minhash_values(sh, _N_HASHES).alias("mh"))
    return mh.select(
        "doc_id", *[F.get("mh", s).alias(f"mh_{s}") for s in range(_N_HASHES)]
    )


# --------------------------------------------------------------------------
# LSH near-dup candidate pairs: band keys = md5 of concatenated signature
# halves; docs sharing a band become candidates via an equi-join (no n²).
# --------------------------------------------------------------------------


@query(
    "neardup_pairs_lsh",
    oracle=f"""
WITH sig AS (
  SELECT doc_id,
         {_minhash_sql(0)} AS mh_0, {_minhash_sql(1)} AS mh_1,
         {_minhash_sql(2)} AS mh_2, {_minhash_sql(3)} AS mh_3
  FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
  WHERE len(toks) >= 3
),
bands AS (
  SELECT doc_id, md5(mh_0 || mh_1) AS band FROM sig
  UNION ALL
  SELECT doc_id, md5(mh_2 || mh_3) AS band FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
""",
)
def neardup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(spark, sf_dir)
    b0 = sig.select("doc_id", F.md5(F.concat("mh_0", "mh_1")).alias("band"))
    b1 = sig.select("doc_id", F.md5(F.concat("mh_2", "mh_3")).alias("band"))
    bands = b0.unionByName(b1)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# --------------------------------------------------------------------------
# Cross-source near-duplicates: LSH pairs whose two docs come from
# DIFFERENT sources — the contamination/leak check a training-data
# pipeline runs between crawl snapshots or datasets.
# --------------------------------------------------------------------------


@query(
    "neardup_cross_source",
    oracle=f"""
WITH sig AS (
  SELECT doc_id,
         {_minhash_sql(0)} AS mh_0, {_minhash_sql(1)} AS mh_1,
         {_minhash_sql(2)} AS mh_2, {_minhash_sql(3)} AS mh_3
  FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
  WHERE len(toks) >= 3
),
bands AS (
  SELECT doc_id, md5(mh_0 || mh_1) AS band FROM sig
  UNION ALL
  SELECT doc_id, md5(mh_2 || mh_3) AS band FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
)
SELECT da.source AS source_a, db.source AS source_b, COUNT(*) AS n_pairs
FROM pairs
JOIN documents da ON da.doc_id = pairs.doc_a
JOIN documents db ON db.doc_id = pairs.doc_b
WHERE da.source <> db.source
GROUP BY 1, 2
""",
)
def neardup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = neardup_pairs_lsh(spark, sf_dir)
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b"))
    return (
        pairs.join(F.broadcast(da), "doc_a")
        .join(F.broadcast(db), "doc_b")
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# n-gram Jaccard similarity within blocking cells (lang, source).
# --------------------------------------------------------------------------

_JACCARD_MIN = 0.2


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, source, list_distinct({_TOKENS_SQL}) AS dtoks
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.dtoks, b.dtoks)) AS DOUBLE)
         / (len(a.dtoks) + len(b.dtoks) - len(list_intersect(a.dtoks, b.dtoks)))
         AS jaccard
FROM t a JOIN t b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.dtoks, b.dtoks)) AS DOUBLE)
        / (len(a.dtoks) + len(b.dtoks) - len(list_intersect(a.dtoks, b.dtoks)))
        >= {_JACCARD_MIN}
""",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _with_tokens(spark, sf_dir).select(
        "doc_id", "lang", "source", F.array_distinct("toks").alias("dtoks")
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.dtoks"), F.col("b.dtoks")))
    union = F.size(F.col("a.dtoks")) + F.size(F.col("b.dtoks")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _JACCARD_MIN)
    )
