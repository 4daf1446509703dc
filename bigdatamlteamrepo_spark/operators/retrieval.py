"""Materialized inverted index for chunk-granularity BM25 retrieval.

The ad-hoc query (queries/passages.chunk_bm25_topk) re-scans the corpus
per term set; production retrieval indexes ONCE and answers many term
sets from the index.  Layout (all parquet under ``index_dir``):

* ``postings/`` — (term, doc_id, chunk_id, tf, dl), partitioned by
  ``pbucket = hash32(term) % N_PBUCKETS``: a query for k terms reads at
  most k partitions (partition pruning asserted non-vacuously in
  tests/test_inverted_index.py — the IVF-PQ discipline) and the term
  equality predicate pushes into the scan.
* ``df/`` — (term, df) per-term chunk frequencies (same bucketing).
* ``stats/`` — ONE row: (n_ch, tot_dl).  avgdl derives from the exact
  BIGINT token sum, so scores are fixed-order IEEE expressions.

Scoring from the index reproduces the ad-hoc query's floats BIT-FOR-BIT
(pinned): per-term tf columns come back via conditional-MAX pivots in a
fixed term order, then the score adds contributions in the same tuple
order as the one-pass expression — never a SUM over an unordered
posting stream.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.text import tokenize
from bigdatamlteamrepo_spark.queries.shards import hash32

#: postings partition count: bounds files (and the per-term read) while
#: keeping partitions ≫ terms-per-query; production sizes this to the
#: vocabulary's file-size sweet spot, not the cluster
N_PBUCKETS = 64

_CHUNK_W = 64
_CHUNK_S = 48


def _chunk_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, ctoks) — the sliding-window chunk plan
    (mirrors queries/passages.doc_chunks_overlap)."""
    t = docs.select("doc_id", tokenize("text").alias("toks")).filter(
        F.size("toks") >= 1
    )
    n = F.size("toks")
    n_chunks = F.when(n <= _CHUNK_W, F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(f"(size(toks) - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S}")
    )
    start = F.col("i") * _CHUNK_S + 1
    clen = F.least(F.lit(_CHUNK_W), F.size("toks") - F.col("i") * _CHUNK_S)
    return t.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
    ).select(
        "doc_id",
        F.col("i").alias("chunk_id"),
        F.slice("toks", start, clen).alias("ctoks"),
    )


def build_inverted_index(docs: DataFrame, index_dir: str) -> None:
    """Index the corpus: one chunk pass feeds postings, per-term df,
    and the global stats row.  Postings are one grouped count over the
    exploded token stream (map-side combined — shuffled rows track
    distinct (term, chunk) pairs); everything lands term-hash
    partitioned so queries prune."""
    ch = _chunk_stream(docs).persist()
    postings = (
        ch.select(
            "doc_id",
            "chunk_id",
            F.size("ctoks").alias("dl"),
            F.explode("ctoks").alias("term"),
        )
        .groupBy("term", "doc_id", "chunk_id", "dl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn("pbucket", hash32(F.col("term")) % N_PBUCKETS)
    )
    postings.write.mode("overwrite").partitionBy("pbucket").parquet(
        index_dir + "/postings"
    )
    df = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .withColumn("pbucket", hash32(F.col("term")) % N_PBUCKETS)
    )
    df.write.mode("overwrite").partitionBy("pbucket").parquet(
        index_dir + "/df"
    )
    ch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ch"),
        F.sum(F.size("ctoks")).cast("bigint").alias("tot_dl"),
    ).coalesce(1).write.mode("overwrite").parquet(index_dir + "/stats")
    ch.unpersist()


def append_to_inverted_index(docs: DataFrame, index_dir: str) -> None:
    """Fold a NEW batch of documents into an existing index: postings
    rows land in their pbucket partitions (append mode), df and stats
    contributions append as additional rows — the read path folds them
    (SUM), so incremental maintenance answers exactly like a full
    rebuild over the union (pinned).  Per-batch cost is O(batch
    tokens); the existing index is never read or rewritten.  (For
    at-least-once streaming delivery, wrap writes in the batch-scoped
    overwrite-subdirectory scheme of streaming/ingest.py — plain
    append is exactly-once only under batch orchestration.)"""
    ch = _chunk_stream(docs).persist()
    postings = (
        ch.select(
            "doc_id",
            "chunk_id",
            F.size("ctoks").alias("dl"),
            F.explode("ctoks").alias("term"),
        )
        .groupBy("term", "doc_id", "chunk_id", "dl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn("pbucket", hash32(F.col("term")) % N_PBUCKETS)
    )
    postings.write.mode("append").partitionBy("pbucket").parquet(
        index_dir + "/postings"
    )
    (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .withColumn("pbucket", hash32(F.col("term")) % N_PBUCKETS)
        .write.mode("append")
        .partitionBy("pbucket")
        .parquet(index_dir + "/df")
    )
    ch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ch"),
        F.sum(F.size("ctoks")).cast("bigint").alias("tot_dl"),
    ).coalesce(1).write.mode("append").parquet(index_dir + "/stats")
    ch.unpersist()


def bm25_from_index(
    spark: SparkSession,
    index_dir: str,
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k chunks for ``terms`` from the persisted index — reads only
    the terms' pbucket partitions, touches only their postings, and
    reproduces the one-pass scorer's floats exactly (fixed term-order
    addition over conditional-MAX tf pivots)."""
    # driver-side twin of hash32 (md5 first-8-hex) — same derivation as
    # the build path's Spark expression, no per-term Spark job
    pbuckets = sorted(
        {
            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
            % N_PBUCKETS
            for t in terms
        }
    )
    # reads go through the streaming tier's union-aware readers: the
    # partitioned base plus any batch-scoped increment subdirectories
    # (streaming/index.py).  With no increments this is exactly the
    # plain partition-pruned base read.
    from bigdatamlteamrepo_spark.streaming.index import read_index_table

    post = (
        read_index_table(spark, index_dir, "postings")
        .filter(F.col("pbucket").isin(pbuckets))
        .filter(F.col("term").isin(list(terms)))
    )
    # df and stats are FOLDED at read: each build/append/increment
    # contributes rows, and the fold makes incremental maintenance
    # exact — build(A∪B) ≡ build(A); append(B) (pinned in tests)
    dfs = (
        read_index_table(spark, index_dir, "df")
        .filter(F.col("pbucket").isin(pbuckets))
        .filter(F.col("term").isin(list(terms)))
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )
    stats = read_index_table(spark, index_dir, "stats").agg(
        F.sum("n_ch").cast("bigint").alias("n_ch"),
        F.sum("tot_dl").cast("bigint").alias("tot_dl"),
    )
    # pivot tf and df into fixed-order columns (conditional MAX — one
    # value per (chunk, term) by construction, so MAX is exact)
    tf_cols = [
        F.max(F.when(F.col("term") == w, F.col("tf"))).alias(f"tf_{i}")
        for i, w in enumerate(terms)
    ]
    per_chunk = post.groupBy("doc_id", "chunk_id", "dl").agg(*tf_cols)
    df_row = dfs.groupBy().agg(
        *[
            F.max(F.when(F.col("term") == w, F.col("df"))).alias(f"df_{i}")
            for i, w in enumerate(terms)
        ]
    )
    s = per_chunk.crossJoin(F.broadcast(stats)).crossJoin(
        F.broadcast(df_row)
    )
    avgdl = F.col("tot_dl").cast("double") / F.col("n_ch")
    score = None
    for i in range(len(terms)):
        tf = F.coalesce(F.col(f"tf_{i}"), F.lit(0)).cast("double")
        df_i = F.coalesce(F.col(f"df_{i}"), F.lit(0))
        idf = F.log(
            (F.col("n_ch") - df_i + 0.5) / (df_i + 0.5) + 1.0
        )
        term = (
            idf
            * tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("dl") / avgdl))
        )
        score = term if score is None else score + term
    return (
        s.select("doc_id", "chunk_id", score.alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"), F.asc("chunk_id"))
        .limit(k)
    )
