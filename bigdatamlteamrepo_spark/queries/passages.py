"""Passage-granularity dedup + per-document keyword extraction.

* **Exact passage dedup** (Lee et al. 2021, "Deduplicating Training
  Data Makes Language Models Better": exact substring dedup at ~50-token
  window granularity; adapted here to non-overlapping fixed-width token
  passages — the corpus has no sentence punctuation, so token windows
  ARE the honest passage unit).  A passage is duplicated when its exact
  token sequence appears in ≥ 2 distinct documents; the per-source
  report is the "how much of my corpus is boilerplate" audit that runs
  before near-dup LSH (exact passage hits are cheaper to find and
  account for most training-data memorization risk).

* **TF-IDF top-terms** (doc keyword extraction): the classic per-doc
  ranking, with the tf·idf score quantized to an exact integer BEFORE
  ranking (tf is an integer, idf is micro-quantized once per term), so
  the per-doc top-k cutoff can never be perturbed by float noise or
  cross-engine ULP differences — the same fixed-point discipline as the
  LM tier (queries/textmodel.py).

Scale shapes: passage dedup is one explode (corpus → corpus/W passage
rows) + one hash-keyed groupBy with map-side combine + one equi-join of
the passage stream against the (much smaller) duplicated-hash table;
TF-IDF is explode → (doc, term) count → term-df join (shuffle on term,
Zipf head handled by AQE) → per-doc window over per-doc-term rows.  No
stage is quadratic; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.text import tokenize
from bigdatamlteamrepo_spark.queries.registry import query
from bigdatamlteamrepo_spark.queries.text_dedup import _TOKENS_SQL

#: passage width in tokens (Lee et al. use 50-token windows at web
#: scale; 20 matches the synthetic corpus' ~50-token documents so the
#: driver corpus exercises multi-passage docs)
PASSAGE_W = 20
#: fixed-point scale for idf quantization (micro-nats, house rule)
_MICRO = 1_000_000

_PASSAGES_CTE = f"""
t AS (
  SELECT doc_id, source, {_TOKENS_SQL} AS toks FROM documents
),
p AS (
  SELECT doc_id, source,
         md5(array_to_string(
           toks[(i - 1) * {PASSAGE_W} + 1 : i * {PASSAGE_W}], ' ')) AS pkey
  FROM t, unnest(range(1, len(toks) // {PASSAGE_W} + 1)) AS u(i)
),
d AS (
  SELECT pkey, COUNT(DISTINCT doc_id) AS ndocs FROM p GROUP BY pkey
)
"""


@query(
    "passage_dedup_summary",
    bench=True,
    oracle=f"""
WITH {_PASSAGES_CTE}
SELECT p.source,
       COUNT(*) AS n_passages,
       CAST(SUM(CASE WHEN d.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_instances,
       CAST(COUNT(DISTINCT CASE WHEN d.ndocs >= 2 THEN p.doc_id END) AS BIGINT)
         AS n_docs_with_dup
FROM p JOIN d USING (pkey)
GROUP BY p.source
""",
)
def passage_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-passage duplication audit: how many
    {PASSAGE_W}-token passages exist, how many of their instances are
    cross-document duplicates (the passage's exact token sequence
    appears in ≥2 distinct docs), and how many docs carry at least one
    duplicated passage.

    Plan: ONE tokenize+chunk pass feeds the passage stream; the
    global passage-frequency table groups on the md5 passage key
    (map-side partial agg collapses repeats — at 100 TB the table is
    bounded by DISTINCT passages, Zipf-collapsed); the stream re-joins
    the frequency table on the same key (both sides hash-partitioned,
    one shuffle each) and rolls up per source.  Only hashes shuffle —
    never passage text."""
    return passage_dedup_stats(load_table(spark, sf_dir, "documents"))


def passage_keys(docs: DataFrame) -> DataFrame:
    """(doc_id, source, pkey) — md5 keys of the non-overlapping
    {PASSAGE_W}-token passages of every document.  One expression-only
    pass (tokenize → chunk → hash); works identically on a batch frame
    or a streaming source, which is what the incremental streaming
    probe (streaming/passages.py) relies on."""
    t = docs.select("doc_id", "source", tokenize("text").alias("toks"))
    return t.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size("toks") >= PASSAGE_W,
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.floor(F.size("toks") / PASSAGE_W).cast("int"),
                    ),
                    lambda i: F.md5(
                        F.concat_ws(
                            " ",
                            F.slice(
                                "toks", (i - 1) * PASSAGE_W + 1, F.lit(PASSAGE_W)
                            ),
                        )
                    ),
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
        ).alias("pkey"),
    )


def passage_dedup_stats(docs: DataFrame) -> DataFrame:
    """Core of :func:`passage_dedup_summary` over any (doc_id, source,
    text) frame — separated so property tests can drive it with
    generated corpora."""
    p = passage_keys(docs)
    d = p.groupBy("pkey").agg(F.countDistinct("doc_id").alias("ndocs"))
    j = p.join(d, "pkey")
    is_dup = F.col("ndocs") >= 2
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(is_dup.cast("int")).cast("bigint").alias("n_dup_instances"),
        F.countDistinct(F.when(is_dup, F.col("doc_id")))
        .cast("bigint")
        .alias("n_docs_with_dup"),
    )


@query(
    "doc_tfidf_top_terms",
    bench=True,
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
),
n AS (SELECT COUNT(*) AS n_docs FROM t WHERE len(toks) > 0),
td AS (
  SELECT doc_id, unnest(toks) AS term FROM t
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM td GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(*) AS df,
         CAST(round(ln(CAST(n.n_docs AS DOUBLE) / COUNT(*)) * {_MICRO})
              AS BIGINT) AS idf_micro
  FROM (SELECT DISTINCT doc_id, term FROM td) x CROSS JOIN n
  GROUP BY term, n.n_docs
),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * df.idf_micro AS BIGINT) AS tfidf_micro
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf_micro, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY tfidf_micro DESC, term) AS rnk
  FROM scored
) WHERE rnk <= 3
""",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — keyword extraction as pure
    relational algebra.  idf = ln(N/df) is micro-quantized ONCE per
    term (a BIGINT in the term table); the ranking key tf·idf_micro is
    then exact integer arithmetic, so the top-3 cutoff is deterministic
    under any partitioning and bit-identical across engines (ties break
    on the term string).

    Scale: the (doc, term) frame is the exploded corpus collapsed by
    one groupBy; the df/idf table is vocabulary-sized and joins on
    ``term`` (AQE broadcast at driver SFs, hash join with the Zipf head
    handled when the vocab outgrows the threshold); the top-3 window
    partitions by doc over per-doc-term rows."""
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


def tfidf_top_terms(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Core of :func:`doc_tfidf_top_terms` over any (doc_id, text)
    frame — separated so property tests can drive it with generated
    corpora."""
    t = docs.select("doc_id", tokenize("text").alias("toks"))
    td = t.filter(F.size("toks") > 0).select(
        "doc_id", F.explode("toks").alias("term")
    )
    n_docs = t.filter(F.size("toks") > 0).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tf = td.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        td.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("df")) * _MICRO
            )
            .cast("bigint")
            .alias("idf_micro"),
        )
    )
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        (F.col("tf") * F.col("idf_micro")).cast("bigint").alias("tfidf_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_micro"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= top_k)
    )
