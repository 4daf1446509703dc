"""Per-document Shannon entropy — the compression-proxy quality signal.

Low character- or token-entropy documents are the machine-generated /
keyboard-mash / template tail that rule-based filters (Gopher, C4) cut:
entropy approximates the document's compressibility without running a
compressor (H bits/symbol ≈ the best achievable code length).  Both the
character distribution (catches repeated-character junk regardless of
tokenization) and the token distribution (catches boilerplate loops of
valid words) are scored.

Float discipline (house rule, ``queries/textmodel.py``): each distinct
symbol's term  p·log2(p)  is computed by an identical row-local double
expression in both engines, quantized to micro-bits (BIGINT) BEFORE the
per-document sum — reduction order can never perturb a hash bit.

Scale shape: one explode per distribution (linear in corpus bytes), a
(doc, symbol) count with map-side combine, a per-doc sum of ≤|alphabet|
(chars) / ≤|doc vocab| (tokens) rows, one join of two doc-keyed frames.
No model table, no broadcast state — embarrassingly parallel.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.text import ensure_tokens
from bigdatamlteamrepo_spark.queries.registry import query
from bigdatamlteamrepo_spark.queries.text_dedup import _TOKENS_SQL, _with_tokens

#: fixed-point scale: 1 micro-bit resolution before per-doc summation
MICRO = 1_000_000
#: ln(2) as the exact double both engines produce for log-base change
_LN2 = math.log(2.0)

_ENTROPY_ORACLE = f"""
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS sym FROM documents
),
cc AS (
  SELECT doc_id, sym, COUNT(*) AS c FROM ch GROUP BY doc_id, sym
),
cn AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_distinct
  FROM cc GROUP BY doc_id
),
cterm AS (
  SELECT cc.doc_id,
         CAST(round((CAST(cc.c AS DOUBLE) / cn.n)
                    * (ln(CAST(cc.c AS DOUBLE) / cn.n) / ln(2))
                    * {MICRO}) AS BIGINT) AS t_micro
  FROM cc JOIN cn USING (doc_id)
),
char_h AS (
  SELECT cterm.doc_id,
         CAST(-SUM(t_micro) AS BIGINT) AS char_h_micro
  FROM cterm GROUP BY cterm.doc_id
),
tk AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS sym FROM documents
),
tc AS (
  SELECT doc_id, sym, COUNT(*) AS c FROM tk GROUP BY doc_id, sym
),
tn AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_distinct
  FROM tc GROUP BY doc_id
),
tterm AS (
  SELECT tc.doc_id,
         CAST(round((CAST(tc.c AS DOUBLE) / tn.n)
                    * (ln(CAST(tc.c AS DOUBLE) / tn.n) / ln(2))
                    * {MICRO}) AS BIGINT) AS t_micro
  FROM tc JOIN tn USING (doc_id)
),
tok_h AS (
  SELECT tterm.doc_id,
         CAST(-SUM(t_micro) AS BIGINT) AS tok_h_micro
  FROM tterm GROUP BY tterm.doc_id
)
SELECT cn.doc_id,
       cn.n AS n_chars,
       cn.n_distinct AS n_distinct_chars,
       char_h.char_h_micro AS char_h_micro,
       round(CAST(char_h.char_h_micro AS DOUBLE) / {MICRO}, 6)
         AS char_entropy_bits,
       tn.n AS n_tokens,
       tn.n_distinct AS n_distinct_tokens,
       tok_h.tok_h_micro AS tok_h_micro,
       round(CAST(tok_h.tok_h_micro AS DOUBLE) / {MICRO}, 6)
         AS token_entropy_bits
FROM cn
JOIN char_h ON cn.doc_id = char_h.doc_id
JOIN tn ON cn.doc_id = tn.doc_id
JOIN tok_h ON cn.doc_id = tok_h.doc_id
"""


def entropy_from_counts(
    cc: DataFrame, keys: list[str], prefix: str
) -> DataFrame:
    """Entropy of a (keys..., sym, c) COUNT table — the additive
    sufficient statistic form, so streaming monitors can fold counts
    across micro-batches and compute the same entropy from the folded
    state (``streaming/drift.py::source_entropy_snapshot``)."""
    cn = cc.groupBy(*keys).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(p * (F.log(p) / F.lit(_LN2)) * MICRO).cast("bigint")
    return (
        cc.join(cn, keys)
        .select(*keys, "n", "n_distinct", term.alias("t_micro"))
        .groupBy(*keys, "n", "n_distinct")
        .agg((-F.sum("t_micro")).cast("bigint").alias("h_micro"))
        .select(
            *keys,
            F.col("n").alias(f"{prefix}_n"),
            F.col("n_distinct").alias(f"{prefix}_distinct"),
            F.col("h_micro").alias(f"{prefix}_h_micro"),
        )
    )


def _dist_entropy(sym: DataFrame, prefix: str) -> DataFrame:
    """(doc_id, {prefix}_n, {prefix}_distinct, {prefix}_h_micro) from an
    exploded (doc_id, sym) stream."""
    cc = sym.groupBy("doc_id", "sym").agg(F.count(F.lit(1)).alias("c"))
    return entropy_from_counts(cc, ["doc_id"], prefix)


@query("doc_entropy_profile", oracle=_ENTROPY_ORACLE)
def doc_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character- and token-level Shannon entropy per document, in
    exact micro-bits plus a rounded bits/symbol column — the
    compressibility proxy quality filters threshold on.  See module
    docstring for the float discipline and distributed shape."""
    docs = _with_tokens(spark, sf_dir)
    ch = _dist_entropy(
        docs.select("doc_id", F.explode(F.split("text", "")).alias("sym")),
        "char",
    )
    tk = _dist_entropy(
        ensure_tokens(docs, "doc_id").select(
            "doc_id", F.explode("toks").alias("sym")
        ),
        "tok",
    )
    return ch.join(tk, "doc_id").select(
        "doc_id",
        F.col("char_n").alias("n_chars"),
        F.col("char_distinct").alias("n_distinct_chars"),
        F.col("char_h_micro"),
        F.round(F.col("char_h_micro").cast("double") / MICRO, 6).alias(
            "char_entropy_bits"
        ),
        F.col("tok_n").alias("n_tokens"),
        F.col("tok_distinct").alias("n_distinct_tokens"),
        F.col("tok_h_micro"),
        F.round(F.col("tok_h_micro").cast("double") / MICRO, 6).alias(
            "token_entropy_bits"
        ),
    )
