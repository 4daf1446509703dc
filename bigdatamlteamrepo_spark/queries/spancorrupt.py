"""T5 span-corruption pretraining pairs — deterministic, distributed.

The reference fine-tunes T5 (model.py:137-200); T5's PRE-training
objective is span corruption (Raffel et al. 2020 §3.1.4): mask ~15% of
tokens in contiguous spans (mean length 3), replace each span with a
sentinel in the input, and emit ``sentinel + dropped tokens`` as the
target.  This module is that data-prep stage as an engine query.

Determinism (the cross-engine contract): instead of sampling spans with
an RNG, positions are partitioned into fixed blocks of ``BLOCK`` = 20
tokens; every FULL block contributes exactly one ``SPAN`` = 3-token
span whose offset within the block is ``md5(doc_id:block) % 18`` — the
same portable-hash idiom as ``queries/shards.py:hash32``.  Corruption
rate is exactly SPAN/BLOCK = 15% over full blocks, spans can never
overlap (one per block), and both engines compute the identical mask
from pure integer arithmetic — no RNG, no UDF, no row-order
sensitivity.  Real trainers randomize span lengths; the fixed-length
deterministic variant preserves every pipeline-relevant property
(rate, non-overlap, sentinel bookkeeping, length accounting) while
staying oracle-checkable.

Scale shape: one posexplode over tokens (linear), all mask decisions
row-local, one per-doc aggregation; the pair-construction query
confines the string assembly to a deterministic ~2% doc sample behind a
pushed hash filter.  At 100 TB this is a single map-side pass plus one
doc-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.text import ensure_tokens
from bigdatamlteamrepo_spark.queries.registry import query
from bigdatamlteamrepo_spark.queries.shards import hash32
from bigdatamlteamrepo_spark.queries.text_dedup import _TOKENS_SQL, _with_tokens

#: block width: every full block of 20 tokens yields one span
BLOCK = 20
#: span length (BLOCK/SPAN = the canonical 15% corruption rate)
SPAN = 3
#: modulus for the in-block span offset (keeps the span inside a block)
OFF_MOD = BLOCK - SPAN + 1  # 18
#: keep 1-in-K docs in the pair-construction sample
PAIR_SAMPLE_MOD = 50

_HASH = "('0x' || substr(md5({expr}), 1, 8))::BIGINT"

_POS_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
),
pos AS (
  SELECT doc_id, len(toks) AS n,
         unnest(list_transform(range(1, len(toks) + 1),
                               i -> {{'p': i, 'tok': toks[i]}})) AS u
  FROM t
),
mm AS (
  SELECT doc_id, n, u.p AS p, u.tok AS tok,
         (u.p - 1) // {BLOCK} AS blk,
         (u.p - 1) % {BLOCK} AS pib,
         {_HASH.format(expr=f"doc_id || ':' || ((u.p - 1) // {BLOCK})")}
           % {OFF_MOD} AS h
  FROM pos
),
mk AS (
  SELECT doc_id, n, p, tok, blk, pib, h,
         ((blk + 1) * {BLOCK} <= n AND pib >= h AND pib < h + {SPAN})
           AS masked
  FROM mm
)
"""

_STATS_ORACLE = (
    _POS_SQL
    + f"""
SELECT doc_id,
       n AS n_tokens,
       n // {BLOCK} AS n_spans,
       CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       n - (n // {BLOCK}) * {SPAN} + (n // {BLOCK}) AS input_len,
       (n // {BLOCK}) * {SPAN} + (n // {BLOCK}) + 1 AS target_len,
       CAST(SUM(CASE WHEN masked THEN {_HASH.format(expr="tok")}
                ELSE 0 END) AS BIGINT) AS masked_hash_sum
FROM mk GROUP BY doc_id, n
"""
)


def _positions(docs: DataFrame) -> DataFrame:
    """(doc_id, n, p, tok, blk, pib, h, masked) — one row per token
    position with the row-local deterministic mask decision."""
    t = ensure_tokens(docs, "doc_id")
    pos = t.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.posexplode("toks").alias("p0", "tok"),
    ).select(
        "doc_id",
        "n",
        (F.col("p0") + 1).alias("p"),
        "tok",
        (F.col("p0") / BLOCK).cast("bigint").alias("blk"),
        (F.col("p0") % BLOCK).alias("pib"),
    )
    h = (
        hash32(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("blk").cast("string"),
            )
        )
        % OFF_MOD
    )
    return pos.withColumn("h", h).withColumn(
        "masked",
        ((F.col("blk") + 1) * BLOCK <= F.col("n"))
        & (F.col("pib") >= F.col("h"))
        & (F.col("pib") < F.col("h") + SPAN),
    )


@query("t5_span_corruption_stats", bench=True, oracle=_STATS_ORACLE)
def t5_span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document span-corruption accounting: span/mask counts, the
    exact encoder/decoder sequence lengths a trainer must budget for
    (input = kept tokens + one sentinel per span; target = masked
    tokens + sentinels + EOS), and a portable-hash checksum over the
    MASKED tokens — the checksum only matches if both engines selected
    the exact same token positions, making this a content-level pin of
    the mask, not just its size."""
    mk = _positions(_with_tokens(spark, sf_dir))
    n_spans = (F.col("n") / BLOCK).cast("bigint")
    return (
        mk.groupBy("doc_id", "n")
        .agg(
            F.sum(F.col("masked").cast("bigint")).alias("n_masked"),
            F.sum(
                F.when(F.col("masked"), hash32(F.col("tok"))).otherwise(0)
            )
            .cast("bigint")
            .alias("masked_hash_sum"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            n_spans.alias("n_spans"),
            "n_masked",
            (F.col("n") - n_spans * SPAN + n_spans).alias("input_len"),
            (n_spans * SPAN + n_spans + F.lit(1)).alias("target_len"),
            "masked_hash_sum",
        )
    )


_PAIRS_ORACLE = (
    _POS_SQL
    + f"""
, sampled AS (
  SELECT * FROM mk
  WHERE {_HASH.format(expr="CAST(doc_id AS VARCHAR)")} % {PAIR_SAMPLE_MOD} = 0
),
pieces AS (
  SELECT doc_id, p,
         CASE WHEN NOT masked THEN tok
              WHEN pib = h THEN '<extra_id_' || blk || '>'
              ELSE NULL END AS in_piece,
         CASE WHEN masked AND pib = h
                THEN '<extra_id_' || blk || '> ' || tok
              WHEN masked THEN tok
              ELSE NULL END AS tgt_piece
  FROM sampled
)
SELECT doc_id,
       coalesce(string_agg(in_piece, ' ' ORDER BY p), '') AS input_text,
       -- short docs (< one full block) have no spans: empty target,
       -- matching Spark's array_join over an empty piece array
       coalesce(string_agg(tgt_piece, ' ' ORDER BY p), '') AS target_text
FROM pieces GROUP BY doc_id
"""
)


@query("t5_span_corruption_pairs", oracle=_PAIRS_ORACLE)
def t5_span_corruption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized (input_text, target_text) training pairs for a
    deterministic 1-in-{PAIR_SAMPLE_MOD} doc sample: spans replaced by
    ``<extra_id_K>`` sentinels in the input, targets listing each
    sentinel followed by its dropped tokens — byte-identical in both
    engines.  The sample filter is a row-local hash pushed below the
    explode, so the string assembly never touches 98% of the corpus;
    the full-corpus variant is the same plan feeding a parquet sink."""
    mk = _positions(_with_tokens(spark, sf_dir)).filter(
        hash32(F.col("doc_id")) % PAIR_SAMPLE_MOD == 0
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("blk").cast("string"), F.lit(">"))
    in_piece = (
        F.when(~F.col("masked"), F.col("tok"))
        .when(F.col("pib") == F.col("h"), sentinel)
        .otherwise(F.lit(None))
    )
    tgt_piece = (
        F.when(
            F.col("masked") & (F.col("pib") == F.col("h")),
            F.concat(sentinel, F.lit(" "), F.col("tok")),
        )
        .when(F.col("masked"), F.col("tok"))
        .otherwise(F.lit(None))
    )
    pieces = mk.select("doc_id", "p", in_piece.alias("i"), tgt_piece.alias("g"))

    def _joined(col: str):
        arr = F.array_sort(
            F.collect_list(F.struct(F.col("p"), F.col(col).alias("piece")))
        )
        kept = F.filter(arr, lambda s: s.piece.isNotNull())
        return F.array_join(F.transform(kept, lambda s: s.piece), " ")

    return pieces.groupBy("doc_id").agg(
        _joined("i").alias("input_text"),
        _joined("g").alias("target_text"),
    )


# render the module constant into the registered docstring (plain
# string, not an f-string — an f-string first statement binds no __doc__)
t5_span_corruption_pairs.__doc__ = t5_span_corruption_pairs.__doc__.format(
    PAIR_SAMPLE_MOD=PAIR_SAMPLE_MOD
)
