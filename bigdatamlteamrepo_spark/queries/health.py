"""Corpus/embedding health diagnostics + the token-budget epoch planner.

The monitoring-and-planning tier a 100 TB pretraining pipeline runs
*around* the curation stages: decide exactly how many epochs of each
source a token budget buys (closed-form water-filling, no iteration),
watch per-source distribution drift against the corpus (KL/JS over the
unigram stream), and health-check the embedding corpus (per-dimension
collapse, anisotropy to the centroid) before ANN/semantic-dedup stages
trust it.

Scale design notes (shapes that survive 1000 executors):

* ``epoch_mixture_plan`` aggregates the corpus ONCE to a per-source
  frame (≤ thousands of rows), then solves the capped water-filling
  allocation entirely with window functions over that tiny frame —
  the classic iterative cap-and-redistribute fixpoint has a closed
  form when sources are sorted by ``cap/weight``: after capping the
  k cheapest-to-cap sources the shared level is
  ``λ_k = (B − Σcap_{≤k}) / (W − Σw_{≤k})``, and the fixpoint is
  ``λ* = max_k λ_k`` (verified against the iterative fixpoint on
  2000 random instances; exact when ``B ≤ Σcap``, which
  ``MAX_EPOCHS > BUDGET_MULT`` guarantees).  One corpus scan, one
  tiny-key shuffle, zero driver loops.
* ``source_unigram_divergence`` shuffles the exploded token stream
  once into (source, token) counts, joins token-level corpus counts
  (vocab-sized, Zipf-collapsed — orders of magnitude smaller than the
  corpus), and reduces per source.  The JS sum over tokens *absent*
  from a source is folded in closed form via the source's covered
  corpus mass (an exact BIGINT sum), so no source×vocab fan-out ever
  materializes.
* ``embedding_dim_stats`` / ``embedding_health_summary`` run on the
  exploded (vector, dim) stream — n×d rows, linear — with all sums in
  **exact binary fixed-point**: values scaled by 2^20 and floored
  (float×2^k is exact IEEE, floor has no round-half ambiguity), then
  summed as BIGINTs (order-free).  At 100 TB the BIGINT sums become
  DECIMAL(38,0) (the documented overflow headroom per column is in
  each docstring); everything else is unchanged.

Reference parity: the reference has no monitoring tier (its corpus
fits a notebook); this extends its train/test-split determinism
philosophy (model.py:114-116) to budget planning and drift auditing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.numeric import dsum, dsum_expr
from bigdatamlteamrepo_spark.functions.text import tokenize
from bigdatamlteamrepo_spark.queries.registry import PRI_EXTRA, query
from bigdatamlteamrepo_spark.queries.shards import MIX_ALPHA
from bigdatamlteamrepo_spark.queries.text_dedup import _TOKENS_SQL

#: token budget as a multiple of the corpus token mass (B = mult × T).
#: A budget below 1.0 means subsampling everything; above 1.0 means the
#: tempered mixture wants multiple epochs of the small sources.
BUDGET_MULT = 2.0
#: hard per-source epoch cap — no source repeats more than this many
#: times regardless of its mixture weight (repetition hurts past a few
#: epochs; the cap is what makes the allocation a water-filling problem).
#: MUST stay > BUDGET_MULT so Σcap = MAX_EPOCHS·T > B and the closed
#: form is total (asserted in tests).
MAX_EPOCHS = 4.0

#: binary fixed-point scale for embedding values: float × 2^20 is an
#: EXACT IEEE operation (power-of-two scaling), and floor() of an exact
#: value has no round-half-tie ambiguity between engines — unlike the
#: decimal ×1e6 quantization (textmodel.py), which is reserved for
#: ln/exp-derived doubles where exact ties are measure-zero.
_Q = 1 << 20
#: coarser scale for per-row derived scalars (cosine, norm)
_QC = 1 << 30
#: centroid-sum down-shift: dim-sums are floored to s/2^10 before the
#: integer dot product so |q·sc| stays far from BIGINT overflow (see
#: embedding_health_summary docstring for the headroom arithmetic)
_QS = 1 << 10

_LN2 = 0.6931471805599453


# --------------------------------------------------------------------------
# Token-budget epoch planner: closed-form capped water-filling.
# --------------------------------------------------------------------------


@query(
    "epoch_mixture_plan",
    oracle=f"""
WITH t AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT *,
         pow(CAST(total_tokens AS DOUBLE), {MIX_ALPHA}) AS raw_w,
         {MAX_EPOCHS} * CAST(total_tokens AS DOUBLE) AS cap_tokens
  FROM t
),
g AS (
  SELECT *,
         SUM(raw_w) OVER () AS w_tot,
         {BUDGET_MULT} * SUM(CAST(total_tokens AS DOUBLE)) OVER () AS budget,
         cap_tokens / raw_w AS cap_ratio,
         ROW_NUMBER() OVER (ORDER BY cap_tokens / raw_w, source) AS rn,
         COUNT(*) OVER () AS n_src,
         SUM(cap_tokens) OVER (ORDER BY cap_tokens / raw_w, source
                               ROWS UNBOUNDED PRECEDING) AS cum_cap,
         SUM(raw_w) OVER (ORDER BY cap_tokens / raw_w, source
                          ROWS UNBOUNDED PRECEDING) AS cum_w
  FROM w
),
lam AS (
  SELECT *,
         greatest(
           budget / w_tot,
           MAX(CASE WHEN rn < n_src
                    THEN (budget - cum_cap) / (w_tot - cum_w) END) OVER ()
         ) AS water_level
  FROM g
)
SELECT source, n_docs, total_tokens,
       raw_w / w_tot AS mix_weight,
       least(water_level * raw_w, cap_tokens) AS alloc_tokens,
       least(water_level * raw_w, cap_tokens)
         / CAST(total_tokens AS DOUBLE) AS epochs,
       least(water_level * raw_w, cap_tokens) / budget AS alloc_share,
       CAST(CASE WHEN water_level * raw_w >= cap_tokens
                 THEN 1 ELSE 0 END AS INT) AS capped
FROM lam
""",
)
def epoch_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token allocation under a global budget and a
    per-source epoch cap — the "how many epochs of each source" table a
    training run consumes.

    Allocation = capped water-filling: maximize tempered-mixture
    fidelity (alloc ∝ tokens^α) subject to ``Σ alloc = B`` and
    ``alloc_s ≤ MAX_EPOCHS·tokens_s``.  Solved in closed form over the
    per-source frame: sort by ``cap/weight`` ascending, take running
    sums, and the fixpoint water level is the max over prefixes of
    ``(B − Σcap)/(W − Σw)`` (the level after capping that prefix).
    Every arithmetic step is a window function over ≤ thousands of
    rows; the corpus is touched by exactly one grouped count.

    Double determinism: both engines compute the same IEEE expressions
    in the same order — the running sums run over the identical
    ``(cap_ratio, source)`` ordering (ratio is 4·√tokens, monotone in
    tokens; source breaks exact ties), and MAX/GREATEST are
    order-free.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = (
        docs.withColumn("n_tokens", F.size(tokenize("text")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .withColumn("raw_w", F.pow(F.col("total_tokens").cast("double"), MIX_ALPHA))
        .withColumn(
            "cap_tokens", F.lit(MAX_EPOCHS) * F.col("total_tokens").cast("double")
        )
        .withColumn("cap_ratio", F.col("cap_tokens") / F.col("raw_w"))
    )
    all_w = Window.partitionBy()
    order = Window.orderBy("cap_ratio", "source")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = t.select(
        "*",
        F.sum("raw_w").over(all_w).alias("w_tot"),
        (F.lit(BUDGET_MULT) * F.sum(F.col("total_tokens").cast("double")).over(all_w)).alias(
            "budget"
        ),
        F.row_number().over(order).alias("rn"),
        F.count(F.lit(1)).over(all_w).alias("n_src"),
        F.sum("cap_tokens").over(run).alias("cum_cap"),
        F.sum("raw_w").over(run).alias("cum_w"),
    )
    lam_prefix = F.max(
        F.when(
            F.col("rn") < F.col("n_src"),
            (F.col("budget") - F.col("cum_cap")) / (F.col("w_tot") - F.col("cum_w")),
        )
    ).over(all_w)
    g = g.withColumn(
        "water_level", F.greatest(F.col("budget") / F.col("w_tot"), lam_prefix)
    )
    alloc = F.least(
        F.col("water_level") * F.col("raw_w"), F.col("cap_tokens")
    )
    return g.select(
        "source",
        "n_docs",
        "total_tokens",
        (F.col("raw_w") / F.col("w_tot")).alias("mix_weight"),
        alloc.alias("alloc_tokens"),
        (alloc / F.col("total_tokens").cast("double")).alias("epochs"),
        (alloc / F.col("budget")).alias("alloc_share"),
        F.when(F.col("water_level") * F.col("raw_w") >= F.col("cap_tokens"), 1)
        .otherwise(0)
        .cast("int")
        .alias("capped"),
    )


# --------------------------------------------------------------------------
# Per-source distribution drift vs the corpus: unigram KL + JS.
# --------------------------------------------------------------------------


@query(
    "source_unigram_divergence",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest({_TOKENS_SQL}) AS token FROM documents
),
st AS (
  SELECT source, token, COUNT(*) AS c_st FROM tok GROUP BY source, token
),
ct AS (
  SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY token
),
totals AS (
  SELECT CAST(SUM(c_t) AS BIGINT) AS t_all FROM ct
),
src_tot AS (
  SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s,
         COUNT(*) AS n_distinct
  FROM st GROUP BY source
),
terms AS (
  SELECT st.source,
         CAST(st.c_st AS DOUBLE) / s.t_s AS p,
         CAST(ct.c_t AS DOUBLE) / totals.t_all AS q,
         ct.c_t
  FROM st
  JOIN ct ON st.token = ct.token
  JOIN src_tot s ON st.source = s.source
  CROSS JOIN totals
)
SELECT t.source,
       s.t_s AS n_tokens,
       CAST(s.n_distinct AS BIGINT) AS n_distinct_tokens,
       CAST(SUM(t.c_t) AS BIGINT) AS covered_corpus_tokens,
       {dsum_expr('t.p * ln(t.p / t.q)', 12, 30)} AS kl_nats,
       {dsum_expr(
           '0.5 * (t.p * ln(2.0 * t.p / (t.p + t.q)) '
           '+ t.q * ln(2.0 * t.q / (t.p + t.q)))', 12, 30)}
         + 0.5 * {_LN2}
           * (1.0 - CAST(SUM(t.c_t) AS DOUBLE) / MAX(tt.t_all)) AS js_nats
FROM terms t
JOIN src_tot s ON t.source = s.source
CROSS JOIN totals tt
GROUP BY t.source, s.t_s, s.n_distinct
""",
)
def source_unigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-distribution drift vs the whole corpus:
    KL(P_source ‖ P_corpus) and Jensen–Shannon divergence, in nats.

    The JS sum runs only over tokens *present* in the source: for the
    absent tail, p = 0 and each term degenerates to ``½·q·ln 2``, so
    the whole tail folds to ``½·ln2·(1 − covered_mass)`` where
    covered_mass is an exact BIGINT sum of corpus counts over the
    source's vocabulary.  No source×vocab fan-out; the big shuffles are
    the (source, token) count and the vocab-sized token join.

    KL is finite by construction (source support ⊆ corpus support —
    the reference IS the corpus here; the frame-parameterized core
    :func:`unigram_divergence_against_ref` handles novel tokens for
    the streaming drift monitor).  ln-derived term sums go through the
    decimal dsum convention (order-free, scale 12 for the
    ~1e-6-sized terms).

    At 100 TB: the (source, token) frame is Zipf-collapsed (vocab ≪
    corpus), the token join keys are high-cardinality (no skew beyond
    the Zipf head, which AQE splits), and the final reduce is one row
    per source.
    """
    docs = load_table(spark, sf_dir, "documents")
    st = unigram_counts(docs)
    ct = st.groupBy("token").agg(F.sum("c_st").cast("bigint").alias("c_t"))
    return unigram_divergence_against_ref(st, ct).select(
        "source",
        "n_tokens",
        "n_distinct_tokens",
        "covered_corpus_tokens",
        "kl_nats",
        "js_nats",
    )


def unigram_counts(docs: DataFrame) -> DataFrame:
    """(source, token, c_st) unigram counts of a documents frame — the
    additive sufficient statistic the drift monitor folds per batch."""
    return (
        docs.select("source", F.explode(tokenize("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_st"))
    )


def unigram_divergence_against_ref(st: DataFrame, ref: DataFrame) -> DataFrame:
    """Per-source KL/JS of ``st`` (source, token, c_st) against a
    reference distribution ``ref`` (token, c_t) — the shared core of
    the registered corpus query and the streaming drift monitor.

    Tokens absent from the reference ("novel") would make KL infinite;
    the standard monitoring semantics apply: KL is reported over the
    ref-covered tokens only, while JS stays *exact* — a novel token's
    term degenerates to ``½·p·ln 2``, so the whole novel tail folds to
    ``½·ln2·(novel_mass_s / T_s)`` with novel_mass an exact BIGINT
    sum.  ``novel_tokens`` / ``novel_token_mass`` are emitted so a
    monitor can alert on them directly.
    """
    totals = ref.agg(F.sum("c_t").cast("bigint").alias("t_all"))
    src_tot = st.groupBy("source").agg(
        F.sum("c_st").cast("bigint").alias("t_s"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    terms = (
        st.join(ref, "token", "left")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "source",
            "t_s",
            "n_distinct",
            "t_all",
            "c_st",
            (F.col("c_st").cast("double") / F.col("t_s")).alias("p"),
            (F.col("c_t").cast("double") / F.col("t_all")).alias("q"),
            "c_t",
        )
    )
    p, q = F.col("p"), F.col("q")
    covered = F.col("c_t").isNotNull()
    js_present = 0.5 * (
        p * F.log(2.0 * p / (p + q)) + q * F.log(2.0 * q / (p + q))
    )
    zero = F.lit(0.0)
    return (
        terms.groupBy("source", "t_s", "n_distinct")
        .agg(
            F.sum("c_t").cast("bigint").alias("covered_corpus_tokens"),
            F.sum(F.when(~covered, 1).otherwise(0)).cast("bigint").alias(
                "novel_tokens"
            ),
            F.sum(F.when(~covered, F.col("c_st")).otherwise(0))
            .cast("bigint")
            .alias("novel_token_mass"),
            dsum(F.when(covered, p * F.log(p / q)).otherwise(zero), 12, 30).alias(
                "kl_nats"
            ),
            dsum(F.when(covered, js_present).otherwise(zero), 12, 30).alias(
                "js_present"
            ),
            F.max("t_all").alias("t_all"),
        )
        .select(
            "source",
            F.col("t_s").alias("n_tokens"),
            F.col("n_distinct").cast("bigint").alias("n_distinct_tokens"),
            "covered_corpus_tokens",
            "novel_tokens",
            "novel_token_mass",
            "kl_nats",
            (
                F.col("js_present")
                + 0.5
                * _LN2
                * (
                    1.0
                    - F.col("covered_corpus_tokens").cast("double")
                    / F.col("t_all")
                )
                + 0.5
                * _LN2
                * (F.col("novel_token_mass").cast("double") / F.col("t_s"))
            ).alias("js_nats"),
        )
    )


# --------------------------------------------------------------------------
# Model-based quality scores (rows-only driver face of ml/quality.py).
# --------------------------------------------------------------------------


@query("doc_quality_model_scores", priority=PRI_EXTRA)
def doc_quality_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the CCNet-style quality classifier (ml/quality.py: n-gram
    CountVectorizer + weighted LR on Gopher pseudo-labels) on the
    deterministic 4/5 split and score the 1/5 holdout through the
    pure-expression path (broadcast (term, weight) join — no vectors,
    no UDFs at scoring time).

    Rows-only by design: LBFGS coefficient values are partitioning-
    sensitive at the ULP level, so there is no cross-engine value
    oracle; the expression path is pinned ≡ the MLlib transform (and
    the model's holdout AUC floor asserted) in tests/test_ml_quality.py.
    Registered at the demoted priority so it never occupies a driver
    correctness-window slot (rows-only rows read as non-green — the
    r03 ann_ivf_topk lesson)."""
    from bigdatamlteamrepo_spark.ml.quality import (
        holdout_split,
        score_documents_expr,
        train_quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    train, hold = holdout_split(docs)
    # MLlib refuses an empty fit ("nothing added to this summarizer");
    # no data -> no model -> nothing scored (limit(1) probe, the
    # pq_codebooks_kmeans discipline)
    if train.select("doc_id").limit(1).count() == 0:
        return spark.createDataFrame([], "doc_id bigint, quality_prob double")
    return score_documents_expr(train_quality_classifier(train), hold)


# --------------------------------------------------------------------------
# Embedding-corpus health: per-dimension stats (collapse detection).
# --------------------------------------------------------------------------

_EX_SQL = f"""
  SELECT label, vec_id, CAST(i - 1 AS INT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {_Q}) AS BIGINT) AS qv,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
"""


@query(
    "embedding_dim_stats",
    oracle=f"""
WITH ex AS ({_EX_SQL})
SELECT dim,
       COUNT(*) AS n_vecs,
       CAST(SUM(qv) AS BIGINT) AS sum_q,
       CAST(CAST(SUM(qv) AS DOUBLE) / COUNT(*) / {_Q} AS DOUBLE) AS mean_val,
       sqrt(greatest(
         (CAST(SUM(qv * qv) AS DOUBLE) / COUNT(*)
          - (CAST(SUM(qv) AS DOUBLE) / COUNT(*))
            * (CAST(SUM(qv) AS DOUBLE) / COUNT(*)))
           / ({_Q} * CAST({_Q} AS DOUBLE)),
         0.0)) AS std_val,
       MIN(v) AS min_val,
       MAX(v) AS max_val
FROM ex GROUP BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std/min/max over the embedding corpus — the
    dimension-collapse detector (a dim with std ≈ 0 carries no signal;
    a dim with runaway magnitude dominates every L2/cosine decision).

    Exactness: each float is scaled by 2^20 (exact — power-of-two
    multiply) and floored (no round-half tie), then all moments are
    BIGINT sums — order-free, so Spark's partial-agg tree and the
    single-threaded oracle agree bit-for-bit.  Variance/std are derived
    per group from the integer moments in one fixed IEEE expression.

    Overflow headroom: |qv| ≤ 2^20·max|v|; with unit-scale embeddings
    qv² ≈ 2^40/4, so BIGINT sums hold ~2^21 ≈ 2M vectors per dim.  At
    100 TB swap the two moment sums to DECIMAL(38,0) (exact, +28 bits
    of headroom) — nothing downstream changes.

    Plan: one scan, explode to n×d rows, one hash agg keyed by the
    64-value ``dim`` — d tiny groups of perfectly balanced size, no
    skew, map-side partial aggregation takes the shuffle to d rows per
    task.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "v_f")
    ).select(
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v_f").cast("double") * _Q).cast("bigint").alias("qv"),
        F.col("v_f").cast("double").alias("v"),
    )
    n = F.count(F.lit(1))
    sum_q = F.sum("qv").cast("bigint")
    sum_q2 = F.sum(F.col("qv") * F.col("qv")).cast("bigint")
    g = ex.groupBy("dim").agg(
        n.alias("n_vecs"),
        sum_q.alias("sum_q"),
        sum_q2.alias("sum_q2"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
    mean_q = F.col("sum_q").cast("double") / F.col("n_vecs")
    var_q = (
        F.col("sum_q2").cast("double") / F.col("n_vecs") - mean_q * mean_q
    ) / (_Q * float(_Q))
    return g.select(
        "dim",
        "n_vecs",
        "sum_q",
        (mean_q / _Q).cast("double").alias("mean_val"),
        F.sqrt(F.greatest(var_q, F.lit(0.0))).alias("std_val"),
        "min_val",
        "max_val",
    )


# --------------------------------------------------------------------------
# Embedding-corpus health: anisotropy / norm summary per label.
# --------------------------------------------------------------------------


@query(
    "embedding_health_summary",
    oracle=f"""
WITH ex AS ({_EX_SQL}),
dimsum AS (
  SELECT dim, CAST(floor(CAST(SUM(qv) AS DOUBLE) / {_QS}) AS BIGINT) AS sc
  FROM ex GROUP BY dim
),
centroid_norm AS (
  SELECT CAST(SUM(sc * sc) AS BIGINT) AS norm_c FROM dimsum
),
per_vec AS (
  SELECT ex.label, ex.vec_id,
         CAST(SUM(ex.qv * d.sc) AS BIGINT) AS dot_c,
         CAST(SUM(ex.qv * ex.qv) AS BIGINT) AS norm_v
  FROM ex JOIN dimsum d ON ex.dim = d.dim
  GROUP BY ex.label, ex.vec_id
),
scored AS (
  SELECT label,
         CAST(dot_c AS DOUBLE)
           / (sqrt(CAST(norm_v AS DOUBLE)) * sqrt(CAST(cn.norm_c AS DOUBLE)))
           AS cos_c,
         sqrt(CAST(norm_v AS DOUBLE)) / {_Q} AS norm_d
  FROM per_vec CROSS JOIN centroid_norm cn
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(CAST(SUM(CAST(floor(cos_c * {_QC}) AS BIGINT)) AS DOUBLE)
            / COUNT(*) / {_QC} AS DOUBLE) AS mean_cos_centroid,
       MIN(cos_c) AS min_cos_centroid,
       MAX(cos_c) AS max_cos_centroid,
       CAST(CAST(SUM(CAST(floor(norm_d * {_QC}) AS BIGINT)) AS DOUBLE)
            / COUNT(*) / {_QC} AS DOUBLE) AS mean_norm
FROM scored GROUP BY label
""",
)
def embedding_health_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy + norm health per label: mean/min/max cosine of each
    vector to the *global* centroid direction, and mean L2 norm.

    A healthy embedding space for cosine-based dedup/ANN has mean
    centroid-cosine near 0 (isotropic); values near 1 mean the space
    has collapsed toward a dominant direction and cosine thresholds
    stop discriminating (the check SemDeDup/ANN stages should run
    before trusting their thresholds).

    Exact distributed arithmetic: cosine is scale-invariant, so the
    centroid is represented by the per-dim BIGINT *sums* (∝ mean — no
    division, no rounding), down-shifted by 2^10 so every per-vector
    integer dot product ``Σ qv·sc`` stays far below BIGINT range
    (|qv|·|sc| ≤ 2^20·2^19 per term at driver scale; DECIMAL(38,0) at
    100 TB).  The only per-row doubles are the final cos/norm, derived
    from integers by one fixed expression, then floored to 2^-30 grid
    before the order-free BIGINT mean-sum.

    Plan: two passes over the exploded stream — a 64-row dim-sum agg
    (broadcast back), then a per-vector agg keyed by vec_id.  Both
    shuffles are hash aggs with perfectly dispersed keys; the centroid
    norm is a 1-row broadcast cross join (documented constant-size
    convention, PLANS.md).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("dim", "v_f"),
    ).select(
        "label",
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v_f").cast("double") * _Q).cast("bigint").alias("qv"),
    )
    dimsum = ex.groupBy("dim").agg(
        F.floor(F.sum("qv").cast("double") / _QS).cast("bigint").alias("sc")
    )
    centroid_norm = dimsum.agg(
        F.sum(F.col("sc") * F.col("sc")).cast("bigint").alias("norm_c")
    )
    per_vec = (
        ex.join(F.broadcast(dimsum), "dim")
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("qv") * F.col("sc")).cast("bigint").alias("dot_c"),
            F.sum(F.col("qv") * F.col("qv")).cast("bigint").alias("norm_v"),
        )
    )
    scored = per_vec.crossJoin(F.broadcast(centroid_norm)).select(
        "label",
        (
            F.col("dot_c").cast("double")
            / (
                F.sqrt(F.col("norm_v").cast("double"))
                * F.sqrt(F.col("norm_c").cast("double"))
            )
        ).alias("cos_c"),
        (F.sqrt(F.col("norm_v").cast("double")) / _Q).alias("norm_d"),
    )
    n = F.count(F.lit(1))
    qmean = lambda c: (
        F.sum(F.floor(F.col(c) * _QC).cast("bigint")).cast("double") / n / _QC
    ).cast("double")
    return scored.groupBy("label").agg(
        n.alias("n_vecs"),
        qmean("cos_c").alias("mean_cos_centroid"),
        F.min("cos_c").alias("min_cos_centroid"),
        F.max("cos_c").alias("max_cos_centroid"),
        qmean("norm_d").alias("mean_norm"),
    )


# --------------------------------------------------------------------------
# Split representativeness: unigram KL/JS of each leakage-safe split
# against the TRAIN split.  A val set whose distribution drifts from
# train measures the wrong thing; this is the check a team runs after
# cutting splits (and the train-vs-train row is the built-in zero
# control).  Reuses the drift core verbatim — split labels are just a
# different grouping column, and novel-token handling (val tokens
# absent from train) is exactly the streaming monitor's semantics.
# --------------------------------------------------------------------------


def _split_divergence_oracle() -> str:
    from bigdatamlteamrepo_spark.queries.pipeline import (
        _split_case_sql,
        neardup_rep_ctes,
    )

    return f"""
WITH RECURSIVE
{neardup_rep_ctes()},
__sp AS (SELECT doc_id, {_split_case_sql('rep')} AS split FROM __m),
tok AS (
  SELECT s.split, unnest({_TOKENS_SQL}) AS token
  FROM documents d JOIN __sp s ON d.doc_id = s.doc_id
),
st AS (SELECT split, token, COUNT(*) AS c_st FROM tok GROUP BY split, token),
ct AS (
  SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t
  FROM st WHERE split = 'train' GROUP BY token
),
totals AS (SELECT CAST(SUM(c_t) AS BIGINT) AS t_all FROM ct),
sp_tot AS (
  SELECT split, CAST(SUM(c_st) AS BIGINT) AS t_s, COUNT(*) AS n_distinct
  FROM st GROUP BY split
),
terms AS (
  SELECT st.split, st.c_st, ct.c_t,
         CAST(st.c_st AS DOUBLE) / s.t_s AS p,
         CAST(ct.c_t AS DOUBLE) / totals.t_all AS q
  FROM st
  LEFT JOIN ct ON st.token = ct.token
  JOIN sp_tot s ON st.split = s.split
  CROSS JOIN totals
)
SELECT t.split,
       s.t_s AS n_tokens,
       CAST(s.n_distinct AS BIGINT) AS n_distinct_tokens,
       CAST(COALESCE(SUM(t.c_t), 0) AS BIGINT) AS covered_corpus_tokens,
       CAST(SUM(CASE WHEN t.c_t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS novel_tokens,
       CAST(SUM(CASE WHEN t.c_t IS NULL THEN t.c_st ELSE 0 END) AS BIGINT)
         AS novel_token_mass,
       {dsum_expr(
           "CASE WHEN t.c_t IS NOT NULL THEN t.p * ln(t.p / t.q) "
           "ELSE 0.0 END", 12, 30)} AS kl_nats,
       {dsum_expr(
           "CASE WHEN t.c_t IS NOT NULL THEN 0.5 * (t.p * ln(2.0 * t.p"
           " / (t.p + t.q)) + t.q * ln(2.0 * t.q / (t.p + t.q))) "
           "ELSE 0.0 END", 12, 30)}
         + 0.5 * {_LN2}
           * (1.0 - CAST(COALESCE(SUM(t.c_t), 0) AS DOUBLE) / MAX(tt.t_all))
         + 0.5 * {_LN2}
           * (CAST(SUM(CASE WHEN t.c_t IS NULL THEN t.c_st ELSE 0 END)
              AS DOUBLE) / s.t_s) AS js_nats
FROM terms t
JOIN sp_tot s ON t.split = s.split
CROSS JOIN totals tt
GROUP BY t.split, s.t_s, s.n_distinct
"""


@query("split_unigram_divergence", oracle=_split_divergence_oracle())
def split_unigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram KL/JS of every leakage-safe split against the TRAIN
    split's distribution (train vs itself reports 0 — the control
    row).  Novel tokens (val/test types absent from train) fold into
    JS exactly and are emitted as counts; KL covers the train-covered
    tokens (the drift-monitor semantics).

    Plan: the split labels ride the existing rep chain; the divergence
    is the registered drift core (Zipf-collapsed (split, token) counts,
    one vocab join, decimal-quantized ln-term sums)."""
    from bigdatamlteamrepo_spark.queries.pipeline import (
        neardup_rep_frame,
        split_of,
    )

    docs = load_table(spark, sf_dir, "documents")
    sp = neardup_rep_frame(spark, sf_dir).select(
        "doc_id", split_of(F.col("rep")).alias("split")
    )
    labeled = docs.join(sp, "doc_id").select(
        F.col("split").alias("source"), "text"
    )
    st = unigram_counts(labeled)
    ref = (
        st.filter(F.col("source") == "train")
        .groupBy("token")
        .agg(F.sum("c_st").cast("bigint").alias("c_t"))
    )
    return unigram_divergence_against_ref(st, ref).select(
        F.col("source").alias("split"),
        "n_tokens",
        "n_distinct_tokens",
        "covered_corpus_tokens",
        "novel_tokens",
        "novel_token_mass",
        "kl_nats",
        "js_nats",
    )
