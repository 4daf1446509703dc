"""Exact distributed ranking metrics: grouped AUC from rank sums.

Classifier-eval at corpus scale without a single-node sklearn pass:
AUC equals the Mann-Whitney U statistic (Hanley & McNeil 1982),

    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻),

with R⁺ the midrank sum of the positives — so it reduces to ONE
groupBy on the (group, score) pair plus a running count over distinct
scores, never a global sort of raw rows and never a driver collect.
Ties use midranks (the P(tie)/2 convention), kept integer by working
with DOUBLED midranks: 2·midrank = 2·(rows below) + (rows at score) + 1.

Number discipline: scores must be exact integers (here milli
type-token-ratio), the rank accumulation runs in BIGINT, and the final
rational widens to DECIMAL(38,0)/HUGEINT before the half-away division
— R⁺ grows as N² and passes int64 near 3e9 rows, so the widening is a
real 100-TB requirement, not ceremony.

Scale shape: |distinct (group, score)| cells after the first
map-side-combinable agg; the window runs per group over the score
domain (≤ 1001 milli-TTR values), not over documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: fixed-point scale for the AUC output
MICRO = 1_000_000


def exact_grouped_auc(
    df: DataFrame, group: str, score: str, label: str
) -> DataFrame:
    """AUC of integer ``score`` predicting binary ``label`` (0/1),
    per ``group``; groups without both classes are dropped (AUC is
    undefined there).  Returns ``(group, n_pos, n_neg, auc_micro)``."""
    g = df.groupBy(group, score).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(label).cast("bigint").alias("npos"),
    )
    below_w = (
        Window.partitionBy(group)
        .orderBy(score)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cells = g.select(
        group,
        "n",
        "npos",
        F.coalesce(F.sum("n").over(below_w), F.lit(0)).alias("below"),
    )
    return (
        cells.groupBy(group)
        .agg(
            F.sum("npos").alias("n_pos"),
            (F.sum("n") - F.sum("npos")).alias("n_neg"),
            # doubled midrank sum of positives — the summand is widened
            # to DECIMAL(38,0) BEFORE the aggregate (DuckDB's SUM
            # auto-promotes BIGINT to HUGEINT; a plain F.sum would wrap
            # silently in non-ANSI Spark at the N² scale the module
            # docstring cites, diverging from the oracle exactly where
            # the widening matters)
            F.sum(
                F.col("npos").cast("decimal(38,0)")
                * (2 * F.col("below") + F.col("n") + 1)
            ).alias("r2"),
        )
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            group,
            "n_pos",
            "n_neg",
            # every product touching N² runs in decimal: n_pos·(n_pos+1)
            # and 2·n_pos·n_neg wrap int64 past ~3e9 rows per class
            F.expr(
                f"CAST((2 * (r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
                f" * {MICRO} + 2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " DIV (2 * (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg))"
                " AS BIGINT)"
            ).alias("auc_micro"),
        )
    )


_AUC_ORACLE = f"""
WITH t AS (
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         len(string_split_regex(lower(text), '\\s+')) AS n_tok,
         len(list_distinct(string_split_regex(lower(text), '\\s+')))
           AS n_uniq
  FROM documents
),
scored AS (
  SELECT source, label, (1000 * n_uniq) // n_tok AS score
  FROM t WHERE n_tok > 0
),
g AS (
  SELECT source, score, COUNT(*) AS n, SUM(label) AS npos
  FROM scored GROUP BY 1, 2
),
cells AS (
  SELECT source, n, npos,
         COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY score
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS below
  FROM g
),
agg AS (
  SELECT source,
         CAST(SUM(npos) AS BIGINT) AS n_pos,
         CAST(SUM(n) - SUM(npos) AS BIGINT) AS n_neg,
         SUM(npos * (2 * below + n + 1)) AS r2
  FROM cells GROUP BY source
)
SELECT source, n_pos, n_neg,
       CAST((2 * CAST(r2 - n_pos * (n_pos + 1) AS HUGEINT) * {MICRO}
              + 2 * n_pos * n_neg)
            // (2 * CAST(2 * n_pos * n_neg AS HUGEINT)) AS BIGINT)
         AS auc_micro
FROM agg WHERE n_pos > 0 AND n_neg > 0
"""


@query("source_quality_auc", oracle=_AUC_ORACLE)
def source_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source AUC of the milli type-token-ratio score predicting
    English documents — the eval every quality-classifier pipeline runs
    before trusting a score as a filter, here exact at any corpus size
    (Spark's native areaUnderROC approximates via binning AND collects
    per-partition; this stays a two-agg plan)."""
    from bigdatamlteamrepo_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        (F.col("lang") == "en").cast("int").alias("label"),
        tokenize("text").alias("toks"),
    )
    n_tok = F.size("toks")
    scored = docs.filter(n_tok > 0).select(
        "source",
        "label",
        F.expr("(1000 * size(array_distinct(toks))) div size(toks)").alias(
            "score"
        ),
    )
    return exact_grouped_auc(scored, group="source", score="score", label="label")


_GINI_ORACLE = f"""
WITH t AS (
  SELECT source,
         CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
           AS n_tok
  FROM documents
),
g AS (
  SELECT source, n_tok, COUNT(*) AS c
  FROM t WHERE n_tok > 0 GROUP BY 1, 2
),
cells AS (
  SELECT source, n_tok, c,
         COALESCE(SUM(c) OVER w, 0) AS n_below,
         COALESCE(SUM(c * n_tok) OVER w, 0) AS s_below
  FROM g
  WINDOW w AS (PARTITION BY source ORDER BY n_tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
agg AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(SUM(c * n_tok) AS BIGINT) AS total_tokens,
         SUM(c * (n_below * n_tok - s_below)) AS half_mad
  FROM cells GROUP BY source
)
SELECT source, n_docs, total_tokens,
       CAST((2 * CAST(half_mad AS HUGEINT) * {MICRO}
              + CAST(n_docs AS HUGEINT) * total_tokens)
            // (2 * CAST(n_docs AS HUGEINT) * total_tokens) AS BIGINT)
         AS gini_micro
FROM agg
"""


@query("source_token_gini", oracle=_GINI_ORACLE)
def source_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini concentration of document token counts — the
    curation signal for "is this source a few huge documents in a
    trench coat?".  Exact: Σᵢⱼ|xᵢ−xⱼ| folds from running (count, sum)
    prefixes over the token-count domain — for each distinct value v,
    pairs against strictly smaller values contribute
    c_v · (N_<v · v − S_<v); the ordered-pair symmetry factor 2 cancels
    against the 2 in the denominator, leaving
    G = half_mad / (n S) as a half-away micro rational in
    HUGEINT/DECIMAL(38,0).  Same cell machinery as the AUC face
    (groupBy to the value domain, one bounded window), entirely
    different statistic."""
    from bigdatamlteamrepo_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokenize("text")).cast("bigint").alias("n_tok")
    )
    g = docs.filter(F.col("n_tok") > 0).groupBy("source", "n_tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cells = g.select(
        "source",
        "n_tok",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("n_below"),
        F.coalesce(F.sum(F.col("c") * F.col("n_tok")).over(w), F.lit(0)).alias(
            "s_below"
        ),
    )
    agg = cells.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.sum(F.col("c") * F.col("n_tok")).alias("total_tokens"),
        # summand widened to DECIMAL(38,0) BEFORE the aggregate — same
        # HUGEINT-parity requirement as the AUC r2 sum above
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * (F.col("n_below") * F.col("n_tok") - F.col("s_below"))
        ).alias("half_mad"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        F.expr(
            f"CAST((2 * CAST(half_mad AS DECIMAL(38,0)) * {MICRO}"
            "  + CAST(n_docs AS DECIMAL(38,0)) * total_tokens)"
            " DIV (2 * CAST(n_docs AS DECIMAL(38,0)) * total_tokens)"
            " AS BIGINT)"
        ).alias("gini_micro"),
    )
