"""Poisson bootstrap: uncertainty for massive-data aggregates in ONE
pass (Chamandy, Muralidharan, Najmi & Naidu 2012, "Estimating
uncertainty for massive data streams", Google TR; the streaming
formulation of the m-out-of-n/Little-Bootstraps family of Kleiner et
al. 2014, JRSS-B).

Classic resampling draws B full resamples — impossible when one pass is
all you get at 100 TB.  The Poisson trick: in a bootstrap resample each
row's multiplicity is Binomial(n, 1/n) ≈ Poisson(1), independent across
rows, so B replicates need only B deterministic per-row multiplicities
— generated here from a portable md5 hash (row id × replicate id), NOT
``rand()``, so every engine and every re-run draws the identical
resample.

Pipeline shape (the part that matters at 100 TB):

* one scan of events; each row fans out to its B (type, b) cells with
  multiplicity m ∈ 0..8 — map-side combine collapses the fan-out to
  ``|types| · B`` partial cells per task, so shuffle volume is
  O(cells), independent of row count;
* replicate means are exact integer rationals (micro-quantized values,
  half-away division) — BIGINT end to end, no float accumulation
  order to disagree on;
* the final reduce is over ``B`` replicate rows per type: bootstrap
  standard error + the replicate envelope (min/max of the B means).

Multiplicity thresholds: ``T_k = floor(CDF_Poisson(1)(k) · 2^32)`` are
computed ONCE driver-side and embedded as integer literals in both the
Spark expression and the DuckDB oracle, so cross-engine equality is by
construction — m = #{k : h ≥ T_k} for the row's 32-bit hash h.

Hash economics (the hot path at 100 TB): md5 produces 128 bits but a
multiplicity needs only 32, so each digest feeds FOUR replicates (b ↦
digest ``md5(id:b//4)``, slice ``b%4``) — 8 md5 calls per row for
B = 32 instead of 32.  Slices of one md5 are independent uniform bits,
exactly as good a Poisson driver as separate digests.  Measured ~1.4×
on the whole stage (A/B at sf1: 25.0 s → 17.9 s — the conv/threshold
arithmetic shares the per-replicate cost, so cutting md5 4× does not
cut the stage 4×).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: bootstrap replicates (B) — 32 gives a ~±25% SE on the SE itself,
#: the standard operating point for pipeline-health error bars
N_REPLICATES = 32
#: fixed-point scale for values and means
MICRO = 1_000_000
#: multiplicity cap: P(Poisson(1) > 8) < 1e-6 — truncation bias is
#: far below the bootstrap's own Monte-Carlo noise
_MAX_MULT = 8

#: Poisson(1) CDF thresholds scaled to the 32-bit hash space, computed
#: once driver-side: T_k = floor(P(X <= k) * 2^32), k = 0.._MAX_MULT-1
_THRESHOLDS = [
    math.floor(
        sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1)) * 2**32
    )
    for k in range(_MAX_MULT)
]


def _mult_sql(h: str) -> str:
    """Multiplicity m = #{k : h >= T_k} as portable integer SQL."""
    terms = " + ".join(
        f"(CASE WHEN {h} >= {t} THEN 1 ELSE 0 END)" for t in _THRESHOLDS
    )
    return f"({terms})"


_BOOT_ORACLE = f"""
WITH ev AS (
  SELECT event_type,
         CAST(event_id AS VARCHAR) AS rid,
         CAST(round(value * {MICRO}) AS BIGINT) AS v_micro
  FROM events
),
digests AS (
  SELECT ev.event_type, ev.v_micro, g.g,
         md5(ev.rid || ':' || g.g) AS d
  FROM ev CROSS JOIN (SELECT unnest(range(0, {N_REPLICATES} // 4)) AS g) g
),
hashed AS (
  SELECT event_type, v_micro,
         g * 4 + s.s AS b,
         ('0x' || substr(d, 1 + 8 * s.s, 8))::BIGINT AS h
  FROM digests CROSS JOIN (SELECT unnest(range(0, 4)) AS s) s
),
cells AS (
  SELECT event_type, b, v_micro, {_mult_sql("h")} AS m FROM hashed
),
reps AS (
  SELECT event_type, b,
         CAST((2 * SUM(m * v_micro) + SUM(m)) // (2 * SUM(m)) AS BIGINT)
           AS mean_b
  FROM cells GROUP BY 1, 2
),
base AS (
  SELECT event_type,
         COUNT(*) AS n_events,
         CAST((2 * SUM(v_micro) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
           AS mean_micro
  FROM ev GROUP BY 1
)
SELECT base.event_type, base.n_events, base.mean_micro,
       CAST(round(sqrt(
         (CAST({N_REPLICATES} AS DOUBLE) * SUM(mean_b * mean_b)
          - CAST(SUM(mean_b) AS DOUBLE) * SUM(mean_b))
         / ({N_REPLICATES} * ({N_REPLICATES} - 1.0))
       )) AS BIGINT) AS boot_se_micro,
       MIN(mean_b) AS rep_min_micro,
       MAX(mean_b) AS rep_max_micro
FROM reps JOIN base USING (event_type)
GROUP BY 1, 2, 3
"""


def poisson_bootstrap_means(
    rows: DataFrame,
    group_col: str,
    id_col: str,
    value_micro_col: str,
    n_replicates: int = N_REPLICATES,
) -> DataFrame:
    """B deterministic Poisson-bootstrap replicate means per group.

    Returns ``(group_col, b, mean_b)`` — ``mean_b`` the half-away
    micro-unit mean of replicate ``b``'s weighted resample.  Replicate
    ``b``'s hash is the ``b % 4``-th 8-hex slice of
    ``md5(id:b//4)`` — a pure function of the row identity
    (engine-portable, rerun-stable), at one md5 per FOUR replicates
    (module doc: hash economics).

    ``n_replicates`` must be a multiple of 4.
    """
    if n_replicates % 4:
        raise ValueError("n_replicates must be a multiple of 4")
    g = F.explode(F.sequence(F.lit(0), F.lit(n_replicates // 4 - 1))).alias("g")
    s = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("s")
    # threshold comparison on the 8-hex SLICE STRING: md5 hex is
    # fixed-width lowercase [0-9a-f], whose lexicographic order equals
    # the numeric order of the 32-bit value, so `slice >= hex(T_k)`
    # decides exactly what `conv(slice,16,10) >= T_k` did — dropping 32
    # string→bigint conv() parses per row (r13, guide §1.2 per-task
    # work; interleaved A/B at sf0.1: 2.15 → 1.37 s min, 2.24 → 1.50 s
    # med on events_bootstrap_ci; value-identical by construction and
    # re-checked row-for-row in the probe).  T_k < 2^32 always (it is
    # floor(cdf · 2^32) with cdf < 1), so 8 hex digits never overflow.
    m_terms = " + ".join(
        f"(CASE WHEN __hs >= '{t:08x}' THEN 1 ELSE 0 END)" for t in _THRESHOLDS
    )
    return (
        rows.select(
            F.col(group_col),
            F.col(id_col).alias("__rid"),
            F.col(value_micro_col).alias("__v"),
            g,
        )
        .withColumn(
            "__d", F.md5(F.concat(F.col("__rid").cast("string"), F.lit(":"), F.col("g")))
        )
        .select("*", s)
        .withColumn("__hs", F.expr("substring(__d, 1 + 8 * s, 8)"))
        .withColumn("b", F.expr("g * 4 + s"))
        .withColumn("m", F.expr(m_terms))
        .groupBy(group_col, "b")
        .agg(
            F.expr("CAST((2 * SUM(m * __v) + SUM(m)) div (2 * SUM(m)) AS BIGINT)")
            .alias("mean_b")
        )
    )


@query("events_bootstrap_ci", oracle=_BOOT_ORACLE, bench=True)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean value with Poisson-bootstrap uncertainty:
    point estimate, bootstrap standard error over {B} deterministic
    replicates, and the replicate envelope (min/max replicate mean) —
    all in micro units."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").alias("rid"),
        F.expr(f"CAST(round(value * {MICRO}) AS BIGINT)").alias("v_micro"),
    )
    reps = poisson_bootstrap_means(
        ev, group_col="event_type", id_col="rid", value_micro_col="v_micro"
    )
    base = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "CAST((2 * SUM(v_micro) + COUNT(*)) div (2 * COUNT(*)) AS BIGINT)"
        ).alias("mean_micro"),
    )
    n = N_REPLICATES
    return (
        reps.join(F.broadcast(base), "event_type")
        .groupBy("event_type", "n_events", "mean_micro")
        .agg(
            F.expr(
                f"CAST(round(sqrt((CAST({n} AS DOUBLE) * SUM(mean_b * mean_b)"
                f" - CAST(SUM(mean_b) AS DOUBLE) * SUM(mean_b))"
                f" / ({n} * ({n} - 1.0)))) AS BIGINT)"
            ).alias("boot_se_micro"),
            F.min("mean_b").alias("rep_min_micro"),
            F.max("mean_b").alias("rep_max_micro"),
        )
    )


events_bootstrap_ci.__doc__ = events_bootstrap_ci.__doc__.format(B=N_REPLICATES)


# --------------------------------------------------------------------------
# Neyman allocation: the optimal stratified-sampling design.
# --------------------------------------------------------------------------

#: total sample budget the design allocates
NEYMAN_BUDGET = 1_000

_NEYMAN_ORACLE = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * {MICRO}) AS BIGINT) AS v
  FROM events
),
m AS (
  SELECT event_type,
         COUNT(*) AS n_rows,
         SUM(v) AS s1,
         SUM(v * v) AS s2
  FROM ev GROUP BY 1
),
sd AS (
  SELECT event_type, n_rows,
         CAST(round(sqrt(
           (CAST(n_rows AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
           / (CAST(n_rows AS DOUBLE) * n_rows)
         )) AS BIGINT) AS sd_micro
  FROM m
),
w AS (
  SELECT *, n_rows * sd_micro AS nw,
         SUM(n_rows * sd_micro) OVER () AS tot_nw,
         SUM(n_rows) OVER () AS tot_n
  FROM sd
),
q AS (
  SELECT *,
         ({NEYMAN_BUDGET} * nw) // tot_nw AS base_h,
         ({NEYMAN_BUDGET} * nw) % tot_nw AS rem_h,
         ({NEYMAN_BUDGET} * n_rows) // tot_n AS prop_base,
         ({NEYMAN_BUDGET} * n_rows) % tot_n AS prop_rem
  FROM w
),
r AS (
  SELECT *,
         row_number() OVER (ORDER BY rem_h DESC, event_type) AS lr_rank,
         SUM(base_h) OVER () AS base_sum,
         row_number() OVER (ORDER BY prop_rem DESC, event_type) AS plr_rank,
         SUM(prop_base) OVER () AS prop_base_sum
  FROM q
)
SELECT event_type, n_rows, sd_micro,
       CAST(base_h + CASE WHEN lr_rank <= {NEYMAN_BUDGET} - base_sum
                          THEN 1 ELSE 0 END AS BIGINT) AS neyman_n,
       CAST(prop_base + CASE WHEN plr_rank <= {NEYMAN_BUDGET} - prop_base_sum
                             THEN 1 ELSE 0 END AS BIGINT) AS proportional_n
FROM r
"""


@query("events_neyman_allocation", oracle=_NEYMAN_ORACLE)
def events_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal stratified-sampling design (Neyman 1934): allocate a
    {B}-row budget across event-type strata ∝ N_h·σ_h, against the
    proportional (∝ N_h) baseline — the design step a massive-data
    estimation pipeline runs BEFORE drawing a single row.

    Everything is exact integers: σ_h is micro-quantized from exact
    moments (one deterministic sqrt per stratum), and both allocations
    use largest-remainder (Hamilton) apportionment in pure BIGINT
    arithmetic — the budget is hit exactly, ties break on the stratum
    name, and both engines agree on every seat.  One grouped moment
    aggregate + constant-size window math over |strata| rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"CAST(round(value * {MICRO}) AS BIGINT)").alias("v"),
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("s2"),
    )
    sd = m.select(
        "event_type",
        "n_rows",
        F.expr(
            "CAST(round(sqrt((CAST(n_rows AS DOUBLE) * s2"
            " - CAST(s1 AS DOUBLE) * s1)"
            " / (CAST(n_rows AS DOUBLE) * n_rows))) AS BIGINT)"
        ).alias("sd_micro"),
    )
    B = NEYMAN_BUDGET
    q = sd.selectExpr(
        "*",
        "n_rows * sd_micro AS nw",
        "SUM(n_rows * sd_micro) OVER () AS tot_nw",
        "SUM(n_rows) OVER () AS tot_n",
    ).selectExpr(
        "*",
        f"({B} * nw) div tot_nw AS base_h",
        f"({B} * nw) % tot_nw AS rem_h",
        f"({B} * n_rows) div tot_n AS prop_base",
        f"({B} * n_rows) % tot_n AS prop_rem",
    ).selectExpr(
        "*",
        "row_number() OVER (ORDER BY rem_h DESC, event_type) AS lr_rank",
        "SUM(base_h) OVER () AS base_sum",
        "row_number() OVER (ORDER BY prop_rem DESC, event_type) AS plr_rank",
        "SUM(prop_base) OVER () AS prop_base_sum",
    )
    return q.selectExpr(
        "event_type",
        "n_rows",
        "sd_micro",
        f"CAST(base_h + (CASE WHEN lr_rank <= {B} - base_sum THEN 1 ELSE 0 END)"
        " AS BIGINT) AS neyman_n",
        f"CAST(prop_base + (CASE WHEN plr_rank <= {B} - prop_base_sum"
        " THEN 1 ELSE 0 END) AS BIGINT) AS proportional_n",
    )


events_neyman_allocation.__doc__ = events_neyman_allocation.__doc__.format(
    B=NEYMAN_BUDGET
)
