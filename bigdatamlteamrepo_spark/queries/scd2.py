"""Slowly-changing-dimension (Type 2) history build + point-in-time join.

The lakehouse CDC pair every warehouse runs (Kimball & Ross, *The Data
Warehouse Toolkit*, ch. 5): collapse an attribute's change stream into
versioned validity intervals (``valid_from`` / ``valid_to`` /
``is_current``), then enrich a fact stream with the dimension value
*as of* each fact's event time.

Change stream here: a customer's **priority tier** — ``HIGH`` when the
latest order's ``o_orderpriority`` is 1-URGENT/2-HIGH, else ``NORMAL``
— observed at every order (ordered by ``o_orderdate`` with
``o_orderkey`` as the deterministic tie-break).  Consecutive orders
with the same tier collapse into one version row; a version's
``valid_to`` is the next version's ``valid_from`` (half-open
``[from, to)`` date intervals), ``NULL`` on the current row.

Distributed shape (the part that matters at 100 TB):

* **One shuffle, one sort.**  Both window passes — the change-detection
  ``lag`` over raw observations and the ``lead``/``row_number`` over
  surviving change rows — partition by ``c_custkey`` and order by
  ``(o_orderdate, o_orderkey)``, so Catalyst reuses a single Exchange +
  Sort for the whole build (asserted in ``tests/test_scd2.py``'s plan
  gate).  No groupBy re-shuffle: version rows ARE the change rows,
  filtered in place.
* **Point-in-time join without a range join.**  The naive
  ``f.ts BETWEEN valid_from AND valid_to`` interval join is a
  BroadcastNestedLoop/range join — quadratic per key and the classic
  100 TB killer.  Instead :func:`pit_enrich` unions dimension-change
  rows and fact rows on the entity key and takes
  ``last(tier, ignorenulls=True)`` over one
  ``(date, kind, version)``-ordered window — the sort-merge as-of idiom
  (same family as ``operators/asof.py``), one shuffle on the key, state
  bounded by the per-key history.  A tier change dated the same day as
  an event sorts BEFORE the event (kind 0 < 1), so the event sees the
  new tier — matching the oracle's ``valid_from <= event_date``
  latest-version-wins lookup.

Reference parity: extends the reference's static dict-lookup joins
(category_model.ipynb's label maps) to the temporal-dimension case a
production feature pipeline needs.

Oracle: DuckDB computes the identical lag/lead windows; the PIT face's
oracle uses the correlated latest-``valid_from`` subquery (the
textbook SCD2 lookup) rather than the union trick, so the two engines
agree through *different* plans — a stronger parity check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.registry import query

#: order priorities that map to the HIGH tier
_HIGH_PRIOS = ("1-URGENT", "2-HIGH")

#: the tier observation stream + SCD2 collapse, shared by both faces.
#: lag() flags rows where the tier differs from the previous
#: observation (or is the customer's first); those change rows ARE the
#: version rows — lead(valid_from) closes each interval.
_SCD2_SQL = f"""
obs AS (
  SELECT o_custkey AS c_custkey, o_orderdate, o_orderkey,
         CASE WHEN o_orderpriority IN ('{_HIGH_PRIOS[0]}', '{_HIGH_PRIOS[1]}')
              THEN 'HIGH' ELSE 'NORMAL' END AS tier
  FROM orders
),
flagged AS (
  SELECT *,
         lag(tier) OVER (PARTITION BY c_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev_tier
  FROM obs
),
scd2 AS (
  SELECT c_custkey, tier,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY c_custkey
                                 ORDER BY o_orderdate, o_orderkey)
           AS valid_to,
         CAST(row_number() OVER (PARTITION BY c_custkey
                                 ORDER BY o_orderdate, o_orderkey)
              AS BIGINT) AS version
  FROM flagged
  WHERE prev_tier IS NULL OR tier <> prev_tier
)
"""

_SCD2_ORACLE = (
    "WITH "
    + _SCD2_SQL
    + """
SELECT c_custkey, tier, valid_from, valid_to, version,
       (valid_to IS NULL) AS is_current
FROM scd2
"""
)


def scd2_collapse(
    obs: DataFrame, key: str, attr: str, ts: str, tiebreak: str
) -> DataFrame:
    """Collapse an observation stream into SCD Type-2 version rows.

    ``obs`` columns: ``key`` (entity), ``attr`` (the tracked value),
    ``ts`` (observation time), ``tiebreak`` (deterministic same-``ts``
    order).  Returns ``key, attr, valid_from, valid_to, version,
    is_current`` — half-open ``[valid_from, valid_to)`` intervals,
    ``valid_to`` NULL on the open (current) version.

    Both windows share partition key and sort order, so the whole
    collapse costs ONE Exchange + Sort.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes = obs.withColumn("__prev", F.lag(attr).over(w)).filter(
        F.col("__prev").isNull() | (F.col(attr) != F.col("__prev"))
    )
    return changes.select(
        key,
        attr,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def _tier_obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    return orders.select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderdate",
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin(*_HIGH_PRIOS), F.lit("HIGH"))
        .otherwise(F.lit("NORMAL"))
        .alias("tier"),
    )


@query("customer_tier_scd2", oracle=_SCD2_ORACLE)
def customer_tier_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each customer's priority tier: one row per
    tier *change* with ``[valid_from, valid_to)`` date validity, dense
    per-customer ``version`` numbers, and ``is_current`` on the open
    interval."""
    return scd2_collapse(
        _tier_obs(spark, sf_dir),
        key="c_custkey",
        attr="tier",
        ts="o_orderdate",
        tiebreak="o_orderkey",
    )


#: split instant for the incremental-merge face: observations up to it
#: form the "existing" dimension, later ones arrive as the merge batch
MERGE_SPLIT = "1998-01-01 00:00:00"


class MergeContractViolated(RuntimeError):
    """A merge batch contains observations at or before a key's latest
    existing ``valid_from`` — the append-only contract under which
    :func:`scd2_merge` equals the batch recompute does not hold; take
    the batch-recompute path for the affected keys instead."""


def scd2_merge(
    dim: DataFrame,
    new_obs: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
    validate: bool = False,
) -> DataFrame:
    """Incrementally MERGE a batch of new observations into an existing
    SCD2 dimension — the production upsert path (Kimball's incremental
    Type-2 load; Delta-style MERGE INTO).

    Contract: every new observation's ``ts`` is strictly later than
    every ``valid_from`` already in the dimension (append-only arrival;
    late data takes the batch-recompute path instead).  Under it the
    merge is EXACTLY equivalent to re-collapsing the full history —
    pinned in tests and, for the registered face, by the driver oracle
    which always recomputes from scratch.  ``validate=True`` enforces
    the contract with one extra per-touched-key aggregate (join on the
    key, bounded output) and raises :class:`MergeContractViolated`
    instead of silently producing a wrong interleave — callers whose
    batches come from an upstream watermark (the face) can skip it.

    Distributed shape: keys untouched by the batch pass through via an
    anti-join (at 100 TB: file-pruned by key bucketing, never
    rewritten); only touched keys re-collapse, and their input is the
    existing CHANGE rows (one per version — the collapse is
    idempotent on its own output) plus the batch, so per-key work is
    O(versions + batch), independent of raw history length.
    """
    if validate:
        latest = dim.groupBy(key).agg(F.max("valid_from").alias("__latest"))
        bad = (
            new_obs.join(latest, key)
            .filter(F.col(ts) <= F.col("__latest"))
            .limit(1)
            .collect()
        )
        if bad:
            raise MergeContractViolated(
                f"batch observation at {bad[0][ts]} for {key}="
                f"{bad[0][key]} is not strictly after the key's latest "
                f"valid_from {bad[0]['__latest']}"
            )
    touched = new_obs.select(key).distinct()
    untouched = dim.join(touched, key, "left_anti")
    old_as_obs = dim.join(touched, key, "semi").select(
        key,
        attr,
        F.col("valid_from").alias(ts),
        # versions are dense ints and all old rows precede all new rows
        # in ts (the append-only contract), so they are a valid tiebreak
        F.col("version").alias(tiebreak),
    )
    recollapsed = scd2_collapse(
        old_as_obs.unionByName(new_obs.select(key, attr, ts, tiebreak)),
        key=key,
        attr=attr,
        ts=ts,
        tiebreak=tiebreak,
    )
    return untouched.unionByName(recollapsed)


@query("customer_tier_scd2_incremental", oracle=_SCD2_ORACLE)
def customer_tier_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME SCD2 history as :func:`customer_tier_scd2`, but built
    INCREMENTALLY: observations up to ``MERGE_SPLIT`` form the existing
    dimension, the rest arrive as a merge batch — while the oracle
    always recomputes from scratch, so a green driver row proves
    incremental == batch across engines."""
    obs = _tier_obs(spark, sf_dir)
    split = F.lit(MERGE_SPLIT).cast("timestamp")
    dim = scd2_collapse(
        obs.filter(F.col("o_orderdate") <= split),
        key="c_custkey",
        attr="tier",
        ts="o_orderdate",
        tiebreak="o_orderkey",
    )
    batch = obs.filter(F.col("o_orderdate") > split)
    return scd2_merge(
        dim, batch,
        key="c_custkey", attr="tier", ts="o_orderdate", tiebreak="o_orderkey",
    )


def pit_enrich(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_date: str,
    attr: str,
) -> DataFrame:
    """Attach the SCD2 ``attr`` valid *as of* each fact's date.

    Union-as-of: dimension change rows (kind 0) and fact rows (kind 1)
    interleave on the entity key, ordered by
    ``(date, kind, version)``; ``last(attr, ignorenulls=True)`` carries
    the latest dimension value forward onto every fact row.  One
    shuffle on the key — no interval/range join.  Same-date change
    beats the fact (kind 0 sorts first); same-date changes resolve to
    the highest ``version`` — identical to the oracle's
    latest-``valid_from``, latest-``version`` lookup.  Facts with no
    prior version get NULL.
    """
    fact_cols = [c for c in facts.columns]
    clash = {attr, "__k", "__d", "__kind", "__ver", "__attr"} & set(fact_cols)
    if clash:
        # fail driver-side: the union would silently shadow fact columns
        # (same guard as operators/asof.py)
        raise ValueError(
            f"pit_enrich: fact columns {sorted(clash)} collide with the "
            "enrichment attr / internal names; rename them first"
        )
    d = dim.select(
        F.col(dim_key).alias("__k"),
        F.col("valid_from").alias("__d"),
        F.lit(0).alias("__kind"),
        F.col("version").alias("__ver"),
        F.col(attr).alias("__attr"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_cols],
    )
    f = facts.select(
        F.col(fact_key).alias("__k"),
        F.col(fact_date).alias("__d"),
        F.lit(1).alias("__kind"),
        F.lit(0).cast("long").alias("__ver"),
        # placeholder typed from the DIM attr, not hard-coded string —
        # a non-string SCD2 attribute must union cleanly (ADVICE_r10)
        F.lit(None).cast(dim.schema[attr].dataType).alias("__attr"),
        *fact_cols,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__d", "__kind", "__ver")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.unionByName(f)
        .withColumn(attr, F.last("__attr", ignorenulls=True).over(w))
        .filter(F.col("__kind") == 1)
        .select(*fact_cols, attr)
    )


_PIT_ORACLE = (
    "WITH "
    + _SCD2_SQL
    + """
SELECT e.event_type,
       COALESCE((SELECT s.tier FROM scd2 s
                 WHERE s.c_custkey = e.user_id
                   AND s.valid_from <= CAST(e.ts AS DATE)
                 ORDER BY s.valid_from DESC, s.version DESC LIMIT 1),
                'NONE') AS tier,
       COUNT(*) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e
GROUP BY 1, 2
"""
)


@query("events_tier_pit_counts", oracle=_PIT_ORACLE)
def events_tier_pit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched with the customer's priority tier AS OF the
    event date (point-in-time SCD2 lookup), rolled up to
    ``(event_type, tier)`` counts; events before the customer's first
    order land in tier ``NONE``."""
    dim = customer_tier_scd2(spark, sf_dir)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("date").alias("event_date"),
        "event_type",
    )
    enriched = pit_enrich(
        events, dim,
        fact_key="user_id", dim_key="c_custkey",
        fact_date="event_date", attr="tier",
    )
    return (
        enriched.groupBy(
            "event_type", F.coalesce("tier", F.lit("NONE")).alias("tier")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
