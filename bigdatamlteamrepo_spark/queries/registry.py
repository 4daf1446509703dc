"""Query registry: each engine capability registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible,
its ANSI-SQL oracle twin for DuckDB (driver contract in
``__spark_entry__.py``).

The registry is the single source of truth consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``, ``bench.py``, and the
parity tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
#: queries worth timing at sf0.1 (bench.py headline set)
BENCH_SET: list[str] = []
#: (priority, registration index) per query — the driver's correctness
#: harness checks only the FIRST 50 entries of ``queries()``, so exports
#: are sorted by priority; see :func:`ordered`
_ORDER: dict[str, tuple[int, int]] = {}

#: promoted ahead of core — this round's driver-window rotation
PRI_ROTATE = 40
#: default priority — inside the driver window
PRI_CORE = 50
#: demoted: family-redundant or rows-only queries that yield their
#: driver slot to a query carrying new oracle evidence (still fully
#: covered by the local pytest parity suite)
PRI_EXTRA = 90

#: Driver-window rotation (round 3): the driver checks only the first 50
#: exported queries, so oracle-paired queries that have never received a
#: driver CORRECTNESS row are promoted here ahead of queries already
#: proven green in a previous round's window (those keep full local
#: parity coverage at sf0.001/0.01/0.1).  One set, swapped per round —
#: individual ``@query(priority=...)`` values stay stable.
ROTATE_IN: frozenset[str] = frozenset(
    {
        # in-window round 2 but driver-unchecked in round 1 — pin them in
        "winnowing_neardup_pairs",
        "embedding_neardup_lsh",
        "customer_running_totals",
        "orders_priority_rollup",
        "segment_price_variance",
        "neardup_cluster_representatives",
        "segment_stats_unpivot",
        "doc_class_weights",
        "lineitem_flag_status_cube",
        "events_props_typed",
        "events_value_median_by_type",
        "events_last_order_asof",
        # oracle-paired but outside every previous window
        "q4_order_priority_checking",
        "q16_parts_supplier_counts",
        "q7_nation_pair_volume",
        "q2_min_acctbal_supplier_per_part",
        "events_trailing_hour_stats",
        "orders_grouping_sets",
        "doc_bm25_scores",
        "orders_value_deciles",
        "ann_rp_lsh_topk",
        # ann_rp_lsh_multiprobe_topk yields its slot to the TPC-H tier
        # (same RP-LSH oracle family as the two rows kept in-window);
        # it stays oracle-paired in the local parity suite.
        "ann_rp_lsh_banded_topk",
        "events_view_click_attribution",
        "ann_voronoi_topk",
        "customer_spend_ranks",
        "order_custkeys_intersect_all",
        "order_custkeys_except_all",
        # round-3 training-data-pipeline tier (queries/pipeline.py)
        "doc_repetition_metrics",
        "doc_quality_filter",
        "neardup_dedup_summary",
        "doc_pii_scan",
        "embedding_int8_quant_stats",
        "events_value_percentiles",
        "vocab_coverage_by_lang",
        "doc_eval_contamination",
        # round-3 training-shard planning tier (queries/shards.py)
        "source_token_budgets",
        "doc_mixture_sample",
        "doc_pack_plan",
        "doc_shard_assignment",
        # TPC-H completion tier (queries/relational2.py) — never checked
        "q6_forecast_revenue",
        "q8_market_share",
        "q9_product_profit",
        "q10_returned_items",
        "q12_late_shipment_priority",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q19_disjunctive_revenue",
        "q21_waiting_suppliers",
        "q22_sales_opportunity",
    }
)


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    priority: int = PRI_CORE,
):
    """Decorator registering a query (and optional oracle SQL / bench
    flag).  ``priority`` curates the driver's 50-query correctness
    window: ascending order, ties broken by registration order."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        _ORDER[name] = (PRI_ROTATE if name in ROTATE_IN else priority, len(_ORDER))
        if oracle is not None:
            ORACLE[name] = oracle
        if bench:
            BENCH_SET.append(name)
        return fn

    return deco


def ordered(mapping: dict[str, object]) -> dict:
    """``mapping`` re-keyed in (priority, registration) order."""
    return {
        n: mapping[n] for n in sorted(mapping, key=_ORDER.__getitem__)
    }
