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
#: green driver CORRECTNESS row are promoted here ahead of queries
#: already proven green in a previous round's window (those keep full
#: local parity coverage at sf0.001/0.01/0.1).  One set, swapped per
#: round — individual ``@query(priority=...)`` values stay stable.
#: Exactly 50 names: 15 never-hash-green (the 12 sketch/containment/RRF/
#: multiprobe/best-reps queries + the r02 red doc_pack_plan + the two
#: r01 no_oracle rows that gained oracles in r02), 22 new this round
#: (skew-split pack, scale-N shard deal, q11/q20, incremental dedup,
#: prefix-filter dedup, corpus-duplication profile, per-source caps,
#: funnel, retention cohorts, PQ-ADC ANN, IVFPQ ANN, histogram
#: quantiles, bigram-LM perplexity, DSIR weights, BPE pair counts,
#: stratified sample, triangle census, Gopher rule audit, z-order
#: block audit, corpus-selection capstone, covariance moments), and 13
#: highest-value r01 greens for re-confirmation after churn.
ROTATE_IN: frozenset[str] = frozenset(
    {
        # --- sketch tier: oracle-paired since r02, never driver-checked
        "hll_orders_by_flag",
        "hll_hourly_users",
        "kmv_distinct_parts",
        "kmv_orders_by_flag",
        "cms_heavy_suppliers",
        "bloom_semijoin_orders",
        "pagerank_nation_trade",
        "theta_customer_overlap",
        # --- containment / retrieval / ANN variants, never checked
        "doc_containment_pairs",
        "hybrid_rrf_retrieval",
        "ann_rp_lsh_multiprobe_topk",
        "neardup_best_representatives",
        # --- re-checks: r02 red row (oracle HUGEINT bug, now cast) and
        #     the two r01 no_oracle rows whose oracles landed in r02
        "doc_pack_plan",
        "doc_language_id",
        "simhash_neardup_pairs",
        # --- new round-3 queries (skew-split pack, scale-N shard deal,
        #     q11/q20 adapted TPC-H completion)
        "doc_pack_plan_bucketed",
        "doc_shard_assignment_n64",
        "q11_important_stock",
        "q20_dominant_supplier",
        "neardup_incremental_lsh",
        "neardup_pairs_prefix_filter",
        "doc_shared_shingle_stats",
        "per_source_doc_caps",
        "events_funnel_view_click_purchase",
        "events_retention_cohorts",
        "ann_pq_adc_topk",
        "ann_ivfpq_topk",
        "events_value_hist_quantiles",
        # --- statistical text-modeling + graph tier (new this round)
        "doc_lm_perplexity",
        "dsir_importance_weights",
        "bpe_pair_counts",
        "doc_stratified_sample",
        "part_cooccurrence_triangles",
        "doc_gopher_rules",
        "events_zorder_blocks",
        "training_corpus_selection",
        "embedding_covariance_stats",
        # --- r01 greens, re-confirmed this round (13)
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "top_orders_per_segment",
        "order_priority_status_crosstab",
        "dedup_exact_by_lang",
        "minhash_signatures",
        "neardup_pairs_lsh",
        "embedding_neardup_pairs",
        "doc_winnowing_fingerprints",
        "doc_keyword_label_counts",
        "events_sliding_by_type",
        "events_user_sessions",
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
