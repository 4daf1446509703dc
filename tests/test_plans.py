"""Plan-quality gate: the physical plans the engine would want at 100 TB
— pushdown at the scan, pruned columns, broadcast dims, codegen hot
paths, zero row-at-a-time Python UDFs."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.plans import checks
from bigdatamlteamrepo_spark.queries.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
)
from bigdatamlteamrepo_spark.queries.registry import ORACLE, QUERIES


def test_filter_pushdown_to_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    assert checks.has_pushed_filter(df, "o_orderpriority")


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = checks.reads_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}


def test_q1_codegen_and_pushdown(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert checks.has_whole_stage_codegen(df)
    assert checks.has_pushed_filter(df, "l_shipdate")
    assert checks.python_udf_count(df) == 0


def test_q3_broadcasts_dims(spark, sf_dir):
    df = q3_shipping_priority(spark, sf_dir)
    assert checks.broadcast_join_count(df) >= 1
    assert checks.python_udf_count(df) == 0


def test_q5_join_strategy(spark, sf_dir):
    df = q5_local_supplier_volume(spark, sf_dir)
    # region/nation/supplier broadcast; fact-fact joins may be SMJ or
    # (post-AQE at tiny SF) broadcast — just require ≥2 broadcasts and
    # no nested-loop for the equi-joins
    assert checks.broadcast_join_count(df) >= 2
    plan = checks.physical_plan(df)
    assert "CartesianProduct" not in plan


def test_partition_pruning(spark, sf_dir, tmp_path_factory):
    """Directory-partitioned writes prune at the source: a filter on the
    partition column must appear as PartitionFilters and skip files."""
    out = str(tmp_path_factory.mktemp("parts"))
    part = load_table(spark, sf_dir, "part")
    part.write.mode("overwrite").partitionBy("p_brand").parquet(out)
    one_brand = part.select("p_brand").first().p_brand
    df = (
        spark.read.parquet(out)
        .filter(F.col("p_brand") == one_brand)
        .select("p_partkey", "p_retailprice")
    )
    plan = checks.formatted_plan(df)
    assert "PartitionFilters" in plan
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "p_brand" in pf_line and "[]" not in pf_line.replace("[],", "")
    # pruned read returns exactly that brand's rows
    assert df.count() == part.filter(F.col("p_brand") == one_brand).count()


def test_no_python_udfs_in_oracle_queries(spark, sf_dir):
    """Every oracle-paired query must be UDF-free (full codegen)."""
    for name in sorted(ORACLE):
        df = QUERIES[name](spark, sf_dir)
        assert checks.python_udf_count(df) == 0, f"{name} has a Python UDF"


def test_pipeline_and_shard_plans_no_cartesian(spark, sf_dir):
    """Round-3 tiers: every join in the training-pipeline and shard
    queries must be a hash equi-join — no all-pairs fallback anywhere."""
    for name in (
        "doc_repetition_metrics",
        "doc_quality_filter",
        "neardup_dedup_summary",
        "doc_pii_scan",
        "embedding_int8_quant_stats",
        "vocab_coverage_by_lang",
        "source_token_budgets",
        "doc_mixture_sample",
        "doc_pack_plan",
        "doc_shard_assignment",
    ):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_pii_scan_prunes_columns(spark, sf_dir):
    """The PII scan must read only (source, text) — a scan pulling the
    whole row for a 2-column aggregate is wrong at any scale."""
    df = QUERIES["doc_pii_scan"](spark, sf_dir)
    cols = checks.reads_columns(df)
    assert set(cols) <= {"source", "text"}, cols


def test_pack_plan_window_is_partitioned(spark, sf_dir):
    """The packing cumsum must be a PARTITION BY source window — a
    global (single-partition) running sum would serialize at scale."""
    plan = (
        QUERIES["doc_pack_plan"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(source" in plan, plan[:2000]


def test_textmodel_and_graph_plans_no_cartesian(spark, sf_dir):
    """Statistical text-modeling + graph tier: no CartesianProduct
    anywhere; the only nested-loop join allowed is the broadcast of a
    ONE-ROW statistics frame (vocab size / model totals) onto the
    stream — a scalar attach, not an all-pairs join."""
    for name in (
        "doc_lm_perplexity",
        "doc_lm_perplexity_kn",
        "dsir_importance_weights",
        "bpe_pair_counts",
        "doc_stratified_sample",
        "doc_gopher_rules",
        "training_corpus_selection",
        "part_cooccurrence_triangles",
        "events_zorder_blocks",
    ):
        from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

        plan = (
            Q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        allowed = {
            "doc_lm_perplexity": 1,        # vocab-size scalar
            "doc_lm_perplexity_kn": 1,     # bigram-type-count scalar
            "dsir_importance_weights": 1,  # model-totals scalar
            "training_corpus_selection": 1,  # LM subplan's vocab scalar
        }.get(name, 0)
        assert n_bnlj <= allowed, f"{name}: {n_bnlj} nested-loop joins"


def test_passages_and_sampling_plans_no_cartesian(spark, sf_dir):
    """r04 additions: passage dedup / tfidf top-terms / weighted sample
    / catalog stats / semdedup — no CartesianProduct; nested-loop joins
    only for one-row scalar attaches (doc-count scalar in tfidf)."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    for name in (
        "passage_dedup_summary",
        "doc_tfidf_top_terms",
        "doc_weighted_sample",
        "catalog_column_stats",
        "vocab_zipf_fit",
        "doc_term_burstiness",
    ):
        plan = (
            Q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        allowed = {"doc_tfidf_top_terms": 1, "doc_term_burstiness": 1}.get(name, 0)  # n_docs scalar
        assert plan.count("BroadcastNestedLoopJoin") <= allowed, name


def test_r09_additions_plans(spark, sf_dir):
    """r09 tier: prefix-rerank ANN, RM3 expansion, salted LSH — no
    CartesianProduct; nested-loop joins only for documented one-row
    scalar attaches (RM3's (n_docs, avgdl) stats frame; the prefix
    queries broadcast the 5-row query set, which Catalyst plans as a
    BroadcastNestedLoopJoin only for the crossJoin form — count it)."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    for name in (
        "ann_prefix_rerank_topk",
        "embedding_prefix_dim_fidelity",
        "doc_bm25_rm3_topk",
        "neardup_pairs_lsh",
    ):
        plan = (
            Q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        allowed = {
            # broadcast of the bounded query/stats sides via crossJoin:
            # ann_prefix (5-row query set), fidelity (5-row), rm3
            # ((n_docs, avgdl) scalar + the BM25 subplan's stats row)
            "ann_prefix_rerank_topk": 1,
            "embedding_prefix_dim_fidelity": 1,
            "doc_bm25_rm3_topk": 2,
        }.get(name, 0)
        n = plan.count("BroadcastNestedLoopJoin")
        assert n <= allowed, f"{name}: {n} nested-loop joins"


def test_basket_plans(spark, sf_dir):
    """Market-basket tier: the item prune must be a broadcast hash
    semi-equi-join and the pair fan-out a hash equi-join on the basket
    key; nested-loop joins appear only for the one-row n_baskets scalar
    attaches (3 in the pair query, 6 in rules: the item1 subplan is
    referenced by both rule sides so its scalar attach plans twice,
    plus the pair stage's and the final attach — the rule directions
    are an explode, NOT a union, so the pair stage plans once)."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    for name, allowed in (
        ("basket_frequent_pairs", 3),
        ("basket_association_rules", 6),
    ):
        plan = (
            Q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        n = plan.count("BroadcastNestedLoopJoin")
        assert n <= allowed, f"{name}: {n} nested-loop joins"
        assert "BroadcastHashJoin" in plan, name


def test_lpa_plan_no_cartesian(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    plan = (
        Q["part_copurchase_communities"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r10_convergence_audit_plans(spark, sf_dir):
    """r10 tier: the convergence audits are unions of one-row delta
    aggs over checkpointed frames — no CartesianProduct anywhere;
    nested-loop joins only for the LPA audit's documented one-row
    (step × cycle) scalar attaches (one broadcast crossJoin per round
    that has a cycle delta, = LPA_ROUNDS)."""
    from bigdatamlteamrepo_spark.queries.graphs import LPA_ROUNDS
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    for name, allowed in (
        ("part_lpa_convergence_audit", LPA_ROUNDS),
        ("part_kcore_convergence_audit", 0),
    ):
        plan = (
            Q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        n = plan.count("BroadcastNestedLoopJoin")
        assert n <= allowed, f"{name}: {n} nested-loop joins"


def test_r10b_additions_plans(spark, sf_dir):
    """This session's tier — SCD2 build/PIT, link prediction, TextRank,
    Poisson bootstrap: every join must be a hash equi-join (the PIT
    lookup in particular must NOT plan the naive interval range join)."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    for name in (
        "customer_tier_scd2",
        "customer_tier_scd2_incremental",
        "events_tier_pit_counts",
        "part_link_prediction_topk",
        "corpus_textrank_keywords",
        "events_bootstrap_ci",
        "events_cdc_snapshot_diff",
        "brand_price_quantity_ols",
        "part_ppr_recommendations",
        "events_ab_test_purchase_rate",
        "events_cuped_adjusted_lift",
        "events_neyman_allocation",
        "events_hourly_forecast_backtest",
    ):
        plan = (
            Q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_r11_additions_plans(spark, sf_dir):
    """Round-11 tier — OHLC bars, day-decomposed TWAP, CUSUM monitor:
    hash equi-joins only, and OHLC must stay a single-aggregate plan
    (open/close ride min_by/max_by, no window over the raw stream)."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    for name in (
        "events_value_ohlc_hourly",
        "events_value_twap",
        "events_cusum_changepoint",
        "part_pareto_frontier",
        "source_quality_auc",
        "part_bfs_hop_census",
        "brand_weighted_median_price",
        "sessions_peak_concurrency",
        "source_token_gini",
        # the range-join face exists to AVOID the BroadcastNestedLoopJoin
        # a naive ts-BETWEEN join plans; its island frame (whose scalar
        # threshold uses the one-row-broadcast house pattern) is
        # truncated at construction, so the visible plan must be clean
        "purchases_in_error_bursts",
    ):
        plan = (
            Q[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    ohlc = (
        Q["events_value_ohlc_hourly"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in ohlc


def test_r12_additions_plans(spark, sf_dir):
    """Round-12 tier — the interval×interval overlap face: the whole
    point of the binned overlap join is avoiding the
    BroadcastNestedLoopJoin a naive ls<re AND rs<le join plans, so the
    executed plan must contain only hash equi-joins (both interval
    frames are truncated at construction, hiding their one-row
    threshold broadcasts from the visible plan)."""
    from bigdatamlteamrepo_spark.queries.registry import QUERIES as Q

    plan = (
        Q["session_burst_overlap"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
