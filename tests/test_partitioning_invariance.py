"""Partitioning-invariance: registered queries must produce identical
values regardless of shuffle width — the property that makes local
parity meaningful for a 1000-executor deployment.

The suite session runs at shuffle_partitions=8; here a representative
query per family (agg, window, dedup-join, sketch, ANN, packing) is
re-run at a different width via a temporary conf override and compared
row-for-row.  Queries built from F.sum(double) would fail this —
everything registered uses decimal-stable or order-independent
aggregation, which is exactly what this pins.
"""

from __future__ import annotations

import pytest

from bigdatamlteamrepo_spark.queries import QUERIES

REPRESENTATIVES = [
    "q1_pricing_summary",          # decimal-stable aggregation
    "customer_spend_ranks",        # window ranking family
    "ngram_jaccard_pairs",         # LSH dedup join + double ratio
    "hll_orders_by_flag",          # sketch algebra
    "ann_pq_adc_topk",             # PQ conditional-agg ADC + re-rank
    "doc_pack_plan_bucketed",      # bucketed cumsum packing
    "doc_lm_perplexity",           # fixed-point LM accumulation + ntile
    "dsir_importance_weights",     # broadcast-model integer LLR sums
    "part_cooccurrence_triangles", # multi-join graph motif counting
    "passage_dedup_summary",       # md5 passage-key df join-back
    "doc_tfidf_top_terms",         # integer tf*idf_micro ranking cutoff
    "doc_weighted_sample",         # E-S integer-exact key + TakeOrdered
    "catalog_column_stats",        # multi-table one-pass ANALYZE
    "vocab_zipf_fit",              # integer regression sums
    "doc_term_burstiness",         # integer VMR, half-away division
    "passage_neardup_pairs",       # passage-LSH band join + verify rollup
    "doc_ngram_novelty",           # first-occurrence min attribution
    "soft_dedup_weights",          # decimal 1/|C| sums over the rep chain
    "source_distinct_ngrams",      # two-level hashed distinct-type agg
    "corpus_datacard",             # decimal TTR mean + stack long format
    "embedding_mislabel_scores",   # broadcast centroids + micro-quantized sims
    "chunk_bm25_topk",             # global-stats BM25 + TakeOrdered float cutoff
    "events_value_twap",           # day-decomposed segment union + decimal fold
    "source_quality_auc",          # rank sums from running counts per score
    "purchases_in_error_bursts",   # island windows + binned range join
    "part_bfs_hop_census",         # iterative relax with per-round truncate
    "sessions_peak_concurrency",   # parallel prefix sum (Blelloch scan)
    "session_burst_overlap",       # two-sided binned overlap join
]


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=repr
    )


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_to_shuffle_width(spark, sf_dir, name):
    base = _rows(QUERIES[name](spark, sf_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        narrow = _rows(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == narrow
