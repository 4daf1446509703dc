"""Sketch-tier properties beyond oracle parity: the statistical
guarantees each sketch advertises, and the plan shapes that make them
the scale path."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.pagerank import integer_pagerank
from bigdatamlteamrepo_spark.queries.sketches import (
    cms_heavy_suppliers,
    hll_orders_by_flag,
    kmv_distinct_parts,
    pagerank_nation_trade,
)


def test_hll_estimate_within_error_bound(spark, sf_dir):
    # 256 registers → standard error 1.04/sqrt(256) = 6.5%; assert 3σ
    rows = hll_orders_by_flag(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r.hll_estimate - r.exact_distinct) / max(r.exact_distinct, 1)
        assert rel < 0.20, (r.l_returnflag, r.exact_distinct, r.hll_estimate)


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    # k=64 → standard error ~1/sqrt(64-2) = 12.7%; assert 3σ (or exact
    # when the sketch never filled)
    r = kmv_distinct_parts(spark, sf_dir).collect()[0]
    if r.n_kept < 64:
        assert r.kmv_estimate == float(r.exact_distinct)
    else:
        rel = abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct
        assert rel < 0.40, (r.exact_distinct, r.kmv_estimate)


def test_cms_never_underestimates(spark, sf_dir):
    rows = cms_heavy_suppliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.true_count, r
    # width 1024 >> distinct suppliers at test SFs: the min over 4 rows
    # should be exact for most heavy hitters
    exact = sum(1 for r in rows if r.cms_estimate == r.true_count)
    assert exact >= len(rows) // 2


def test_hll_duplicate_insensitive(spark, sf_dir):
    # estimate(X ∪ X) == estimate(X): register maxes never move on
    # duplicates — the property that makes HLL a DISTINCT sketch
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries.sketches import _hll_estimate_over

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    once = _hll_estimate_over(li, "l_orderkey").collect()[0].hll_estimate
    doubled = _hll_estimate_over(li.union(li), "l_orderkey").collect()[0].hll_estimate
    assert once == doubled


def test_cms_counters_merge(spark, sf_dir):
    # counters(A) + counters(B) == counters(A ∪ B): the algebraic-
    # aggregate property that lets the grid build map-side at any scale
    from pyspark.sql import functions as F

    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.operators.sketches import cms_counters

    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 != 0)
    merged = {
        (r.j, r.bucket): r.total
        for r in (
            cms_counters(a, "l_suppkey")
            .union(cms_counters(b, "l_suppkey"))
            .groupBy("j", "bucket")
            .agg(F.sum("cnt").alias("total"))
            .collect()
        )
    }
    full = {
        (r.j, r.bucket): r.cnt for r in cms_counters(li, "l_suppkey").collect()
    }
    assert merged == full


def test_theta_overlap_sanity(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.sketches import theta_customer_overlap

    r = theta_customer_overlap(spark, sf_dir).collect()[0]
    assert 0 < r.theta <= 1 << 60
    assert r.n_common >= 0
    # k=64 intersections carry amplified variance; assert the estimate
    # is the right order of magnitude, not a tight bound
    if r.exact_overlap > 0:
        assert r.est_overlap / r.exact_overlap < 3.0
        assert r.est_overlap / r.exact_overlap > 1 / 3.0


def test_bloom_no_false_negatives(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.sketches import bloom_semijoin_orders

    r = bloom_semijoin_orders(spark, sf_dir).collect()[0]
    # the bloom guarantee: every true member passes (FPs allowed, FNs never)
    assert r.n_passed >= r.n_true
    assert r.n_false_positive == r.n_passed - r.n_true
    assert r.n_true > 0, "fixture filter selected no customers"


def test_pagerank_mass_and_determinism(spark):
    # Fixed 4-node graph with a known structure: A→B→C→A cycle + D→A.
    edges = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 1), (2, 0, 2), (3, 0, 5)],
        "src int, dst int, weight int",
    )
    r1 = {r.node: r.rank for r in integer_pagerank(edges, n_iter=10).collect()}
    r2 = {
        r.node: r.rank
        for r in integer_pagerank(edges.repartition(7), n_iter=10).collect()
    }
    assert r1 == r2, "rank must not depend on partitioning"
    scale = 10**9
    # teleport floor for every node; D receives only teleport (no in-edges)
    assert r1[3] == 15 * scale // 100
    # total mass bounded by initial mass (floor losses only shrink it)
    assert sum(r1.values()) <= 4 * scale
    # cycle members accumulate D's donation: all above teleport
    for n in (0, 1, 2):
        assert r1[n] > r1[3]


def test_pagerank_nation_trade_shape(spark, sf_dir):
    rows = pagerank_nation_trade(spark, sf_dir).collect()
    assert len(rows) == 25
    ranks = [r.rank_scaled for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r.rank_scaled >= 15 * 10**9 // 100 for r in rows)


def test_sketch_plans_no_cartesian_and_broadcast_counters(spark, sf_dir):
    for fn in (hll_orders_by_flag, cms_heavy_suppliers):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
    # HLL never shuffles distinct raw values: the register aggregation
    # must be a partial/final HashAggregate pair, not an expand-distinct
    hll_plan = (
        hll_orders_by_flag(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in hll_plan


def test_catalog_analyze_approx_ndv_bound(spark, sf_dir):
    """The sketch-tier ANALYZE (column_stats approx_ndv=True — the
    documented 100 TB path of catalog_column_stats): HLL-estimated NDV
    must track the exact countDistinct within ~3 sigma of the p=6
    sketch's 13% rsd on every profiled catalog column, and all
    non-NDV columns must be identical to the exact path."""
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.operators.stats import column_stats
    from bigdatamlteamrepo_spark.queries.analytic import _CATALOG_STATS_COLS

    for t, cols in _CATALOG_STATS_COLS.items():
        df = load_table(spark, sf_dir, t)
        exact = {r.column_name: r for r in column_stats(df, cols).collect()}
        approx = {
            r.column_name: r
            for r in column_stats(df, cols, approx_ndv=True).collect()
        }
        assert set(exact) == set(approx)
        for c in exact:
            e, a = exact[c], approx[c]
            assert abs(a.ndv - e.ndv) <= max(2, 0.4 * e.ndv), (t, c, e.ndv, a.ndv)
            assert (a.n_rows, a.n_nulls, a.min_value, a.max_value) == (
                e.n_rows, e.n_nulls, e.min_value, e.max_value,
            ), (t, c)


def test_quantile_sketch_cdf_bound(spark, sf_dir):
    """Bottom-k-by-hash quantile sketch: the empirical CDF at each
    estimate must sit within ±0.1 of the target rank (3σ of the k=256
    sample's rank error), per event type."""
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries import QUERIES
    from pyspark.sql import functions as F

    est = {
        r.event_type: r
        for r in QUERIES["events_value_quantile_sketch"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    for etype, row in est.items():
        vals = ev.filter(F.col("event_type") == etype)
        n = vals.count()
        assert row.n == n
        for p in (10, 50, 90, 99):
            e = getattr(row, f"p{p}_est")
            cdf = vals.filter(F.col("value") <= e).count() / n
            assert abs(cdf - p / 100) <= 0.1, (etype, p, e, cdf)


def test_quantile_sketch_is_mergeable(spark, sf_dir):
    """KMV-style mergeability: the bottom-k of the union equals the
    bottom-k of the concatenated per-split bottom-k's — the property
    that makes the sketch a distributed aggregate."""
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.operators.sketches import h60
    from bigdatamlteamrepo_spark.queries.sketches import QSK_K
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        h60(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("|"),
                F.unix_micros("ts").cast("string"),
            )
        ).alias("h"),
    ).filter(F.col("event_type") == "view")
    whole = [
        (r.h, r.value)
        for r in ev.orderBy("h", "value").limit(QSK_K).collect()
    ]
    parts = []
    for m in range(3):  # 3 disjoint "partitions"
        parts += [
            (r.h, r.value)
            for r in ev.filter(F.pmod(F.col("h"), F.lit(3)) == m)
            .orderBy("h", "value")
            .limit(QSK_K)
            .collect()
        ]
    merged = sorted(parts)[:QSK_K]
    assert merged == sorted(whole)


def test_quantile_sketch_key_is_null_propagating(spark):
    """A NULL key component must exclude the row from the sample in
    BOTH engines: the Spark key uses NULL-propagating concat (h60 ->
    NULL -> fails every h < cutoff comparison), matching the oracle's
    || semantics.  concat_ws would silently skip the NULL part and
    admit the row on the Spark side only."""
    from bigdatamlteamrepo_spark.operators.sketches import h60
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 100, 5.0), (None, 200, 6.0), (3, None, 7.0)],
        "user_id long, ts_us long, value double",
    )
    h = df.select(
        h60(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("|"),
                F.col("ts_us").cast("string"),
            )
        ).alias("h")
    ).collect()
    assert h[0].h is not None
    assert h[1].h is None and h[2].h is None


def test_streaming_round_twin_matches_spark_half_up():
    """_round_half_up_6 must round decimal-tie doubles UP like Spark's
    F.round (BigDecimal HALF_UP on the shortest repr), where Python's
    builtin round() is half-even on the binary value."""
    from bigdatamlteamrepo_spark.streaming.stateful import _round_half_up_6

    # true divergence values: the binary double sits slightly BELOW the
    # decimal .5, so the builtin (half-even on the binary value) rounds
    # down while Spark (HALF_UP on the shortest decimal repr) rounds up
    assert _round_half_up_6(5e-07) == 1e-06
    assert round(5e-07, 6) == 0.0  # the builtin disagrees
    assert _round_half_up_6(0.1234565) == 0.123457
    assert round(0.1234565, 6) == 0.123456  # the builtin disagrees
    # agreement cases stay identical
    assert _round_half_up_6(2.0000004) == 2.0
    assert _round_half_up_6(1.25) == 1.25
