#!/usr/bin/env python
"""r13 optimization A/B probe: candidate restructures of the remaining
heavy headliners measured head-to-head against the current
implementations, interleaved run-by-run in ONE session so host drift
hits both arms equally (guide §1).  Winners get folded into the query
modules; this file is the measurement record, not product code.

Usage: python tools/r13_variants.py [substring|neardup|lpa|bootstrap|burst] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark import get_spark, stagecache

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 5


def ab(name: str, arms: dict[str, callable]) -> None:
    """Interleave arms run-by-run; report min/median per arm."""
    times: dict[str, list[float]] = {k: [] for k in arms}
    for k, fn in arms.items():  # warm-up each arm once
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(RUNS):
        for k, fn in arms.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    print(f"== {name} ==")
    for k, ts in times.items():
        ts = sorted(ts)
        print(
            f"  {k:28s} min={ts[0]:6.2f} med={ts[len(ts) // 2]:6.2f}"
            f" all={['%.2f' % t for t in ts]}",
            flush=True,
        )


def check_equal(a: DataFrame, b: DataFrame, name: str) -> None:
    """Order-insensitive equality of two frames (column-sorted)."""
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols, f"{name}: columns differ"
    d1 = a.select(cols).exceptAll(b.select(cols)).count()
    d2 = b.select(cols).exceptAll(a.select(cols)).count()
    assert d1 == 0 and d2 == 0, f"{name}: rows differ ({d1}/{d2})"
    print(f"  {name}: EQUAL ({a.count()} rows)")


# --------------------------------------------------------------------
# substring spans: r13 xxhash64 prefilter vs r12 md5 window-count
# (both live in queries/passages.py behind the ``prefilter`` flag)
# --------------------------------------------------------------------

def substring(spark) -> None:
    from bigdatamlteamrepo_spark.queries.passages import dup_substring_spans
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens

    docs = _with_tokens(spark, SF)

    def pre() -> DataFrame:
        return dup_substring_spans(docs)

    def md5win() -> DataFrame:
        return dup_substring_spans(docs, prefilter=False)

    check_equal(pre(), md5win(), "substring prefilter")
    ab("dup_substring_spans", {"r12 md5-window": md5win, "r13 prefilter": pre})


# --------------------------------------------------------------------
# neardup_dedup_summary: current eager barrier chain (sets ckpt →
# bands ckpt → width collect → CC edges ckpt → count → union-find ckpt
# → agg: 7 jobs) vs LAZY checkpoints — same materialization points,
# but each checkpoint fills inside the job that first consumes it, so
# sequential barrier jobs collapse (guide §2.4: remove whole jobs).
# --------------------------------------------------------------------

def neardup(spark) -> None:
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.operators.graph import _local_components
    from bigdatamlteamrepo_spark.queries.pipeline import neardup_dedup_summary
    from bigdatamlteamrepo_spark.queries.text_dedup import (
        _JACCARD_MIN,
        _pair_jaccard,
        _shingle_sets,
        _with_tokens,
        lsh_band_rows,
        SALT_FACTOR,
        SALT_MIN_WIDTH,
    )

    def cur() -> DataFrame:
        return neardup_dedup_summary(spark, SF)

    def lazy() -> DataFrame:
        sets = _shingle_sets(spark, SF).localCheckpoint(eager=False)
        bands = lsh_band_rows(sets, F.col("s")).localCheckpoint(eager=False)
        widths = bands.groupBy("band").agg(F.count(F.lit(1)).alias("__w"))
        stats = widths.agg(F.avg("__w"), F.max("__w")).collect()[0]
        mean_w, max_w = stats[0], stats[1]
        thr = max(SALT_MIN_WIDTH, int(SALT_FACTOR * mean_w) if mean_w else 0)
        assert max_w is not None and max_w <= thr, "hot path not exercised"
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        ver = _pair_jaccard(cand, sets, _JACCARD_MIN, materialize=False)
        e = (
            ver.select(
                F.col("doc_a").cast("long").alias("a"),
                F.col("doc_b").cast("long").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        n = e.count()
        assert n <= 1_000_000
        labels = _local_components(e)
        docs = load_table(spark, SF, "documents").select(
            "doc_id", "source", "n_chars"
        )
        merged = docs.join(
            labels.select(F.col("node").alias("doc_id"), "component"),
            "doc_id",
            "left",
        ).withColumn("rep", F.coalesce("component", "doc_id"))
        return merged.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("doc_id") == F.col("rep")).cast("long")).alias(
                "n_kept"
            ),
            F.sum((F.col("doc_id") != F.col("rep")).cast("long")).alias(
                "n_removed"
            ),
        )

    check_equal(cur(), lazy(), "neardup lazy barriers")
    ab("neardup_dedup_summary", {"current": cur, "lazy": lazy})


# --------------------------------------------------------------------
# LPA: per-round exchange diet — one explicit repartition("node") after
# the neighbor join makes BOTH aggregations exchange-free
# (hashpartitioning(node) satisfies ClusteredDistribution(node, lbl)):
# 3 exchanges/round → 2, at the price of shuffling the un-aggregated
# candidate stream instead of (node, lbl) partials.
# --------------------------------------------------------------------

def lpa(spark) -> None:
    from bigdatamlteamrepo_spark.operators.checkpoint import truncate
    from bigdatamlteamrepo_spark.queries.graphs import (
        LPA_ROUNDS,
        _copurchase_edges,
        label_propagation,
    )

    def cur() -> DataFrame:
        return label_propagation(_copurchase_edges(spark, SF))

    def _lazy_chain(repart: bool) -> DataFrame:
        e = _copurchase_edges(spark, SF)
        adj = e.select(
            F.col("u").alias("node"), F.col("v").alias("nbr")
        ).unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        adj = truncate(adj)
        labels = adj.select("node").distinct().withColumn("lbl", F.col("node"))
        for _ in range(LPA_ROUNDS):
            cand = adj.join(
                labels.select(F.col("node").alias("nbr"), "lbl"), "nbr"
            ).select("node", "lbl")
            if repart:
                cand = cand.repartition(F.col("node"))
            cnt = cand.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
            labels = (
                cnt.groupBy("node")
                .agg(
                    F.max(
                        F.struct(F.col("c"), (-F.col("lbl")).alias("nl"))
                    ).alias("m")
                )
                .select("node", (-F.col("m.nl")).alias("lbl"))
            )
        return labels.select("node", F.col("lbl").alias("community"))

    def repart() -> DataFrame:
        return _lazy_chain(True)

    check_equal(cur(), repart(), "lpa repartition")
    ab("lpa", {"current": cur, "repartition(node)": repart})


# --------------------------------------------------------------------
# bootstrap: the md5 slices are compared against the Poisson thresholds
# as 8-hex STRINGS (fixed-width lowercase hex is order-isomorphic to
# the integer value), dropping the 32 conv() string→bigint parses per
# row; the ``hexarr`` arm additionally folds the s-explode into one
# posexplode over a 4-element m array.
# --------------------------------------------------------------------

def bootstrap(spark) -> None:
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries.bootstrap import (
        MICRO,
        N_REPLICATES,
        _THRESHOLDS,
        events_bootstrap_ci,
    )

    def cur() -> DataFrame:
        return events_bootstrap_ci(spark, SF)

    def _ev() -> DataFrame:
        return load_table(spark, SF, "events").select(
            "event_type",
            F.col("event_id").alias("rid"),
            F.expr(f"CAST(round(value * {MICRO}) AS BIGINT)").alias("v_micro"),
        )

    def _finish(reps: DataFrame, ev: DataFrame) -> DataFrame:
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

    hex_thr = [f"{t:08x}" for t in _THRESHOLDS]

    def hexcmp() -> DataFrame:
        ev = _ev()
        g = F.explode(
            F.sequence(F.lit(0), F.lit(N_REPLICATES // 4 - 1))
        ).alias("g")
        s = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("s")
        m_terms = " + ".join(
            f"(CASE WHEN __hs >= '{t}' THEN 1 ELSE 0 END)" for t in hex_thr
        )
        reps = (
            ev.select("event_type", F.col("rid"), F.col("v_micro").alias("__v"), g)
            .withColumn(
                "__d",
                F.md5(F.concat(F.col("rid").cast("string"), F.lit(":"), F.col("g"))),
            )
            .select("*", s)
            .withColumn("__hs", F.expr("substring(__d, 1 + 8 * s, 8)"))
            .withColumn("b", F.expr("g * 4 + s"))
            .withColumn("m", F.expr(m_terms))
            .groupBy("event_type", "b")
            .agg(
                F.expr(
                    "CAST((2 * SUM(m * __v) + SUM(m)) div (2 * SUM(m)) AS BIGINT)"
                ).alias("mean_b")
            )
        )
        return _finish(reps, ev)

    def hexarr() -> DataFrame:
        ev = _ev()
        g = F.explode(
            F.sequence(F.lit(0), F.lit(N_REPLICATES // 4 - 1))
        ).alias("g")

        def m_expr(s: int) -> str:
            hs = f"substring(__d, {1 + 8 * s}, 8)"
            return " + ".join(
                f"(CASE WHEN {hs} >= '{t}' THEN 1 ELSE 0 END)" for t in hex_thr
            )

        marr = F.expr(
            "array(" + ", ".join(m_expr(s) for s in range(4)) + ")"
        )
        reps = (
            ev.select("event_type", F.col("rid"), F.col("v_micro").alias("__v"), g)
            .withColumn(
                "__d",
                F.md5(F.concat(F.col("rid").cast("string"), F.lit(":"), F.col("g"))),
            )
            .select(
                "event_type",
                "__v",
                "g",
                F.posexplode(marr).alias("s", "m"),
            )
            .withColumn("b", F.expr("g * 4 + s"))
            .groupBy("event_type", "b")
            .agg(
                F.expr(
                    "CAST((2 * SUM(m * __v) + SUM(m)) div (2 * SUM(m)) AS BIGINT)"
                ).alias("mean_b")
            )
        )
        return _finish(reps, ev)

    check_equal(cur(), hexcmp(), "bootstrap hexcmp")
    check_equal(cur(), hexarr(), "bootstrap hexarr")
    ab(
        "events_bootstrap_ci",
        {"current": cur, "hexcmp": hexcmp, "hexarr": hexarr},
    )


# --------------------------------------------------------------------
# session_burst_overlap: both interval frames are truncated EAGERLY
# (2 barrier jobs) before the auto-bin aggregate collects its stats —
# lazy checkpoints let the auto-bin job materialize both in one pass.
# --------------------------------------------------------------------

def burst(spark) -> None:
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.operators.rangejoin import (
        interval_overlap_join,
    )
    from bigdatamlteamrepo_spark.queries.bursts import (
        hourly_bursts,
        session_burst_overlap,
        user_sessions_intervals,
    )

    def cur() -> DataFrame:
        return session_burst_overlap(spark, SF)

    def lazy() -> DataFrame:
        ev = load_table(spark, SF, "events")
        iv = hourly_bursts(
            ev.filter(F.col("event_type") == "error").select("ts")
        ).localCheckpoint(eager=False)
        sess = user_sessions_intervals(
            ev.select("user_id", "ts", "event_id")
        ).localCheckpoint(eager=False)
        matched = interval_overlap_join(
            sess.select("user_id", "s_start", "s_end"),
            iv,
            left_start="s_start",
            left_end="s_end",
            right_start="start_ts",
            right_end="end_ts",
        )
        o_us = F.least(
            F.unix_micros("end_ts"), F.unix_micros("s_end")
        ) - F.greatest(F.unix_micros("start_ts"), F.unix_micros("s_start"))
        per_iv = matched.groupBy("start_ts", "end_ts").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.sum(o_us).cast("bigint").alias("overlap_us"),
        )
        return iv.join(per_iv, ["start_ts", "end_ts"], "left").select(
            "start_ts",
            "end_ts",
            "n_hours",
            F.coalesce("n_sessions", F.lit(0)).cast("bigint").alias(
                "n_sessions"
            ),
            F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users"),
            F.coalesce("overlap_us", F.lit(0)).cast("bigint").alias(
                "overlap_us"
            ),
        )

    check_equal(cur(), lazy(), "burst lazy truncates")
    ab("session_burst_overlap", {"current": cur, "lazy": lazy})


PROBES = {
    "substring": substring,
    "neardup": neardup,
    "lpa": lpa,
    "bootstrap": bootstrap,
    "burst": burst,
}


def main() -> None:
    spark = get_spark(app_name="r13-variants")
    stagecache.disable()
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        PROBES[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
