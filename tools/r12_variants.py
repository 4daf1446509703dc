#!/usr/bin/env python
"""r12 optimization A/B probe: candidate restructures of the heavy
headliners measured head-to-head against the current implementations,
interleaved run-by-run in ONE session so host drift hits both arms
equally (guide §1).  Winners get folded into the query modules; this
file is the measurement record, not product code.

Usage: python tools/r12_variants.py [substring|passage|tfidf|lm|novelty|lpa] ...
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
    for i in range(RUNS):
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
# substring: window-count / localCheckpoint vs current groupBy+join
# --------------------------------------------------------------------

def substring(spark) -> None:
    from bigdatamlteamrepo_spark.queries.passages import (
        SPAN_W,
        merge_windows_to_spans,
        window_hashes,
    )
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens

    docs = _with_tokens(spark, SF)

    def spans_current() -> DataFrame:
        wins = window_hashes(docs, SPAN_W)
        dup = (
            wins.groupBy("h")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 2)
        )
        dw = wins.join(dup.select("h"), "h").select("doc_id", "source", "start")
        return merge_windows_to_spans(dw, SPAN_W)

    def spans_window() -> DataFrame:
        wins = window_hashes(docs, SPAN_W)
        cnt = F.count(F.lit(1)).over(Window.partitionBy("h"))
        dw = (
            wins.withColumn("cnt", cnt)
            .filter(F.col("cnt") >= 2)
            .select("doc_id", "source", "start")
        )
        return merge_windows_to_spans(dw, SPAN_W)

    def spans_ckpt() -> DataFrame:
        wins = window_hashes(docs, SPAN_W).localCheckpoint(eager=True)
        dup = (
            wins.groupBy("h")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 2)
        )
        dw = wins.join(dup.select("h"), "h").select("doc_id", "source", "start")
        return merge_windows_to_spans(dw, SPAN_W)

    check_equal(spans_current(), spans_window(), "substring window")
    ab(
        "substring spans",
        {"current": spans_current, "window": spans_window, "ckpt": spans_ckpt},
    )


# --------------------------------------------------------------------
# passage dedup: window collect_set vs groupBy+join
# --------------------------------------------------------------------

def passage(spark) -> None:
    from bigdatamlteamrepo_spark.queries.passages import passage_keys
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens

    docs = _with_tokens(spark, SF)

    def cur() -> DataFrame:
        p = passage_keys(docs)
        d = p.groupBy("pkey").agg(F.countDistinct("doc_id").alias("ndocs"))
        j = p.join(d, "pkey")
        is_dup = F.col("ndocs") >= 2
        return j.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(is_dup.cast("int")).cast("bigint").alias("n_dup_instances"),
            F.countDistinct(F.when(is_dup, F.col("doc_id")))
            .cast("bigint")
            .alias("n_docs_with_dup"),
        )

    def win() -> DataFrame:
        p = passage_keys(docs)
        ndocs = F.size(F.collect_set("doc_id").over(Window.partitionBy("pkey")))
        j = p.withColumn("ndocs", ndocs)
        is_dup = F.col("ndocs") >= 2
        return j.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(is_dup.cast("int")).cast("bigint").alias("n_dup_instances"),
            F.countDistinct(F.when(is_dup, F.col("doc_id")))
            .cast("bigint")
            .alias("n_docs_with_dup"),
        )

    check_equal(cur(), win(), "passage window")
    ab("passage dedup", {"current": cur, "window": win})


# --------------------------------------------------------------------
# tfidf: df via window over tf vs distinct+groupBy+join
# --------------------------------------------------------------------

def tfidf(spark) -> None:
    from bigdatamlteamrepo_spark.functions.text import ensure_tokens
    from bigdatamlteamrepo_spark.queries.passages import (
        _MICRO,
        tfidf_top_terms,
    )
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens

    docs = _with_tokens(spark, SF)

    def cur() -> DataFrame:
        return tfidf_top_terms(docs)

    def win() -> DataFrame:
        t = ensure_tokens(docs, "doc_id")
        td = t.filter(F.size("toks") > 0).select(
            "doc_id", F.explode("toks").alias("term")
        )
        n_docs = t.filter(F.size("toks") > 0).agg(
            F.count(F.lit(1)).alias("n_docs")
        )
        tf = td.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        # df = rows per term in tf (tf is distinct on (doc, term)),
        # attached by a window — no second explode, no distinct branch
        dfc = F.count(F.lit(1)).over(Window.partitionBy("term"))
        scored = (
            tf.withColumn("df", dfc)
            .crossJoin(F.broadcast(n_docs))
            .select(
                "doc_id",
                "term",
                F.col("tf").cast("bigint").alias("tf"),
                F.col("df").cast("bigint").alias("df"),
                (
                    F.col("tf")
                    * F.round(
                        F.log(
                            F.col("n_docs").cast("double") / F.col("df")
                        )
                        * _MICRO
                    ).cast("bigint")
                ).cast("bigint").alias("tfidf_micro"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_micro"), "term")
        return scored.withColumn(
            "rnk", F.row_number().over(w).cast("bigint")
        ).filter(F.col("rnk") <= 3)

    check_equal(cur(), win(), "tfidf window")
    ab("tfidf", {"current": cur, "window": win})


# --------------------------------------------------------------------
# add-k LM: window c_xy/c_x vs agg+join; localCheckpoint arm
# --------------------------------------------------------------------

def lm(spark) -> None:
    from bigdatamlteamrepo_spark.functions.text import ensure_tokens, shingles
    from bigdatamlteamrepo_spark.queries.textmodel import (
        LM_K,
        MICRO,
        lm_perplexity_frame,
    )
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens

    docs = _with_tokens(spark, SF)

    def cur() -> DataFrame:
        return lm_perplexity_frame(docs)

    def _bg(t) -> DataFrame:
        return t.filter(F.size("toks") >= 2).select(
            "doc_id",
            "lang",
            F.explode(shingles(F.col("toks"), 2)).alias("bigram"),
        )

    def win() -> DataFrame:
        t = ensure_tokens(docs, "doc_id", "lang")
        bg = _bg(t)
        vsz = t.select(F.explode("toks").alias("tok")).agg(
            F.countDistinct("tok").alias("vsz")
        )
        c_xy = F.count(F.lit(1)).over(Window.partitionBy("bigram"))
        c_x = F.count(F.lit(1)).over(Window.partitionBy("x"))
        scored = (
            bg.withColumn("c_xy", c_xy)
            .withColumn("x", F.split("bigram", " ")[0])
            .withColumn("c_x", c_x)
            .crossJoin(F.broadcast(vsz))
            .select(
                "doc_id",
                "lang",
                F.round(
                    F.log(
                        (F.col("c_xy") + F.lit(LM_K))
                        / (F.col("c_x") + F.lit(LM_K) * F.col("vsz"))
                    )
                    * MICRO
                ).cast("bigint").alias("lp_micro"),
            )
        )
        agg = scored.groupBy("doc_id", "lang").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").cast("bigint").alias("lp_sum_micro"),
        )
        mean_lp = (
            F.col("lp_sum_micro").cast("double") / MICRO / F.col("n_bigrams")
        )
        w = Window.partitionBy("lang").orderBy(
            (F.col("lp_sum_micro").cast("double") / F.col("n_bigrams")).desc(),
            "doc_id",
        )
        return agg.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "lp_sum_micro",
            F.round(F.exp(-mean_lp), 6).alias("perplexity"),
            F.ntile(3).over(w).cast("bigint").alias("ppl_tercile"),
        )

    def ckpt() -> DataFrame:
        t = ensure_tokens(docs, "doc_id", "lang")
        bg = _bg(t)
        lm = (
            bg.groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("c_xy"))
            .localCheckpoint(eager=True)
        )
        uni = (
            lm.withColumn("x", F.split("bigram", " ")[0])
            .groupBy("x")
            .agg(F.sum("c_xy").cast("bigint").alias("c_x"))
        )
        vsz = t.select(F.explode("toks").alias("tok")).agg(
            F.countDistinct("tok").alias("vsz")
        )
        lp = F.log(
            (F.col("c_xy") + F.lit(LM_K))
            / (F.col("c_x") + F.lit(LM_K) * F.col("vsz"))
        )
        lmx = (
            lm.withColumn("x", F.split("bigram", " ")[0])
            .join(uni, "x")
            .select("bigram", "c_xy", "c_x")
        )
        scored = (
            bg.join(lmx, "bigram")
            .crossJoin(F.broadcast(vsz))
            .select(
                "doc_id",
                "lang",
                F.round(lp * MICRO).cast("bigint").alias("lp_micro"),
            )
        )
        agg = scored.groupBy("doc_id", "lang").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").cast("bigint").alias("lp_sum_micro"),
        )
        mean_lp = (
            F.col("lp_sum_micro").cast("double") / MICRO / F.col("n_bigrams")
        )
        w = Window.partitionBy("lang").orderBy(
            (F.col("lp_sum_micro").cast("double") / F.col("n_bigrams")).desc(),
            "doc_id",
        )
        return agg.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "lp_sum_micro",
            F.round(F.exp(-mean_lp), 6).alias("perplexity"),
            F.ntile(3).over(w).cast("bigint").alias("ppl_tercile"),
        )

    check_equal(cur(), win(), "lm window")
    check_equal(cur(), ckpt(), "lm ckpt")
    ab("lm perplexity", {"current": cur, "window": win, "ckpt": ckpt})


# --------------------------------------------------------------------
# KN LM: checkpoint the Zipf-collapsed model table once — the current
# plan recomputes the corpus bigram aggregation for EVERY model
# statistic (ctx / back / b): per-consumer column pruning makes the
# subtrees differ, so ReuseExchange never fires (4 corpus scans in
# plans/r12/doc_lm_perplexity_kn_before.txt).
# --------------------------------------------------------------------

def kn(spark) -> None:
    from bigdatamlteamrepo_spark.functions.text import ensure_tokens, shingles
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens
    from bigdatamlteamrepo_spark.queries.textmodel import (
        KN_D,
        MICRO,
        kn_bigram_model,
    )

    docs = _with_tokens(spark, SF)

    def _score(model: DataFrame) -> DataFrame:
        bg = (
            ensure_tokens(docs, "doc_id", "lang")
            .filter(F.size("toks") >= 2)
            .select(
                "doc_id",
                "lang",
                F.explode(shingles(F.col("toks"), 2)).alias("bigram"),
            )
        )
        p = (F.col("c_xy") - KN_D) / F.col("c_x") + (
            F.lit(KN_D) * F.col("n1f") / F.col("c_x")
        ) * (F.col("n1b").cast("double") / F.col("n_bigram_types"))
        scored = bg.join(model, "bigram").select(
            "doc_id",
            "lang",
            F.round(F.log(p) * MICRO).cast("bigint").alias("lp_micro"),
        )
        agg = scored.groupBy("doc_id", "lang").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").cast("bigint").alias("lp_sum_micro"),
        )
        mean_lp = (
            F.col("lp_sum_micro").cast("double") / MICRO / F.col("n_bigrams")
        )
        w = Window.partitionBy("lang").orderBy(
            (F.col("lp_sum_micro").cast("double") / F.col("n_bigrams")).desc(),
            "doc_id",
        )
        return agg.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "lp_sum_micro",
            F.round(F.exp(-mean_lp), 6).alias("perplexity"),
            F.ntile(3).over(w).cast("bigint").alias("ppl_tercile"),
        )

    def cur() -> DataFrame:
        return _score(kn_bigram_model(docs))

    def _model_ckpt() -> DataFrame:
        bgp = (
            ensure_tokens(docs, "doc_id", "lang")
            .filter(F.size("toks") >= 2)
            .select(F.explode(shingles(F.col("toks"), 2)).alias("bigram"))
        )
        lmx = (
            bgp.groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("c_xy"))
            .select(
                "bigram",
                "c_xy",
                F.split("bigram", " ")[0].alias("x"),
                F.split("bigram", " ")[1].alias("y"),
            )
            .localCheckpoint(eager=True)
        )
        ctx = lmx.groupBy("x").agg(
            F.sum("c_xy").cast("bigint").alias("c_x"),
            F.count(F.lit(1)).alias("n1f"),
        )
        back = lmx.groupBy("y").agg(F.count(F.lit(1)).alias("n1b"))
        b = lmx.agg(F.count(F.lit(1)).alias("n_bigram_types"))
        return (
            lmx.join(ctx, "x")
            .join(back, "y")
            .crossJoin(F.broadcast(b))
            .select("bigram", "c_xy", "c_x", "n1f", "n1b", "n_bigram_types")
        )

    def ckpt() -> DataFrame:
        return _score(_model_ckpt())

    def win() -> DataFrame:
        """c_xy/c_x/n1f/n1b attached by windows over the doc-keyed
        stream itself (1 stream eval + 1 for B) vs the count-table
        build's 10 scans."""
        bg = (
            ensure_tokens(docs, "doc_id", "lang")
            .filter(F.size("toks") >= 2)
            .select(
                "doc_id",
                "lang",
                F.explode(shingles(F.col("toks"), 2)).alias("bigram"),
            )
            .withColumn("x", F.split("bigram", " ")[0])
            .withColumn("y", F.split("bigram", " ")[1])
        )
        b = (
            ensure_tokens(docs, "doc_id")
            .filter(F.size("toks") >= 2)
            .select(F.explode(shingles(F.col("toks"), 2)).alias("bigram"))
            .agg(F.countDistinct("bigram").alias("n_bigram_types"))
        )
        wb = Window.partitionBy("bigram")
        wx = Window.partitionBy("x")
        wy = Window.partitionBy("y")
        scored_in = (
            bg.withColumn("c_xy", F.count(F.lit(1)).over(wb))
            .withColumn("c_x", F.count(F.lit(1)).over(wx))
            .withColumn("n1f", F.size(F.collect_set("bigram").over(wx)))
            .withColumn("n1b", F.size(F.collect_set("bigram").over(wy)))
            .crossJoin(F.broadcast(b))
        )
        p = (F.col("c_xy") - KN_D) / F.col("c_x") + (
            F.lit(KN_D) * F.col("n1f") / F.col("c_x")
        ) * (F.col("n1b").cast("double") / F.col("n_bigram_types"))
        scored = scored_in.select(
            "doc_id",
            "lang",
            F.round(F.log(p) * MICRO).cast("bigint").alias("lp_micro"),
        )
        agg = scored.groupBy("doc_id", "lang").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").cast("bigint").alias("lp_sum_micro"),
        )
        mean_lp = (
            F.col("lp_sum_micro").cast("double") / MICRO / F.col("n_bigrams")
        )
        w = Window.partitionBy("lang").orderBy(
            (F.col("lp_sum_micro").cast("double") / F.col("n_bigrams")).desc(),
            "doc_id",
        )
        return agg.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "lp_sum_micro",
            F.round(F.exp(-mean_lp), 6).alias("perplexity"),
            F.ntile(3).over(w).cast("bigint").alias("ppl_tercile"),
        )

    check_equal(cur(), ckpt(), "kn ckpt")
    check_equal(cur(), win(), "kn win")
    ab("kn perplexity", {"current": cur, "ckpt": ckpt, "win": win})


# --------------------------------------------------------------------
# novelty: window min over gram stream vs two aggs + join
# --------------------------------------------------------------------

def novelty(spark) -> None:
    from bigdatamlteamrepo_spark.queries.curation import (
        _doc_grams,
        ngram_novelty,
    )
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens

    docs = _with_tokens(spark, SF)

    def cur() -> DataFrame:
        return ngram_novelty(docs)

    def win() -> DataFrame:
        g = _doc_grams(docs).select("doc_id", "g")
        first = F.min("doc_id").over(Window.partitionBy("g"))
        seen = (F.col("__first") < F.col("doc_id")).cast("int")
        per = (
            g.withColumn("__first", first)
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
                F.sum(seen).cast("bigint").alias("n_seen_before"),
            )
        )
        return per.select(
            "doc_id",
            "n_ngrams",
            "n_seen_before",
            (
                F.lit(1.0)
                - F.col("n_seen_before").cast("double") / F.col("n_ngrams")
            ).alias("novelty"),
        )

    check_equal(cur(), win(), "novelty window")
    ab("novelty", {"current": cur, "window": win})


# --------------------------------------------------------------------
# LPA: lazy label chain vs per-round truncate
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

    def lazy() -> DataFrame:
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

    check_equal(cur(), lazy(), "lpa lazy")
    ab("lpa", {"current": cur, "lazy": lazy})


def shingle(spark) -> None:
    """doc_shared_shingle_stats: corpus-frequency attach via window
    count over the exploded stream vs the current groupBy + join-back
    (the same §2.3/§2.4 pattern the substring/passage faces got)."""
    from bigdatamlteamrepo_spark.queries.text_dedup import _shingle_sets_m

    def cur() -> DataFrame:
        sets = _shingle_sets_m(spark, SF)
        ex = sets.select("doc_id", F.explode("s").alias("g"))
        freq = ex.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
        shared = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("long")
        n = F.count(F.lit(1))
        return (
            ex.join(freq, "g")
            .groupBy("doc_id")
            .agg(
                n.alias("n_shingles"),
                shared.alias("n_shared"),
                (shared.cast("double") / n).alias("shared_frac"),
            )
        )

    def win() -> DataFrame:
        sets = _shingle_sets_m(spark, SF)
        ex = sets.select("doc_id", F.explode("s").alias("g"))
        nd = F.count(F.lit(1)).over(Window.partitionBy("g"))
        shared = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("long")
        n = F.count(F.lit(1))
        return (
            ex.withColumn("nd", nd)
            .groupBy("doc_id")
            .agg(
                n.alias("n_shingles"),
                shared.alias("n_shared"),
                (shared.cast("double") / n).alias("shared_frac"),
            )
        )

    check_equal(cur(), win(), "shingle window")
    ab("doc_shared_shingle_stats", {"current": cur, "window": win})


PROBES = {
    "substring": substring,
    "passage": passage,
    "tfidf": tfidf,
    "lm": lm,
    "kn": kn,
    "novelty": novelty,
    "lpa": lpa,
    "shingle": shingle,
}


def main() -> None:
    spark = get_spark(app_name="r12-variants")
    stagecache.disable()
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        PROBES[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
