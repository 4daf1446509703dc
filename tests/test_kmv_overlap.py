"""KMV set algebra: sketch-only union/Jaccard estimates must be EXACT
when the union fits in the sketch, close on larger sets, and the
bottom-k window must execute with group-limit pushdown (nothing sorts a
full source's gram set)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.sketches import source_ngram_overlap_kmv


def test_small_sets_are_exact(spark, tmp_path):
    # two sources, ~30 distinct 3-grams each, known overlap — well under
    # KMV_K=64, so the sketches ARE the sets and every estimate is exact
    shared = " ".join(f"s{i}" for i in range(20))  # 18 shared 3-grams
    a_only = " ".join(f"a{i}" for i in range(12))
    b_only = " ".join(f"b{i}" for i in range(12))
    rows = [
        (0, "en", shared + " " + a_only, "srcA", 1),
        (1, "en", shared + " " + b_only, "srcB", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string, source string, n_chars int"
    )
    d = str(tmp_path / "documents.parquet")
    df.write.parquet(d)
    # the query loads from sf_dir; give it a dir with just documents
    r = source_ngram_overlap_kmv(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    # doc A grams: 20+12+? boundary grams across shared→a_only join point
    # compute exact via spark for robustness
    from bigdatamlteamrepo_spark.functions.text import ensure_tokens, shingles

    g = (
        ensure_tokens(df, "doc_id", "source")
        .select("source", F.explode(shingles(F.col("toks"), 3)).alias("g"))
        .distinct()
    )
    sets = {
        s: {x["g"] for x in g.filter(F.col("source") == s).collect()}
        for s in ("srcA", "srcB")
    }
    inter = len(sets["srcA"] & sets["srcB"])
    union = len(sets["srcA"] | sets["srcB"])
    assert row["est_a"] == float(len(sets["srcA"]))
    assert row["est_b"] == float(len(sets["srcB"]))
    assert row["est_union"] == float(union)
    assert row["k_int"] == inter
    assert row["jaccard_ppm"] == (2 * inter * 1_000_000 + union) // (2 * union)


def test_estimates_close_on_real_corpus(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.text_dedup import _with_tokens
    from bigdatamlteamrepo_spark.functions.text import ensure_tokens, shingles

    rows = source_ngram_overlap_kmv(spark, sf_dir).collect()
    n_src = len({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    # exact union for the lexicographically first pair
    first = min(rows, key=lambda r: (r["source_a"], r["source_b"]))
    g = (
        ensure_tokens(_with_tokens(spark, sf_dir), "doc_id", "source")
        .filter(F.col("source").isin(first["source_a"], first["source_b"]))
        .select("source", F.explode(shingles(F.col("toks"), 3)).alias("g"))
        .distinct()
    )
    union = g.select("g").distinct().count()
    # KMV with k=64: relative error ~ 1/sqrt(62) ≈ 13%; allow 3σ
    assert abs(first["est_union"] - union) / union < 0.4


def test_bottom_k_window_uses_group_limit_pushdown(spark, sf_dir):
    plan = (
        source_ngram_overlap_kmv(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_join_size_estimate_accuracy(spark):
    """Correlated sampling with a 1/64 key slice: on a 20k-key join the
    estimate must land within 3 standard errors (the key sample is
    ~312 keys → se/mean ≈ 1/sqrt(312) ≈ 5.7%)."""
    from pyspark.sql import functions as F

    from bigdatamlteamrepo_spark.operators.sketches import POW60, h60
    from bigdatamlteamrepo_spark.queries.sketches import JOIN_SAMPLE_SHIFT

    n_keys = 20_000
    fact = spark.range(n_keys * 3).select(
        (F.col("id") % n_keys).alias("k")
    )  # every key ×3
    dim = spark.range(n_keys).select(F.col("id").alias("k"))
    thr = POW60 >> JOIN_SAMPLE_SHIFT
    sampled = (
        fact.filter(h60(F.col("k")) < thr).join(dim, "k").count()
        * (1 << JOIN_SAMPLE_SHIFT)
    )
    exact = n_keys * 3
    assert abs(sampled - exact) / exact < 0.18  # 3σ


def test_join_size_estimates_rows(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.sketches import join_size_estimates

    rows = {r["join_name"]: r for r in join_size_estimates(spark, sf_dir).collect()}
    assert set(rows) == {"orders_lineitem", "part_lineitem"}
    for r in rows.values():
        assert r["est_pairs"] > 0 and r["exact_pairs"] > 0
        assert r["est_pairs"] % (1 << 6) == 0  # scaled sample count
