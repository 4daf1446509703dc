"""Salted join: exact result parity with the plain join + measurable
spread of the hot key across reducer partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.skew import salted_join


def _skewed(spark, n=20_000, hot_share=0.5):
    """key 0 holds ``hot_share`` of the fact side; 99 cold keys split the rest."""
    fact = spark.range(n).select(
        F.when(F.col("id") < int(n * hot_share), 0)
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    build = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("dim_val"),
    )
    return fact, build


def test_salted_join_exact_parity(spark):
    fact, build = _skewed(spark)
    plain = fact.join(build, "k").select("fact_id", "dim_val")
    salted = salted_join(fact, build, "k", n_salts=8).select("fact_id", "dim_val")
    a = {(r.fact_id, r.dim_val) for r in plain.collect()}
    b = {(r.fact_id, r.dim_val) for r in salted.collect()}
    assert a == b
    assert len(b) == 20_000


def test_salted_join_spreads_hot_key(spark):
    fact, build = _skewed(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # observe raw layout
    try:
        def max_partition_rows(df):
            sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
            return max(sizes)

        plain = fact.join(build, "k")
        salted = salted_join(fact, build, "k", n_salts=8)
        plain_max = max_partition_rows(plain)
        salted_max = max_partition_rows(salted)
        # hot key = 10k rows in ONE partition unsalted; salted splits it ~8 ways
        assert plain_max >= 10_000
        assert salted_max <= plain_max / 2, (plain_max, salted_max)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_salted_left_join_keeps_unmatched(spark):
    fact, build = _skewed(spark, n=1000)
    # drop half the build keys → left join must keep unmatched fact rows
    build_half = build.filter(F.col("k") < 50)
    plain = fact.join(build_half, "k", "left")
    salted = salted_join(fact, build_half, "k", n_salts=4, how="left")
    assert plain.count() == salted.count() == 1000
    a = {(r.fact_id, r.dim_val) for r in plain.collect()}
    b = {(r.fact_id, r.dim_val) for r in salted.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# Default hot-bucket salting in the LSH band join (VERDICT_r8 #8)
# ---------------------------------------------------------------------------


def _boilerplate_corpus(spark, tmp_path, n_dup=120, n_normal=40):
    """Adversarial corpus: n_dup docs share ONE text (every band bucket
    they produce has width n_dup — the worst case a boilerplate crawl
    creates), plus n_normal distinct docs."""
    rows = []
    boiler = "terms of service apply to all users of this site " * 3
    for i in range(n_dup):
        rows.append((i, boiler, "en", "srcA", len(boiler)))
    for i in range(n_normal):
        txt = f"unique document number {i} with its own words w{i} x{i*7} y{i*13} z{i*29} plus filler"
        rows.append((n_dup + i, txt, "en", "srcB", len(txt)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sf = str(tmp_path / "boiler_sf")
    df.coalesce(2).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_lsh_salting_identical_pairs_on_boilerplate(spark, tmp_path):
    """salt='auto' (the default) and salt=None produce the IDENTICAL
    candidate-pair set on a corpus whose band buckets are pathological,
    and the hot branch's grid really bounds per-task width."""
    from bigdatamlteamrepo_spark.queries.text_dedup import (
        SALT_CELLS,
        SALT_FACTOR,
        SALT_MIN_WIDTH,
        lsh_candidate_pairs,
    )

    sf = _boilerplate_corpus(spark, tmp_path)
    plain = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(spark, sf, salt=None).collect()
    }
    salted = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(spark, sf).collect()
    }
    assert salted == plain
    # the duplicate block alone contributes C(120,2) pairs
    assert len({p for p in plain if p[0] < 120 and p[1] < 120}) == 120 * 119 // 2

    # the bucket widths really crossed the auto threshold (the test is
    # meaningless otherwise) ...
    from bigdatamlteamrepo_spark.functions.text import shingles
    from bigdatamlteamrepo_spark.queries.text_dedup import (
        _with_tokens,
        lsh_band_rows,
    )

    bands = lsh_band_rows(
        _with_tokens(spark, sf).filter(F.size("toks") >= 3),
        shingles(F.col("toks"), 3),
    )
    widths = bands.groupBy("band").agg(F.count(F.lit(1)).alias("w"))
    stats = widths.agg(
        F.avg("w").alias("mean"), F.max("w").alias("mx")
    ).collect()[0]
    thr = max(SALT_MIN_WIDTH, int(SALT_FACTOR * stats.mean))
    assert stats.mx > thr, "fixture no longer creates a hot bucket"

    # ... and the grid bounds per-task fan-in: within a hot bucket, the
    # build side of any (band, cell) task holds ~width/SALT_CELLS docs
    hot_band = widths.filter(F.col("w") > thr).limit(1).collect()[0].band
    cells = (
        bands.filter(F.col("band") == hot_band)
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(SALT_CELLS)).alias("c"))
        .groupBy("c")
        .count()
        .collect()
    )
    width = sum(r["count"] for r in cells)
    assert max(r["count"] for r in cells) <= 3 * width // SALT_CELLS
