"""Canonical exact dedup: merge behavior pinned on constructed
variants (the driver corpus is near-canonical word salad, so the
registered summary's delta column is ~0 there — these fixtures are
where the behavior lives, the doc_pii_scan precedent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.text_dedup import canonical_text


def _canon(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.c for r in df.select(canonical_text(F.col("text")).alias("c")).collect()]


def test_case_whitespace_punct_variants_merge(spark):
    variants = [
        "The quick brown fox",
        "the  quick   brown fox",
        "THE QUICK BROWN FOX",
        "the quick, brown fox!",
        "\tthe quick brown fox \n",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_different_texts_stay_distinct(spark):
    texts = ["alpha beta gamma", "alpha beta delta", "alpha beta"]
    assert len(set(_canon(spark, texts))) == 3


def test_digits_survive_canonicalization(spark):
    # digits are content, not separators — "v2" and "v3" must differ
    a, b = _canon(spark, ["version 2 release", "version 3 release"])
    assert a != b
    assert "2" in a and "3" in b


def test_canonical_matches_oracle_regex(spark, duck):
    # the Spark and DuckDB canonicalizers must agree character-for-
    # character, else the oracle silently diverges on real text
    texts = [
        "Hello,   World!",
        "foo--bar__baz",
        "  MIXED case 42 ",
        "a.b.c",
        "",
    ]
    got = _canon(spark, texts)
    for t, g in zip(texts, got):
        d = duck.execute(
            "SELECT trim(regexp_replace(lower(?), '[^a-z0-9]+', ' ', 'g'))",
            [t],
        ).fetchone()[0]
        assert g == d, (t, g, d)
