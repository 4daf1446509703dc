"""Shannon entropy queries: hand-computable distributions must come out
exact (0 bits for constant, 1 bit for a fair binary, 2 bits for uniform
quaternary), and the signal must rank repetitive junk below real text."""

from __future__ import annotations

import math

from bigdatamlteamrepo_spark.queries.entropy import MICRO, _dist_entropy

from pyspark.sql import functions as F


def _char_h(spark, text):
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    sym = df.select("doc_id", F.explode(F.split("text", "")).alias("sym"))
    r = _dist_entropy(sym, "char").collect()[0]
    return r["char_h_micro"] / MICRO, r["char_distinct"], r["char_n"]


def test_known_distributions(spark):
    h, d, n = _char_h(spark, "aaaaaaaa")
    assert (h, d, n) == (0.0, 1, 8)
    h, d, n = _char_h(spark, "abababab")
    assert abs(h - 1.0) < 1e-5 and d == 2
    h, d, n = _char_h(spark, "abcdabcd")
    assert abs(h - 2.0) < 1e-5 and d == 4


def test_skewed_below_uniform(spark):
    h_skew, _, _ = _char_h(spark, "aaaaaaab")  # 7/8, 1/8
    expect = -(7 / 8 * math.log2(7 / 8) + 1 / 8 * math.log2(1 / 8))
    assert abs(h_skew - expect) < 1e-5
    h_unif, _, _ = _char_h(spark, "aabb")
    assert h_skew < h_unif


def test_profile_flags_repetitive_docs(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.entropy import doc_entropy_profile

    rows = doc_entropy_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # entropy is bounded by log2(alphabet) and non-negative
        # micro-bit per-term rounding can exceed the bound by ~d/2 micro
        assert 0 <= r["char_entropy_bits"] <= math.log2(r["n_distinct_chars"]) + 1e-4
        assert 0 <= r["token_entropy_bits"] <= math.log2(r["n_distinct_tokens"]) + 1e-4
        # single-symbol docs are exactly zero
        if r["n_distinct_tokens"] == 1:
            assert r["tok_h_micro"] == 0
