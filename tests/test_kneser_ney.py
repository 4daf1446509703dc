"""Kneser-Ney bigram LM: the model table must satisfy KN's exact
normalization identity (per context, full-vocab probability mass sums
to 1) and the continuation-count semantics that distinguish KN from
raw-frequency smoothing."""

from __future__ import annotations

from collections import defaultdict

from bigdatamlteamrepo_spark.queries.textmodel import KN_D, kn_bigram_model


def _docs(spark, texts):
    rows = [(i, "en", t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_full_vocab_mass_sums_to_one(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog and a bird",
    ]
    rows = kn_bigram_model(_docs(spark, texts)).collect()
    by_x = defaultdict(list)
    for r in rows:
        by_x[r["bigram"].split(" ")[0]].append(r)
    total_types = rows[0]["n_bigram_types"]
    # Σ_y n1b(y) over all distinct second tokens = total bigram types
    n1b_by_y = {r["bigram"].split(" ")[1]: r["n1b"] for r in rows}
    assert sum(n1b_by_y.values()) == total_types
    for x, grp in by_x.items():
        c_x, n1f = grp[0]["c_x"], grp[0]["n1f"]
        assert n1f == len(grp)
        assert c_x == sum(r["c_xy"] for r in grp)
        # full-vocab mass: observed discounted terms + backoff mass
        # distributed over ALL continuations (n1b/B sums to 1)
        mass = sum((r["c_xy"] - KN_D) / c_x for r in grp)
        mass += (KN_D * n1f / c_x) * 1.0
        assert abs(mass - 1.0) < 1e-12, (x, mass)


def test_continuation_counts_demote_context_locked_tokens(spark):
    # "francisco" appears 4× but ONLY after "san"; "common" appears 4×
    # after 4 different contexts.  KN's P_cont must rank common above
    # francisco despite equal raw frequency.
    texts = [
        "san francisco is common here",
        "san francisco was common there",
        "san francisco gets common praise",
        "san francisco very common indeed",
    ]
    rows = kn_bigram_model(_docs(spark, texts)).collect()
    n1b = {r["bigram"].split(" ")[1]: r["n1b"] for r in rows}
    assert n1b["francisco"] == 1
    assert n1b["common"] == 4
