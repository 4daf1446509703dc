"""Property tests for the passage/keyword tier: independent-Python
twins over hypothesis-generated corpora (the shared-bug defense — the
parity oracle mirrors the engine's definition, a third implementation
confirms the definition itself)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdatamlteamrepo_spark.queries.passages import (
    PASSAGE_W,
    _MICRO,
    passage_dedup_stats,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def shared_spark(spark):
    return spark


#: documents as lists of tokens over a tiny alphabet — small vocab
#: forces passage collisions and tf-idf ties, the interesting cases
_DOCS = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=3 * PASSAGE_W
        ),
    ),
    min_size=1,
    max_size=25,
)


def _py_passage_stats(rows):
    """Independent passage-dedup: rows = (doc_id, source, tokens)."""
    passages = []  # (doc_id, source, key)
    for doc_id, source, toks in rows:
        for i in range(len(toks) // PASSAGE_W):
            key = " ".join(toks[i * PASSAGE_W : (i + 1) * PASSAGE_W])
            passages.append((doc_id, source, key))
    docs_per_key: dict[str, set] = {}
    for doc_id, _, key in passages:
        docs_per_key.setdefault(key, set()).add(doc_id)
    out: dict[str, list] = {}
    for src in {s for _, s, _ in passages}:
        mine = [(d, k) for d, s, k in passages if s == src]
        dup = [(d, k) for d, k in mine if len(docs_per_key[k]) >= 2]
        out[src] = [len(mine), len(dup), len({d for d, _ in dup})]
    return out


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(docs=_DOCS)
def test_passage_dedup_matches_independent_python(shared_spark, docs):
    rows = [(i, src, toks) for i, (src, toks) in enumerate(docs)]
    df = shared_spark.createDataFrame(
        [(i, src, " ".join(toks)) for i, src, toks in rows],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: [r["n_passages"], r["n_dup_instances"], r["n_docs_with_dup"]]
        for r in passage_dedup_stats(df).collect()
    }
    # tokenize("") yields [""] (one empty token), never a full passage —
    # sources whose docs produce no passages simply don't appear
    want = _py_passage_stats(
        [(i, src, toks if toks else [""]) for i, src, toks in rows]
    )
    assert got == want


def _py_tfidf_topk(rows, k=3):
    """Independent tf-idf top-k: rows = (doc_id, tokens)."""
    docs = {d: toks for d, toks in rows if toks}
    n = len(docs)
    df_count: Counter = Counter()
    for toks in docs.values():
        df_count.update(set(toks))
    idf_micro = {
        t: round(math.log(n / c) * _MICRO) for t, c in df_count.items()
    }
    out = {}
    for d, toks in docs.items():
        tf = Counter(toks)
        scored = sorted(
            ((t, tf[t], df_count[t], tf[t] * idf_micro[t]) for t in tf),
            key=lambda x: (-x[3], x[0]),
        )[:k]
        out[d] = [
            (t, c, dfc, sc, i + 1) for i, (t, c, dfc, sc) in enumerate(scored)
        ]
    return out


@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(docs=_DOCS)
def test_tfidf_topk_matches_independent_python(shared_spark, docs):
    rows = [(i, toks) for i, (_, toks) in enumerate(docs)]
    df = shared_spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in rows],
        "doc_id long, text string",
    )
    got: dict[int, list] = {}
    for r in tfidf_top_terms(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["tfidf_micro"], r["rnk"])
        )
    got = {d: sorted(v, key=lambda x: x[4]) for d, v in got.items()}
    want = _py_tfidf_topk([(i, toks if toks else [""]) for i, toks in rows])
    assert got == want
