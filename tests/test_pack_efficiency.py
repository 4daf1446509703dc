"""pack_efficiency_by_seqlen vs an independent pure-Python reference
on constructed and seeded-random corpora (the substring-dedup pinning
style), plus the cross-regime invariants."""

from __future__ import annotations

import random

from bigdatamlteamrepo_spark.queries.shards import (
    _SWEEP_LENS,
    pack_efficiency_by_seqlen,
)


def _python_reference(doc_tokens: dict[int, int], L: int) -> dict:
    """doc_tokens: doc_id -> n_tokens for ONE source, doc_id order."""
    total = sum(doc_tokens.values())
    off = 0
    frag = 0
    pad_seqs = 0
    for d in sorted(doc_tokens):
        n = doc_tokens[d]
        if off % L + n > L:
            frag += 1
        off += n
        pad_seqs += (n + L - 1) // L
    return {
        "total_tokens": total,
        "n_seqs_chop": (total + L - 1) // L,
        "n_frag_docs": frag,
        "n_seqs_pad": pad_seqs,
    }


def _write_corpus(spark, tmp_path, lens_by_source):
    rows = []
    i = 0
    for src, lens in lens_by_source.items():
        for n in lens:
            text = " ".join(f"w{j}" for j in range(n))
            rows.append((i, text, "en", src, len(text)))
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _check(spark, sf, lens_by_source):
    got = {
        (r.source, r.seq_len): r
        for r in pack_efficiency_by_seqlen(spark, sf).collect()
    }
    i = 0
    ids_by_source = {}
    for src, lens in lens_by_source.items():
        for n in lens:
            ids_by_source.setdefault(src, {})[i] = n
            i += 1
    for src, doc_tokens in ids_by_source.items():
        for L in _SWEEP_LENS:
            ref = _python_reference(doc_tokens, L)
            r = got[(src, L)]
            assert r.total_tokens == ref["total_tokens"], (src, L)
            assert r.n_seqs_chop == ref["n_seqs_chop"], (src, L)
            assert r.n_frag_docs == ref["n_frag_docs"], (src, L)
            assert r.n_seqs_pad == ref["n_seqs_pad"], (src, L)
            # invariants: padding can only add sequences; waste in [0, 1)
            assert r.n_seqs_pad >= r.n_seqs_chop
            assert 0.0 <= r.pad_waste_frac < 1.0


def test_constructed_cases(spark, tmp_path):
    lens = {
        # exact multiples: zero pad waste at 512, no fragmentation
        "exact": [512, 512, 1024],
        # all tiny docs: chop fragments some, pad wastes a lot
        "tiny": [7] * 200,
        # docs longer than every seq_len: both regimes split/span
        "huge": [5000, 4097],
        # single one-token doc
        "one": [1],
    }
    _check(spark, _write_corpus(spark, tmp_path, lens), lens)


def test_seeded_random_corpus(spark, tmp_path):
    rng = random.Random(42)
    lens = {
        f"s{k}": [rng.randrange(1, 3000) for _ in range(rng.randrange(5, 60))]
        for k in range(4)
    }
    _check(spark, _write_corpus(spark, tmp_path, lens), lens)
