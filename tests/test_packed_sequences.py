"""Materialized packed sequences: the loader rows must reconstruct the
corpus exactly — per source, flattening the sequences in seq_id order
recovers the concatenation of every document's vocab-encoded token
stream in doc_id order."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.queries.shards import (
    SEQ_LEN,
    packed_token_sequences,
)


def _expected_streams(rows):
    """source -> flat id stream, from raw doc rows, via an independent
    Python re-derivation of the vocab and the packing order."""
    from collections import Counter

    toks_by_doc = {}
    freq = Counter()
    for r in rows:
        toks = re.split(r"\s+", r.text.lower())
        toks_by_doc[r.doc_id] = (r.source, toks)
        freq.update(toks)
    vocab = {
        t: i + 1
        for i, t in enumerate(
            sorted(freq, key=lambda t: (-freq[t], t))
        )
    }
    streams: dict[str, list[int]] = {}
    for doc_id in sorted(toks_by_doc):
        src, toks = toks_by_doc[doc_id]
        streams.setdefault(src, []).extend(vocab[t] for t in toks)
    return streams, vocab


def test_sequences_reconstruct_the_corpus(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.shards import packed_sequence_rows

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "source", "text").collect()
    expect_streams, vocab = _expected_streams(raw)

    # rebuild the internal gpos stream the registered query hashes
    t = docs.select("source", "doc_id", F.split(F.lower("text"), r"\s+").alias("toks"))
    s = t.select("source", "doc_id", F.posexplode("toks").alias("pos0", "token"))
    from pyspark.sql import Window

    v = (
        s.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "tok_id",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("token"))),
        )
        .select("token", "tok_id")
    )
    n = t.select("source", "doc_id", F.size("toks").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = n.withColumn("tok_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    g = (
        s.join(o.select("source", "doc_id", "tok_offset"), ["source", "doc_id"])
        .join(v, "token")
        .select("source", (F.col("tok_offset") + F.col("pos0")).alias("gpos"), "tok_id")
    )
    seqs = packed_sequence_rows(g).collect()

    got_streams: dict[str, list[int]] = {}
    for r in sorted(seqs, key=lambda r: (r.source, r.seq_id)):
        assert r.n_ids == len(r.input_ids)
        got_streams.setdefault(r.source, []).extend(r.input_ids)
    assert got_streams == expect_streams

    # every sequence is exactly SEQ_LEN except the last per source
    by_src: dict[str, list] = {}
    for r in seqs:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.seq_id)
        assert [r.seq_id for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r.n_ids == SEQ_LEN
        assert 1 <= rs[-1].n_ids <= SEQ_LEN

    # vocab ids are dense 1..V, most-frequent = 1
    ids = {i for st in got_streams.values() for i in st}
    assert ids == set(range(1, len(vocab) + 1))


def test_registered_hash_face_matches_rows(spark, sf_dir):
    """The registered md5/scalar projection agrees with an independent
    hash of the reconstructed streams."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "source", "text").collect()
    expect_streams, _ = _expected_streams(raw)
    out = {
        (r.source, r.seq_id): r
        for r in packed_token_sequences(spark, sf_dir).collect()
    }
    for src, stream in expect_streams.items():
        for seq_id in range((len(stream) + SEQ_LEN - 1) // SEQ_LEN):
            chunk = stream[seq_id * SEQ_LEN : (seq_id + 1) * SEQ_LEN]
            r = out.pop((src, seq_id))
            assert r.n_ids == len(chunk)
            assert r.first_id == chunk[0]
            assert r.ids_sum == sum(chunk)
            assert (
                r.ids_md5
                == hashlib.md5(" ".join(map(str, chunk)).encode()).hexdigest()
            )
    assert not out, "unexpected extra sequences"


def test_bpe_encode_drops_into_the_same_packer(spark, sf_dir):
    """Swapping the frequency-rank vocab for learned BPE subwords
    reuses packed_sequence_rows unchanged: per-source flattening of the
    packed rows equals the concatenation of each doc's BPE symbol
    stream in doc_id order."""
    from pyspark.sql import Window

    from bigdatamlteamrepo_spark.functions.text import tokenize_words
    from bigdatamlteamrepo_spark.queries.shards import packed_sequence_rows
    from bigdatamlteamrepo_spark.queries.textmodel import (
        bpe_encode_words,
        learn_bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents").limit(60)
    words = (
        docs.select(F.explode(tokenize_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )
    merges = [m[1] for m in learn_bpe_merges(words, n_rounds=10)]
    enc = bpe_encode_words(words, merges).select("word", "symbols")
    sym_vocab = (
        enc.select(F.explode("symbols").alias("sym"))
        .distinct()
        .withColumn("tok_id", F.row_number().over(Window.orderBy("sym")))
    )
    # per-doc BPE id stream: word positions fan out to symbol positions
    t = docs.select(
        "source", "doc_id", F.posexplode(tokenize_words("text")).alias("wpos", "word")
    )
    wsyms = t.join(enc, "word").select(
        "source", "doc_id", "wpos",
        F.posexplode("symbols").alias("spos", "sym"),
    ).join(sym_vocab, "sym")
    # global order inside a doc: (wpos, spos); per-doc symbol count for offsets
    per_doc = wsyms.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_syms")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = per_doc.withColumn("doc_off", F.sum("n_syms").over(w) - F.col("n_syms"))
    win_doc = Window.partitionBy("source", "doc_id").orderBy("wpos", "spos")
    g = (
        wsyms.withColumn("in_doc", F.row_number().over(win_doc) - 1)
        .join(o.select("source", "doc_id", "doc_off"), ["source", "doc_id"])
        .select("source", (F.col("doc_off") + F.col("in_doc")).alias("gpos"), "tok_id")
    )
    seqs = packed_sequence_rows(g).collect()

    # independent expectation
    enc_map = {r.word: list(r.symbols) for r in enc.collect()}
    vocab = {r.sym: r.tok_id for r in sym_vocab.collect()}
    raw = docs.select("doc_id", "source", "text").collect()
    expect: dict[str, list[int]] = {}
    for r in sorted(raw, key=lambda r: r.doc_id):
        words_seq = re.findall(r"\b[a-zA-Z]+\b", r.text.lower())
        for wd in words_seq:
            expect.setdefault(r.source, []).extend(
                vocab[s] for s in enc_map[wd]
            )
    got: dict[str, list[int]] = {}
    for r in sorted(seqs, key=lambda r: (r.source, r.seq_id)):
        got.setdefault(r.source, []).extend(r.input_ids)
    assert got == expect


def test_registered_bpe_pack_face(spark, sf_dir):
    """Structural pin for the registered rows-only BPE pack: sequences
    per source are dense SEQ_LEN chunks of exactly the corpus's total
    BPE-symbol mass (mass re-derived independently from the encode
    table and raw word streams)."""
    from bigdatamlteamrepo_spark.functions.text import tokenize_words
    from bigdatamlteamrepo_spark.queries.shards import packed_bpe_sequences
    from bigdatamlteamrepo_spark.queries.textmodel import (
        bpe_encode_words,
        learn_bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokenize_words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )
    enc_map = {
        r.word: len(r.symbols)
        for r in bpe_encode_words(
            words, [m[1] for m in learn_bpe_merges(words)]
        ).collect()
    }
    expect_mass: dict[str, int] = {}
    for r in docs.select("source", "text").collect():
        for wd in re.findall(r"\b[a-zA-Z]+\b", r.text.lower()):
            expect_mass[r.source] = expect_mass.get(r.source, 0) + enc_map[wd]

    rows = packed_bpe_sequences(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(expect_mass)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.seq_id)
        assert [r.seq_id for r in rs] == list(range(len(rs)))
        assert sum(r.n_ids for r in rs) == expect_mass[src]
        for r in rs[:-1]:
            assert r.n_ids == SEQ_LEN
        assert len(r.ids_md5) == 32 and r.first_id >= 1


def test_doc_starts_are_consistent_with_pack_geometry(spark, sf_dir):
    """Cross-pin against doc_pack_offsets (the per-doc face of the same
    cumsum) and against the packed sequences' existence."""
    from bigdatamlteamrepo_spark.queries.shards import (
        doc_pack_offsets,
        packed_sequence_doc_starts,
    )

    per_doc = doc_pack_offsets(spark, sf_dir).collect()
    expect: dict[tuple, list] = {}
    for r in per_doc:
        expect.setdefault((r.source, r.shard_id), []).append(
            (r.offset_in_shard, r.doc_id)
        )
    got = {
        (r.source, r.seq_id): r
        for r in packed_sequence_doc_starts(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    import hashlib

    for key, starts in expect.items():
        starts.sort()
        r = got[key]
        assert r.n_doc_starts == len(starts)
        assert r.first_start == starts[0][0]
        assert r.first_doc_id == min(d for _, d in starts)
        joined = " ".join(str(o) for o, _ in starts)
        assert r.starts_md5 == hashlib.md5(joined.encode()).hexdigest()

    seqs = {
        (r.source, r.seq_id)
        for r in packed_token_sequences(spark, sf_dir).collect()
    }
    # fixture docs are all < SEQ_LEN tokens, so every sequence has at
    # least one doc start and the two tables cover the same keys
    assert seqs == set(got)
