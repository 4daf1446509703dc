"""Custom Python DataSource: deterministic generation, partition
planning, batch/stream agreement, and engine-operator compatibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.sources.corpusgen import CorpusGenDataSource


def _register(spark):
    spark.dataSource.register(CorpusGenDataSource)


def test_batch_read_counts_and_partitions(spark):
    _register(spark)
    df = (
        spark.read.format("corpusgen")
        .option("n_docs", 500)
        .option("partitions", 8)
        .load()
    )
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 8
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    ids = [r.doc_id for r in df.select("doc_id").collect()]
    assert sorted(ids) == list(range(500))


def test_generation_is_deterministic(spark):
    _register(spark)

    def load(parts):
        return (
            spark.read.format("corpusgen")
            .option("n_docs", 200)
            .option("partitions", parts)
            .load()
        )

    a = {r.doc_id: r.text for r in load(4).collect()}
    b = {r.doc_id: r.text for r in load(7).collect()}
    # same rows regardless of partitioning (task-retry / speculative safety)
    assert a == b
    c = {
        r.doc_id: r.text
        for r in spark.read.format("corpusgen")
        .option("n_docs", 200)
        .option("seed", 7)
        .load()
        .collect()
    }
    assert a != c  # seed actually changes content


def test_engine_ops_run_on_generated_corpus(spark):
    """The generated frame must be a drop-in documents table for the
    engine's text tier."""
    _register(spark)
    df = spark.read.format("corpusgen").option("n_docs", 300).load()
    from bigdatamlteamrepo_spark.functions.text import tokenize

    stats = (
        df.withColumn("toks", tokenize("text"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.avg(F.size("toks")).alias("avg_toks"))
        .collect()
    )
    assert sum(r.n for r in stats) == 300
    assert all(20 <= r.avg_toks <= 120 for r in stats)


def test_dup_fraction_neardups_match_stored_base():
    """r2 ADVICE regression: a dup doc must be a near-copy of the text
    actually STORED at its base_id (not a phantom regenerated under a
    shifted RNG stream), and non-dup docs must be byte-identical to the
    dup_fraction=0 corpus."""
    import random
    import statistics

    from bigdatamlteamrepo_spark.sources.corpusgen import _gen_doc

    def shingles(t, n=3):
        toks = t.split()
        return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    seed, p, n = 7, 0.3, 1500
    stored = {i: _gen_doc(seed, i, p) for i in range(n)}
    jac, n_dup = [], 0
    for i in range(1, n):
        dup_rng = random.Random(f"{seed}:{i}:dup")
        if dup_rng.random() < p:
            n_dup += 1
            base_id = dup_rng.randrange(i)
            a, b = shingles(stored[i][1]), shingles(stored[base_id][1])
            jac.append(len(a & b) / len(a | b) if a | b else 1.0)
        else:
            assert stored[i] == _gen_doc(seed, i, 0.0)
    assert 0.15 <= n_dup / n <= 0.45
    # ~10% token mutation ⇒ ~0.6 expected 3-gram Jaccard vs the stored base
    assert statistics.mean(jac) > 0.5
    # regeneration reproduces the stored corpus exactly (task retry safety)
    assert all(_gen_doc(seed, i, p) == stored[i] for i in range(n))


def test_stream_matches_batch_prefix(spark):
    _register(spark)
    q = (
        spark.readStream.format("corpusgen")
        .option("rows_per_batch", 50)
        .load()
        .writeStream.format("memory")
        .queryName("corpusgen_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: r.text
        for r in spark.sql("SELECT doc_id, text FROM corpusgen_out").collect()
    }
    assert got  # at least one micro-batch drained
    want = {
        r.doc_id: r.text
        for r in spark.read.format("corpusgen")
        .option("n_docs", len(got))
        .load()
        .collect()
    }
    # stream rows are exactly the batch-generated prefix (same seed)
    assert got == want
