#!/usr/bin/env python
"""Incremental-ingest scale evidence (SCALING.md): wall time of one
fixed-size batch ingest (decide + index fold) as the PRE-BUILT index
corpus grows, over CorpusGen corpora.

The claim under test: per-batch cost is the batch's own hash/signature
work plus equi-joins against the persisted index tables — the index is
scanned, never recomputed, so growth with index size should track a
parquet scan + hash join build, not the index's curation cost.

Run: python tools/ingest_scaling.py   (prints the markdown rows)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatamlteamrepo_spark import get_spark
from bigdatamlteamrepo_spark.sources.corpusgen import CorpusGenDataSource
from tools.scaling_experiment import SIZES, corpus_dir


def main() -> None:
    spark = get_spark(app_name="ingest-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(CorpusGenDataSource)
    spark.range(10).count()

    import tempfile

    from pyspark.sql import functions as F

    from bigdatamlteamrepo_spark.streaming.ingest import (
        build_ingest_indexes,
        ingest_batch,
    )

    # fixed batch: the smallest corpus, doc_ids shifted out of the
    # index id-space so set unions stay disjoint.  CorpusGen text fails
    # the Gopher gate (no stopwords, mean word length 5.45 > 5.0 — the
    # corpus-build caveat in SCALING.md), which would leave the dedup
    # stages vacuously empty; appending 12 short stopword-heavy tokens
    # pulls the mean into range, adds the stopword floor, breaks exact
    # md5 equality with the index twin of each doc, and keeps shingle
    # Jaccard ≈ 0.8 — so every stage runs at full batch volume.
    batch = (
        spark.read.parquet(
            os.path.join(corpus_dir(spark, SIZES[0]), "documents.parquet")
        )
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" the of a to in is and it on at as by")),
        )
        .persist()
    )
    batch.count()

    print("| index docs | seed s | ingest s (accepted/batch) |")
    print("|---|---|---|")
    for n in SIZES:
        index_docs = spark.read.parquet(
            os.path.join(corpus_dir(spark, n), "documents.parquet")
        )
        idx = tempfile.mkdtemp(prefix=f"ingest-idx-{n}-")
        t0 = time.time()
        build_ingest_indexes(index_docs, idx)
        seed_s = time.time() - t0
        t0 = time.time()
        decisions = ingest_batch(batch, spark, idx)
        n_acc = decisions.filter(F.col("decision") == "accepted").count()
        n_all = decisions.count()
        print(
            f"| {n:,} | {seed_s:.2f} | {time.time() - t0:.2f}"
            f" ({n_acc:,}/{n_all:,}) |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
