#!/usr/bin/env python
"""Exact-substring span-dedup scale evidence (SCALING.md): wall time
and output volume of the stride-1 window tier over CorpusGen corpora
of increasing size.

The claim under test: every stage is linear in corpus tokens — the
window stream is one row per token, the dup-hash table is
Zipf-collapsed, and the island merge touches only duplicated windows.

Run: python tools/substring_scaling.py   (prints the markdown rows)
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
    spark = get_spark(app_name="substring-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(CorpusGenDataSource)
    spark.range(10).count()

    from pyspark.sql import functions as F

    from bigdatamlteamrepo_spark.queries.passages import (
        dup_substring_spans,
        window_hashes,
    )

    warm = spark.read.parquet(
        os.path.join(corpus_dir(spark, SIZES[0]), "documents.parquet")
    )
    dup_substring_spans(warm).count()

    print("| docs | windows | spans s (spans) | cut-token frac |")
    print("|---|---|---|---|")
    for n in SIZES:
        docs = spark.read.parquet(
            os.path.join(corpus_dir(spark, n), "documents.parquet")
        )
        n_windows = window_hashes(docs).count()
        t0 = time.time()
        spans = dup_substring_spans(docs)
        agg = spans.agg(
            F.count(F.lit(1)).alias("n"), F.sum("span_tokens").alias("cut")
        ).collect()[0]
        wall = time.time() - t0
        total = docs.select(
            F.sum(F.size(F.split(F.lower("text"), r"\s+")))
        ).collect()[0][0]
        print(
            f"| {n:,} | {n_windows:,} | {wall:.2f} ({agg['n']:,}) "
            f"| {(agg['cut'] or 0) / total:.3f} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
