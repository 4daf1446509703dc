#!/usr/bin/env python
"""Curation-tier scale evidence (SCALING.md "Curation tier" section):
passage near-dup under the DEFAULT auto bucket cap vs uncapped vs a
pinned cap, over CorpusGen corpora of increasing size.

The claim under test (round-5 verdict item #1): the REGISTERED default
(`max_bucket="auto"`) must stay linear on boilerplate-heavy corpora —
the uncapped path was measured quadratic in band-bucket candidates.

Run: python tools/curation_scaling.py   (prints the markdown rows)
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
    spark = get_spark(app_name="curation-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(CorpusGenDataSource)
    spark.range(10).count()

    from bigdatamlteamrepo_spark.queries.curation import (
        ngram_novelty,
        overlap_audit,
        overlap_kmv,
        overlap_matrix,
        passage_neardup_doc_pairs,
    )

    # warm pass at the smallest size (codegen / python-worker spin-up)
    warm = spark.read.parquet(
        os.path.join(corpus_dir(spark, SIZES[0]), "documents.parquet")
    )
    passage_neardup_doc_pairs(warm).count()

    print("| docs | auto s (pairs) | uncapped s (pairs) | cap=20 s (pairs) | novelty s | overlap s | overlap-kmv s | overlap-audit s (flagged) |")
    print("|---|---|---|---|---|---|---|---|")
    for n in SIZES:
        docs = spark.read.parquet(
            os.path.join(corpus_dir(spark, n), "documents.parquet")
        )
        cells = [str(f"{n:,}")]
        for cap in ("auto", None, 20):
            t0 = time.time()
            n_pairs = passage_neardup_doc_pairs(docs, max_bucket=cap).count()
            cells.append(f"{time.time() - t0:.2f} ({n_pairs:,})")
        t0 = time.time()
        ngram_novelty(docs).count()
        cells.append(f"{time.time() - t0:.2f}")
        t0 = time.time()
        overlap_matrix(docs).count()
        cells.append(f"{time.time() - t0:.2f}")
        t0 = time.time()
        overlap_kmv(docs).count()
        cells.append(f"{time.time() - t0:.2f}")
        t0 = time.time()
        n_flag = overlap_audit(docs).count()
        cells.append(f"{time.time() - t0:.2f} ({n_flag})")
        print("| " + " | ".join(cells) + " |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
