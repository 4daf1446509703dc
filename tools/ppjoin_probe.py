#!/usr/bin/env python
"""Before/after probe for the PPJoin positional filter (VERDICT_r11
#4): time prefix_jaccard_join at the SCALING.md corpus sizes and report
the candidate volume the verify stage sees.  Run twice around the
filter change to quantify the cut; results go into SCALING.md's
prefix-join section."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatamlteamrepo_spark import get_spark
from bigdatamlteamrepo_spark.operators.setjoin import prefix_jaccard_join
from tools.scaling_experiment import SIZES, corpus_dir


def main() -> None:
    spark = get_spark(app_name="ppjoin-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from bigdatamlteamrepo_spark.sources.corpusgen import CorpusGenDataSource

    spark.dataSource.register(CorpusGenDataSource)
    from bigdatamlteamrepo_spark.queries.text_dedup import _shingle_sets

    # warm-up at the smallest size (codegen, python workers)
    prefix_jaccard_join(
        _shingle_sets(spark, corpus_dir(spark, SIZES[0])),
        0.8, id_col="doc_id", set_col="s",
    ).count()
    for n in SIZES:
        d = corpus_dir(spark, n)
        sets = _shingle_sets(spark, d)
        t0 = time.time()
        # guard off: this probe exists to measure the super-linear
        # regime the guard normally refuses
        n_pairs = prefix_jaccard_join(
            sets, 0.8, id_col="doc_id", set_col="s", max_candidates=None
        ).count()
        t = time.time() - t0
        print(f"n={n:>7,}  wall {t:7.2f}s  result pairs {n_pairs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
