"""Streaming corpus-quality audit: the Gopher rule rollup over a
document STREAM — byte-identical logic to the batch query.

``queries.pipeline.gopher_rule_flags`` is pure column expressions, so
the exact same function body drives both the batch ``doc_gopher_rules``
query and this streaming aggregation — the "write once, run in both
modes" property the engine maintains across its streaming surface
(tumbling/sliding/session windows, HLL, funnel).  The per-source
counts are an unwatermarked running aggregation: state is one row per
(source), bounded by the source-domain cardinality, emitted in
complete/update mode as an ingest monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import TABLE_SCHEMAS


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents layout (pinned schema —
    no inference pass, exactly as the batch loader)."""
    # file-stream source requires a directory basePath; select the
    # single documents file with a glob filter (as read_events_stream)
    return (
        spark.readStream.schema(TABLE_SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def gopher_audit_stream(docs_stream: DataFrame) -> DataFrame:
    """Per-source running Gopher audit of a document stream; reuses the
    batch rule expressions verbatim."""
    from bigdatamlteamrepo_spark.queries.pipeline import gopher_rule_flags

    r = gopher_rule_flags(docs_stream, "source")
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_words").cast("bigint").alias("fail_word_count"),
        F.sum("f_mwl").cast("bigint").alias("fail_mean_word_len"),
        F.sum("f_alpha").cast("bigint").alias("fail_alpha_frac"),
        F.sum("f_stop").cast("bigint").alias("fail_stopwords"),
        F.sum("f_longword").cast("bigint").alias("fail_long_word"),
        F.sum(
            (
                (
                    F.col("f_words")
                    + F.col("f_mwl")
                    + F.col("f_alpha")
                    + F.col("f_stop")
                    + F.col("f_longword")
                )
                == 0
            ).cast("int")
        )
        .cast("bigint")
        .alias("pass_all"),
    )
