"""TextRank keyword extraction: PageRank over the word co-occurrence
graph (Mihalcea & Tarau 2004, "TextRank: Bringing Order into Text").

Corpus-level variant: nodes are content words (letter-only tokens of
length ≥ 2 — drops the bare-article noise), an undirected edge connects
words ADJACENT in a document's filtered token sequence, weighted by the
corpus-wide adjacency count (window = 2, the paper's default).  Rank is
the repo's **integer PageRank** (``operators/pagerank.py``): every
quantity a scaled BIGINT, so ten damped iterations are bit-identical
across engines and partitionings — the DuckDB oracle replays the exact
floor-division arithmetic via :func:`pagerank_cte_sql`'s unrolled CTE
chain.

Distributed shape (the part that matters at 100 TB):

* The co-occurrence build is ONE pass over documents: explode adjacent
  pairs, one (a, b) groupBy with map-side combine — shuffle volume is
  the distinct-bigram count, not the token count.  ``EDGE_MIN_W``
  prunes hapax adjacencies before the iteration, bounding the graph at
  the vocabulary's co-occurrence core (Zipf: edges ≪ tokens).
* Each PageRank round is one join + one aggregate on the edge list —
  independent of corpus size once the graph is built; lineage truncates
  per round (reliable checkpoint when a checkpoint dir is set).
* ``SCALE`` = 10^8 keeps the integer-overflow bound
  (n_nodes · SCALE · 2^20 < 2^63) safe to ~88 k vocabulary nodes; a
  web-scale vocabulary passes a smaller scale — the knob exists
  precisely because mass, not edges, is the exactness constraint.

Top-K emission is a TakeOrderedAndProject under the total order
(rank DESC, word) — identical tie resolution in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.text import shingles, tokenize_words
from bigdatamlteamrepo_spark.operators.pagerank import (
    integer_pagerank,
    pagerank_cte_sql,
)
from bigdatamlteamrepo_spark.queries.registry import query
from bigdatamlteamrepo_spark.queries.textmodel import _WORDS_SQL

#: minimum content-word length (drops single-letter tokens)
MIN_WORD_LEN = 2
#: adjacency count below which an edge is pruned (hapax co-occurrences)
EDGE_MIN_W = 2
#: PageRank iterations (the paper's convergence regime for small d)
N_ITER = 10
#: integer-PageRank mass scale — safe to ~88k nodes (see module doc)
SCALE = 10**8
#: keywords to emit
TOP_K = 25


def word_cooccurrence_edges(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Undirected weighted adjacency edges ``(src, dst, weight)`` (both
    directions emitted) between content words adjacent in the filtered
    token stream; edges with corpus weight < ``EDGE_MIN_W`` pruned."""
    toks = F.filter(
        tokenize_words(text_col), lambda x: F.length(x) >= MIN_WORD_LEN
    )
    pairs = (
        docs.select(F.explode(shingles(toks, 2)).alias("bg"))
        .select(F.split("bg", " ").alias("p"))
        .select(
            F.least(F.get("p", 0), F.get("p", 1)).alias("a"),
            F.greatest(F.get("p", 0), F.get("p", 1)).alias("b"),
        )
        # self-adjacency (repeated word) is a self-loop — drop it, the
        # paper's graph is simple
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= EDGE_MIN_W)
    )
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "weight"
    ).unionAll(
        pairs.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), "weight"
        )
    )


_EDGES_CTE = f"""
wt AS (
  SELECT list_filter({_WORDS_SQL}, x -> len(x) >= {MIN_WORD_LEN}) AS toks
  FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM wt
),
und AS (
  SELECT least(string_split(bigram, ' ')[1], string_split(bigram, ' ')[2]) AS a,
         greatest(string_split(bigram, ' ')[1], string_split(bigram, ' ')[2]) AS b,
         COUNT(*) AS weight
  FROM bg
  WHERE string_split(bigram, ' ')[1] <> string_split(bigram, ' ')[2]
  GROUP BY 1, 2
  HAVING COUNT(*) >= {EDGE_MIN_W}
),
edges AS (
  SELECT a AS src, b AS dst, weight FROM und
  UNION ALL
  SELECT b, a, weight FROM und
)"""

_TEXTRANK_ORACLE = (
    pagerank_cte_sql(_EDGES_CTE, n_iter=N_ITER, scale=SCALE)
    + f"""
SELECT node AS word, rank AS rank_scaled
FROM pr{N_ITER}
ORDER BY rank DESC, word
LIMIT {TOP_K}
"""
)


@query("corpus_textrank_keywords", oracle=_TEXTRANK_ORACLE)
def corpus_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top corpus keywords by TextRank: {N_ITER}-iteration integer
    PageRank over the adjacent-content-word co-occurrence graph
    (edge weight = corpus adjacency count, pruned below {EDGE_MIN_W});
    ``rank_scaled`` is the BIGINT mass at scale {SCALE}."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    edges = word_cooccurrence_edges(docs)
    ranks = integer_pagerank(edges, n_iter=N_ITER, scale=SCALE)
    return (
        ranks.select(F.col("node").alias("word"), F.col("rank").alias("rank_scaled"))
        .orderBy(F.col("rank_scaled").desc(), "word")
        .limit(TOP_K)
    )


corpus_textrank_keywords.__doc__ = corpus_textrank_keywords.__doc__.format(
    N_ITER=N_ITER, EDGE_MIN_W=EDGE_MIN_W, SCALE=SCALE
)
