"""Property-based pins for the graph/spancorrupt tier: synchronous LPA
must equal the pure-Python reference on ARBITRARY small graphs (any
round count), and span-corruption pairs must reconstruct ANY token
stream.  Hypothesis drives the shapes; Spark runs once per example via
small deadline-free settings (a local[32] job per example is slow, so
examples are few but adversarially shrunk)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_label_propagation import _reference_lpa, _run

_edges = st.sets(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).map(
        lambda t: (min(t), max(t))
    ),
    min_size=1,
    max_size=14,
).map(lambda es: {(u, v) for u, v in es if u != v})


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges, rounds=st.integers(1, 5))
def test_lpa_matches_reference_on_random_graphs(spark, edges, rounds):
    if not edges:
        return
    assert _run(spark, edges, rounds) == _reference_lpa(edges, rounds)


_texts = st.lists(
    st.text(alphabet="abcdefg xyz", min_size=0, max_size=120),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_texts)
def test_span_corruption_lossless_on_random_texts(spark, texts, tmp_path_factory):
    from bigdatamlteamrepo_spark.functions.text import tokenize
    from bigdatamlteamrepo_spark.queries.spancorrupt import (
        PAIR_SAMPLE_MOD,
        _positions,
        t5_span_corruption_pairs,
    )
    from pyspark.sql import functions as F

    from tests.test_spancorrupt import _reconstruct

    # build an in-memory documents frame; doc_ids chosen so EVERY doc
    # passes the 1-in-PAIR_SAMPLE_MOD hash sample (multiply by MOD
    # won't do — the hash is md5 — so instead probe and keep hits,
    # padding with known-sampled id 116 is fragile; simplest: bypass
    # the sampled face and reconstruct from _positions directly)
    rows = [(i, "en", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    # expectation must use the QUERY's token definition: ensure_tokens
    # filters the '' artifact Spark's split leaves on empty text
    toks = {
        r["doc_id"]: [t for t in r["toks"] if t]
        for r in df.select("doc_id", tokenize("text").alias("toks")).collect()
    }
    mk = _positions(df)
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("blk").cast("string"), F.lit(">")
    )
    in_piece = (
        F.when(~F.col("masked"), F.col("tok"))
        .when(F.col("pib") == F.col("h"), sentinel)
        .otherwise(F.lit(None))
    )
    tgt_piece = (
        F.when(
            F.col("masked") & (F.col("pib") == F.col("h")),
            F.concat(sentinel, F.lit(" "), F.col("tok")),
        )
        .when(F.col("masked"), F.col("tok"))
        .otherwise(F.lit(None))
    )
    pieces = mk.select("doc_id", "p", in_piece.alias("i"), tgt_piece.alias("g"))

    def _joined(col):
        arr = F.array_sort(
            F.collect_list(F.struct(F.col("p"), F.col(col).alias("piece")))
        )
        kept = F.filter(arr, lambda s: s.piece.isNotNull())
        return F.array_join(F.transform(kept, lambda s: s.piece), " ")

    out = pieces.groupBy("doc_id").agg(
        _joined("i").alias("input_text"), _joined("g").alias("target_text")
    )
    for r in out.collect():
        assert _reconstruct(r["input_text"], r["target_text"]) == list(
            toks[r["doc_id"]]
        )
