"""Golden-text tier (FIXTURES §6 / SURVEY §5.3): preprocessing functions
are pure string→string with exact expected outputs derived from the
reference semantics at model.py:56-78."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.ml import text_generation as tg


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        # (title, ingredients, directions)
        ("Pancakes", '["1 cup flour", "2 eggs ", "  milk"]',
         '["Mix everything", " Fry until golden ", ""]'),
        ("Toast", "just bread", "toast it"),          # non-list fallback
        ("Weird", "[unparseable", "[also bad"),        # broken bracket → raw
        ("Salad", "['lettuce', 'olive oil']", "['chop', 'toss']"),  # py-repr
    ]
    return spark.createDataFrame(rows, "title string, ingredients string, directions string")


def test_bullet_and_numbered_joins(spark, raw):
    out = raw.select(
        "title",
        tg.bullet_join(tg.parse_stringified_list("ingredients")).alias("ing"),
        tg.numbered_join(tg.parse_stringified_list("directions")).alias("dirs"),
    ).collect()
    by = {r.title: r for r in out}
    assert by["Pancakes"].ing == "- 1 cup flour\n- 2 eggs\n- milk"
    assert by["Pancakes"].dirs == "1. Mix everything\n2. Fry until golden"
    assert by["Toast"].ing == "- just bread"
    assert by["Toast"].dirs == "1. toast it"
    # broken bracket: raw string fallback (reference: except → str(s))
    assert by["Weird"].ing == "- [unparseable"
    assert by["Salad"].ing == "- lettuce\n- olive oil"
    assert by["Salad"].dirs == "1. chop\n2. toss"


def test_extract_words_and_stopwords(spark):
    df = spark.createDataFrame([("I want to Make a recipe with Flour, eggs & 2 cups of milk!",)], "t string")
    words = df.select(tg.extract_words("t").alias("w")).first().w
    assert words == ["i", "want", "to", "make", "a", "recipe", "with",
                     "flour", "eggs", "cups", "of", "milk"]
    kept = df.select(tg.remove_stopwords(tg.extract_words("t")).alias("w")).first().w
    # english stopwords (i, to, a, of) + custom (want, make, recipe, with) removed
    assert kept == ["flour", "eggs", "cups", "milk"]


def test_preprocess_text_unknown_guard(spark):
    df = spark.createDataFrame([("and with recipe",), ("",)], "t string")
    out = [r.p for r in df.select(tg.preprocess_text("t").alias("p")).collect()]
    assert out == ["unknown", "unknown"]


def test_preprocess_recipes_format(spark, raw):
    out = tg.preprocess_recipes(raw.filter(F.col("title") == "Pancakes")).first()
    assert out.input_text.startswith("Generate a structured recipe for: ")
    assert "flour" in out.input_text
    assert out.target_text.startswith("Title: Pancakes\nIngredients:\n- 1 cup flour")
    assert "\nDirections:\n1. Mix everything" in out.target_text
    assert out.target_text.endswith("\n")


def test_split_proportions(spark):
    df = spark.range(5000).withColumn("input_text", F.lit("x")).withColumn("target_text", F.lit("y"))
    tr, va, te = tg.split_recipes(df, seed=42)
    n = df.count()
    assert tr.count() + va.count() + te.count() == n
    assert abs(tr.count() / n - 0.765) < 0.05


def test_tokenize_pairs_shapes(spark, raw):
    pairs = tg.preprocess_recipes(raw)
    tok = tg.tokenize_pairs(pairs, input_max_len=32, target_max_len=48)
    rows = tok.collect()
    for r in rows:
        assert len(r.input_ids) == 32
        assert len(r.labels) == 48
        assert len(r.attention_mask) == 32
        # mask is 1 exactly where ids are non-pad
        assert all((m == 1) == (i != 0) for m, i in zip(r.attention_mask, r.input_ids))
        # deterministic stub: eos token present
        assert 1 in r.input_ids


def test_torch_paths_gated(spark):
    pairs = tg.preprocess_recipes(
        spark.createDataFrame([("T", '["a"]', '["b"]')], "title string, ingredients string, directions string")
    )
    with pytest.raises(NotImplementedError):
        tg.fit_t5(pairs, pairs, "/tmp/t5_out_never_written")
    with pytest.raises(NotImplementedError):
        tg.generate_recipes_udf("/tmp/nonexistent-model")


def test_stub_generation_udf_pinned(spark, tmp_path):
    """The generation UDF's plumbing (per-partition model-dir load,
    Arrow-batched iterator pandas_udf, beam loop) executed end-to-end
    against the torch-free stub decoder, pinned to fixture outputs
    (VERDICT_r7 #5)."""
    from pyspark.sql import functions as F

    mdl = str(tmp_path / "stub_model")
    tg.save_stub_decoder(mdl)
    gen = tg.generate_recipes_udf(mdl, num_beams=4, max_length=256)
    df = spark.createDataFrame(
        [(1, "make a cake with flour and eggs"), (2, "soup: heat water add salt")],
        "id int, prompt string",
    ).repartition(2)
    out = {r.id: r.gen for r in df.withColumn("gen", gen("prompt")).collect()}
    assert out == {
        1: "mix mix eggs eggs sugar butter bake bake",
        2: "stir flour salt milk heat mix flour add",
    }
    # partitioning-invariant (per-partition load changes nothing)
    one = {
        r.id: r.gen
        for r in df.coalesce(1).withColumn("gen", gen("prompt")).collect()
    }
    assert one == out


def test_generation_udf_requires_model(spark, tmp_path):
    """No torch AND no stub decoder: loud NotImplementedError, never a
    silent empty generation."""
    with pytest.raises(NotImplementedError):
        tg.generate_recipes_udf(str(tmp_path / "empty_dir"))


def test_format_generated_cleanup(spark):
    """model.py:228-231: structured outputs pass through untouched,
    anything else gets the 'Generated Recipe:' prefix."""
    df = spark.createDataFrame(
        [
            (1, "Title: X\nIngredients:\n- a\nDirections:\n1. b\n"),
            (2, "just some tokens"),
            (3, "Title: partial only Ingredients: no directions-colon? no"),
        ],
        "id int, gen string",
    )
    out = {r.id: r.f for r in df.select("id", tg.format_generated("gen").alias("f")).collect()}
    assert out[1] == "Title: X\nIngredients:\n- a\nDirections:\n1. b\n"
    assert out[2] == "Generated Recipe:\njust some tokens"
    assert out[3].startswith("Generated Recipe:\n")
