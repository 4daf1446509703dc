"""Language-ID accuracy on a real multilingual fixture (the driver
corpus's lang column is text-uncorrelated, so accuracy is asserted
here; the corpus query is rows-only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.functions.langid import language_id
from bigdatamlteamrepo_spark.functions.text import tokenize

SAMPLES = [
    ("en", "the cat sat on the mat and it was happy with this fine day"),
    ("en", "they have come from the north to the city for the winter"),
    ("de", "der hund und die katze sind nicht mit dem kind im garten"),
    ("de", "ich habe eine frage zu der antwort von dem lehrer"),
    ("es", "el perro y el gato están en la casa con su comida para hoy"),
    ("es", "no es más que una de las cosas que se pueden hacer por aquí"),
    ("fr", "le chien est dans la maison avec les enfants pour la soirée"),
    ("fr", "vous ne savez pas ce qui est sur la table dans la cuisine"),
    ("zh", "我 们 的 是 在 这 个 大 的 中 国 城 市 里"),
    ("zh", "我们的是在这个大的中国城市里有很多人"),  # unsegmented — char path
    ("und", "zzz qqq xxx blorp flurp"),
]


def test_language_id_accuracy(spark):
    df = spark.createDataFrame(SAMPLES, "lang string, text string")
    out = df.withColumn(
        "pred", language_id(tokenize("text"), text=F.col("text"))
    ).collect()
    for r in out:
        assert r.pred == r.lang, f"{r.text!r}: predicted {r.pred}, want {r.lang}"


def test_language_id_empty_and_ties(spark):
    df = spark.createDataFrame([("",), ("der the el le",)], "text string")
    out = [r.pred for r in df.withColumn("pred", language_id(tokenize("text"))).collect()]
    assert out[0] == "und"
    # a perfect tie resolves deterministically (struct max → lexicographic)
    assert out[1] in {"de", "en", "es", "fr"}
    again = [r.pred for r in df.withColumn("pred", language_id(tokenize("text"))).collect()]
    assert out == again
