"""Custom stateful streaming op + PipelineModel persistence round-trip
(SURVEY S5/M17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.streaming import windows as W
from bigdatamlteamrepo_spark.streaming.stateful import user_running_totals


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    stream = W.read_events_stream(spark, sf_dir)
    out = user_running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # single-batch bounded source → final state per user = batch agg
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql(
            "SELECT user_id, max(n_events) n_events, max(total_value) total_value "
            "FROM running_totals GROUP BY user_id"
        ).collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_tws_running_totals_matches_batch(spark, sf_dir):
    """transformWithStateInPandas variant agrees with the batch agg."""
    import pytest

    from bigdatamlteamrepo_spark.streaming.stateful import user_running_totals_tws

    stream = W.read_events_stream(spark, sf_dir)
    try:
        out = user_running_totals_tws(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_totals")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    except Exception as exc:  # pragma: no cover - env-dependent API
        pytest.skip(f"transformWithStateInPandas unavailable here: {exc}")
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql(
            "SELECT user_id, max(n_events) n_events, max(total_value) total_value "
            "FROM tws_totals GROUP BY user_id"
        ).collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_pipeline_model_save_load_roundtrip(spark, tmp_path_factory):
    from bigdatamlteamrepo_spark.ml import allergen
    from bigdatamlteamrepo_spark.ml.recipes import generate_recipes
    from pyspark.ml import PipelineModel

    recipes = generate_recipes(spark, n_rows=600, seed=5)
    res = allergen.fit_binary(
        recipes, kind="lr", num_features=128, balance="weight", seed=42, max_iter=20
    )
    path = str(tmp_path_factory.mktemp("model")) + "/pipe"
    res.model.write().overwrite().save(path)
    back = PipelineModel.load(path)

    data = allergen.with_binary_label(
        allergen.with_ingredient_array(recipes)
    ).withColumn("label", F.col("Has_Allergen").cast("double"))
    a = back.transform(data).select("doc_id", "prediction").collect()
    b = res.model.transform(data).select("doc_id", "prediction").collect()
    assert {(r.doc_id, r.prediction) for r in a} == {(r.doc_id, r.prediction) for r in b}
