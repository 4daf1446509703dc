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


def test_streaming_funnel_matches_batch(spark, sf_dir):
    """Streaming funnel state machine ≡ the batch chained
    conditional-min funnel, per user."""
    from bigdatamlteamrepo_spark.streaming.stateful import user_funnel_stages

    stream = W.read_events_stream(spark, sf_dir)
    out = user_funnel_stages(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_stages")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.user_id: (r.stage, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.sql(
            "SELECT user_id, s.stage AS stage, s.t1_us AS t1_us, "
            "s.t2_us AS t2_us, s.t3_us AS t3_us FROM ("
            "  SELECT user_id, max_by(struct(stage, t1_us, t2_us, t3_us), stage) AS s"
            "  FROM funnel_stages GROUP BY user_id)"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    us = lambda col: (F.unix_micros(F.col(col)))
    batch = (
        ev.select("user_id")
        .distinct()
        .join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("stage"),
            us("t1").alias("t1_us"),
            us("t2").alias("t2_us"),
            us("t3").alias("t3_us"),
        )
    )
    want = {r.user_id: (r.stage, r.t1_us, r.t2_us, r.t3_us) for r in batch.collect()}
    assert got == want


def test_stateful_restart_with_different_shuffle_width(spark, sf_dir, tmp_path):
    """VERDICT r3 item 9 — the 100× story must cover state
    redistribution: a stateful query checkpointed at one shuffle width
    is restarted with a DIFFERENT session shuffle width and more data.
    Spark pins the state-store partition count in the checkpoint (the
    new session conf must neither corrupt state nor re-key it), so the
    resumed totals must equal the batch aggregation over ALL data."""
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    t1 = events.filter(F.col("event_id") % 2 == 0)
    t2 = events.filter(F.col("event_id") % 2 == 1)
    t1.coalesce(1).write.mode("append").parquet(str(src))

    old_width = spark.conf.get("spark.sql.shuffle.partitions")

    out = str(tmp_path / "out")

    def run():
        # memory sink cannot recover from a checkpoint; foreachBatch
        # (the production pattern for update-mode custom sinks) can
        stream = spark.readStream.schema(events.schema).parquet(str(src))
        q = (
            user_running_totals(stream)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, epoch: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        run()
        n_updates_run1 = spark.read.parquet(out).count()
        # restart from the same checkpoint at a different width, with
        # the second tranche now present
        t2.coalesce(1).write.mode("append").parquet(str(src))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_width)

    updates = spark.read.parquet(out)
    assert updates.count() > n_updates_run1, "second run emitted no updates"
    # run-2 rows are the ones whose totals cover both tranches: take the
    # final (max) totals per user over all emitted updates
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in updates.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        .collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    # every user's FINAL totals must cover both tranches — state from
    # the width-3 run survived the width-13 restart intact
    assert got == want


def test_streaming_retention_cohorts_matches_batch(spark, sf_dir):
    """Streaming cohort-cell deltas, summed per (cohort, activity)
    cell, equal the batch events_retention_cohorts matrix (the state
    dedups (user, week) cells, so a plain additive count replaces the
    batch COUNT(DISTINCT))."""
    from bigdatamlteamrepo_spark.queries import QUERIES
    from bigdatamlteamrepo_spark.streaming.stateful import user_retention_cells

    stream = W.read_events_stream(spark, sf_dir)
    out = user_retention_cells(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("retention_cells")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.cohort_week_us, r.activity_week_us): r.n
        for r in spark.sql(
            "SELECT cohort_week_us, activity_week_us, COUNT(*) AS n "
            "FROM retention_cells GROUP BY 1, 2"
        ).collect()
    }
    batch = QUERIES["events_retention_cohorts"](spark, sf_dir).select(
        F.unix_micros("cohort_week").alias("c"),
        F.unix_micros("activity_week").alias("a"),
        "n_users",
    )
    want = {(r.c, r.a): r.n_users for r in batch.collect()}
    assert got == want
    # every emitted (user, cell) row is unique — the delta contract
    dup = spark.sql(
        "SELECT user_id, activity_week_us, COUNT(*) c FROM retention_cells "
        "GROUP BY 1, 2 HAVING COUNT(*) > 1"
    ).count()
    assert dup == 0


def test_streaming_quantile_sketch_matches_batch(spark, sf_dir):
    """The streaming bottom-k-by-hash quantile sketch's final state
    equals the batch events_value_quantile_sketch exactly — the
    mergeability property live: the stream merges micro-batch
    bottom-k's, the batch computes one global bottom-k."""
    from bigdatamlteamrepo_spark.queries import QUERIES
    from bigdatamlteamrepo_spark.streaming.stateful import (
        value_quantile_sketch_stream,
    )

    stream = W.read_events_stream(spark, sf_dir)
    out = value_quantile_sketch_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("qsketch")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.event_type: (r.n, r.n_sample, r.p10_est, r.p50_est, r.p90_est, r.p99_est)
        for r in spark.sql(
            "SELECT event_type, s.* FROM (SELECT event_type, "
            "max_by(struct(n, n_sample, p10_est, p50_est, p90_est, p99_est), n) AS s "
            "FROM qsketch GROUP BY event_type)"
        ).collect()
    }
    want = {
        r.event_type: (r.n, r.n_sample, r.p10_est, r.p50_est, r.p90_est, r.p99_est)
        for r in QUERIES["events_value_quantile_sketch"](spark, sf_dir).collect()
    }
    assert got == want
