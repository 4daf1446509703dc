"""S1/S2 reader round-trips with pinned schemas; metrics-log ops with
the reference's disjoint-nullity dropna semantics (FIXTURES §4)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.ml import metrics_log as ml_metrics
from bigdatamlteamrepo_spark.ml.recipes import generate_recipes
from bigdatamlteamrepo_spark.sources import readers


@pytest.fixture(scope="module")
def metrics_df(spark):
    """~500 rows, train rows and val rows with disjoint nullity + a few
    fully-null rows to exercise how='all'."""
    rows = []
    step = 0
    for epoch in range(10):
        for i in range(40):
            rows.append((step, epoch, 2.0 / (1 + 0.01 * step), None))
            step += 1
        rows.append((step, epoch, None, 1.8 / (1 + 0.008 * step) + (0.05 if epoch == 9 else 0)))
        step += 1
        rows.append((step, epoch, None, None))  # fully-null row
        step += 1
    return spark.createDataFrame(
        rows, "step long, epoch long, train_loss double, val_loss double"
    )


def test_multiline_json_roundtrip(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("json"))
    recipes = generate_recipes(spark, n_rows=100, seed=1)
    path = os.path.join(d, "recipes.json")
    pdf = recipes.toPandas()
    with open(path, "w") as f:
        json.dump(
            [
                {**r, "ingredients": list(r["ingredients"]),
                 "directions": list(r["directions"]), "ner": list(r["ner"])}
                for r in pdf.to_dict("records")
            ],
            f,
        )
    back = readers.read_multiline_json(spark, path, readers.RECIPES_JSON_SCHEMA)
    assert back.count() == 100
    assert back.schema == readers.RECIPES_JSON_SCHEMA
    a = {r.doc_id: list(r.ingredients) for r in back.collect()}
    b = {r.doc_id: list(r.ingredients) for r in recipes.collect()}
    assert a == b


def test_csv_roundtrip_with_schema(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csv"))
    from bigdatamlteamrepo_spark.ml.restaurants import generate_restaurants

    rest = generate_restaurants(spark, n_rows=100, seed=1)
    rest.toPandas().to_csv(os.path.join(d, "r.csv"), index=False)
    back = readers.read_csv(spark, os.path.join(d, "r.csv"), readers.RESTAURANTS_CSV_SCHEMA)
    assert back.count() == 100
    assert [f.dataType for f in back.schema] == [f.dataType for f in readers.RESTAURANTS_CSV_SCHEMA]
    # nulls survive the round-trip
    assert back.filter(F.col("score").isNull()).count() == rest.filter(F.col("score").isNull()).count()


def test_clean_metrics_drops_only_fully_null(metrics_df):
    cleaned = ml_metrics.clean_metrics(metrics_df)
    assert cleaned.count() == metrics_df.count() - 10  # one all-null row per epoch
    # partially-null rows retained
    assert cleaned.filter(F.col("val_loss").isNull()).count() > 0


def test_loss_curves_disjoint(metrics_df):
    train, val = ml_metrics.loss_curves(metrics_df)
    assert train.count() == 400
    assert val.count() == 10
    assert train.filter(F.col("train_loss").isNull()).count() == 0
    steps = [r.step for r in train.collect()]
    assert steps == sorted(steps)


def test_epoch_summary_and_best(metrics_df):
    summary = ml_metrics.epoch_summary(metrics_df).collect()
    assert len(summary) == 10
    # best-so-far is non-increasing
    bests = [r.best_val_so_far for r in summary]
    assert all(b2 <= b1 for b1, b2 in zip(bests, bests[1:]))
    best = ml_metrics.best_epoch(metrics_df).first()
    # epoch 9 has an artificially raised val loss → best is epoch 8
    assert best.epoch == 8


def test_ingest_to_parquet_partitioned(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pq"))
    recipes = generate_recipes(spark, n_rows=50, seed=2).withColumn(
        "bucket", (F.col("doc_id") % 3).cast("int")
    )
    readers.ingest_to_parquet(recipes, d, partition_by=["bucket"])
    assert sorted(os.listdir(d))[:1] == ["_SUCCESS"] or any(
        p.startswith("bucket=") for p in os.listdir(d)
    )
    back = spark.read.parquet(d)
    assert back.count() == 50


def test_orc_roundtrip_with_schema(spark, tmp_path_factory, sf_dir):
    from pyspark.sql import types as T

    d = str(tmp_path_factory.mktemp("orc"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    readers.write_orc(docs, d, partition_by=["lang"])
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    back = readers.read_orc(spark, d, schema)
    assert back.count() == 40
    # partition pruning: a lang= filter reads only that directory
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == docs.filter(F.col("lang") == "en").count()
    assert "OrcScan" in plan or "FileScan orc" in plan


def test_text_and_binary_file_readers(spark, tmp_path_factory):
    import os as _os

    d = str(tmp_path_factory.mktemp("raw"))
    with open(_os.path.join(d, "a.txt"), "w") as f:
        f.write("line one\nline two\n")
    with open(_os.path.join(d, "b.bin"), "wb") as f:
        f.write(b"\x00\x01\x02payload")
    lines = readers.read_text_lines(spark, _os.path.join(d, "a.txt"))
    assert [r.value for r in lines.orderBy("value").collect()] == [
        "line one",
        "line two",
    ]
    blobs = readers.read_binary_files(spark, d, glob="*.bin").collect()
    assert len(blobs) == 1 and bytes(blobs[0].content) == b"\x00\x01\x02payload"


def test_avro_gated(spark):
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        readers.read_avro(spark, "/nonexistent")


def test_json_corrupt_record_capture(spark, tmp_path_factory):
    import os as _os

    from pyspark.sql import types as T

    d = str(tmp_path_factory.mktemp("badjson"))
    with open(_os.path.join(d, "part.json"), "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write('{"id": 2, "name": "also ok"}\n')
        f.write('{"id": 3, "name": BROKEN\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    out = readers.read_json_with_corrupt_capture(spark, d, schema).cache()
    good = out.filter(F.col("_corrupt_record").isNull())
    bad = out.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1
    assert "BROKEN" in bad.first()._corrupt_record
    assert bad.first().id is None


def test_parquet_merge_schema_evolution(spark, tmp_path_factory):
    import os as _os

    d = str(tmp_path_factory.mktemp("evolve"))
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        _os.path.join(d, "batch=1")
    )
    spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    ).write.parquet(_os.path.join(d, "batch=2"))
    merged = readers.read_parquet_merged(spark, d)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 0.5


def test_xml_roundtrip_with_pinned_schema(spark, tmp_path):
    """Spark 4's built-in XML source: write → read with a pinned schema
    reproduces rows exactly (types included, no inference pass)."""
    from pyspark.sql import types as T

    from bigdatamlteamrepo_spark.sources.readers import read_xml, write_xml

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    rows = [(1, "alpha", 0.5), (2, "beta", -3.25), (3, "gamma", 0.0)]
    df = spark.createDataFrame(rows, schema)
    dst = str(tmp_path / "docs_xml")
    write_xml(df, dst, row_tag="doc")
    back = read_xml(spark, dst, row_tag="doc", schema=schema)
    assert back.schema == schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_render_loss_svg(metrics_df):
    """The loss plot (model.eval.py:34-53) as SVG: both series render as
    polylines, val gets markers, axes carry the true min/max, and the
    output is pure deterministic text."""
    svg = ml_metrics.render_loss_svg(metrics_df)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<polyline") == 2  # train + val
    assert "train_loss" in svg and "val_loss" in svg
    assert "<circle" in svg  # val markers
    # deterministic: same frame → same bytes
    assert svg == ml_metrics.render_loss_svg(metrics_df)
    # the y labels carry the actual extremes of the two series
    import re

    vals = [float(m) for m in re.findall(r">([0-9]+\.[0-9]{3})</text>", svg)]
    rows = ml_metrics.clean_metrics(metrics_df).collect()
    losses = [
        x
        for r in rows
        for x in (r["train_loss"], r["val_loss"])
        if x is not None
    ]
    assert min(vals) == round(min(losses), 3)
    assert max(vals) == round(max(losses), 3)


def test_render_loss_svg_empty_raises(spark):
    import pytest as _pytest

    empty = spark.createDataFrame(
        [], "step bigint, epoch bigint, train_loss double, val_loss double"
    )
    with _pytest.raises(ValueError, match="no loss points"):
        ml_metrics.render_loss_svg(empty)
