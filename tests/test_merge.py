"""MERGE/upsert semantics (operators/merge.py)."""

import pytest
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.merge import affected_partitions, merge_upsert


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    )


def test_update_insert_keep(spark, target):
    updates = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "id long, name string, score double"
    )
    got = {r.id: (r.name, r.score) for r in merge_upsert(target, updates, "id").collect()}
    assert got == {
        1: ("a", 10.0),   # untouched
        2: ("B", 22.0),   # updated
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # inserted
    }


def test_explicit_null_update_wins(spark, target):
    updates = spark.createDataFrame(
        [(1, None, 11.0)], "id long, name string, score double"
    )
    got = {r.id: (r.name, r.score) for r in merge_upsert(target, updates, "id").collect()}
    assert got[1] == (None, 11.0)  # NULL must NOT resurrect 'a'


def test_delete_flag(spark, target):
    updates = spark.createDataFrame(
        [(2, None, None, True), (5, "e", 50.0, False)],
        "id long, name string, score double, _deleted boolean",
    )
    got = {
        r.id: (r.name, r.score)
        for r in merge_upsert(target, updates, "id", delete_col="_deleted").collect()
    }
    assert 2 not in got
    assert got[5] == ("e", 50.0)
    assert got[1] == ("a", 10.0) and got[3] == ("c", 30.0)


def test_duplicate_batch_keys_rejected(spark, target):
    updates = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "id long, name string, score double"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        merge_upsert(target, updates, "id")


def test_affected_partitions(spark):
    updates = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-03"), (3, "2024-01-01")],
        "id long, day string",
    )
    assert sorted(affected_partitions(updates, "day")) == [
        "2024-01-01",
        "2024-01-03",
    ]


def test_merge_idempotent(spark, target):
    updates = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], "id long, name string, score double"
    )
    once = merge_upsert(target, updates, "id")
    twice = merge_upsert(once, updates, "id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
