"""SCD Type-2 collapse + point-in-time enrichment: hand-stream pins
(known change points), interval invariants, as-of tie semantics, and
the one-Exchange plan gate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.scd2 import pit_enrich, scd2_collapse


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


#: (key, ts, tiebreak, attr) — customer 1 changes A→B→A; customer 2 is
#: constant; customer 3 flips twice on the SAME day (tiebreak decides)
_OBS = [
    (1, "2024-01-01", 10, "A"),
    (1, "2024-01-05", 11, "A"),   # no change — collapses
    (1, "2024-02-01", 12, "B"),
    (1, "2024-03-01", 13, "A"),
    (2, "2024-01-02", 20, "X"),
    (2, "2024-04-01", 21, "X"),
    (3, "2024-01-03", 30, "P"),
    (3, "2024-01-03", 31, "Q"),   # same-day change, higher tiebreak
]


def _obs_df(spark):
    return spark.createDataFrame(
        [(k, _d(ts), tb, a) for k, ts, tb, a in _OBS],
        "k bigint, ts date, tb bigint, attr string",
    )


def _collapse(spark):
    return scd2_collapse(_obs_df(spark), "k", "attr", "ts", "tb")


def test_hand_stream_versions(spark):
    rows = {
        (r["k"], r["version"]): (
            r["attr"], r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in _collapse(spark).collect()
    }
    assert rows == {
        (1, 1): ("A", _d("2024-01-01"), _d("2024-02-01"), False),
        (1, 2): ("B", _d("2024-02-01"), _d("2024-03-01"), False),
        (1, 3): ("A", _d("2024-03-01"), None, True),
        (2, 1): ("X", _d("2024-01-02"), None, True),
        # same-day flip: two versions sharing valid_from, Q wins as
        # current (zero-length [P) interval records the observation)
        (3, 1): ("P", _d("2024-01-03"), _d("2024-01-03"), False),
        (3, 2): ("Q", _d("2024-01-03"), None, True),
    }


def test_interval_invariants(spark):
    """Per key: versions dense from 1, intervals chain exactly
    (valid_to == next valid_from), exactly one open current row, and no
    two consecutive versions repeat the attr (else they'd collapse)."""
    by_key: dict[int, list] = {}
    for r in _collapse(spark).collect():
        by_key.setdefault(r["k"], []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["attr"] != b["attr"]


def _facts_df(spark):
    facts = [
        (100, 1, "2023-12-31"),  # before any version → NULL
        (101, 1, "2024-01-15"),  # inside v1 → A
        (102, 1, "2024-02-01"),  # ON the change date → new tier B
        (103, 1, "2024-12-01"),  # after last change → current A
        (104, 3, "2024-01-03"),  # same-day double flip → highest version Q
        (105, 9, "2024-06-01"),  # unknown key → NULL
    ]
    return spark.createDataFrame(
        [(i, k, _d(ts)) for i, k, ts in facts],
        "fid bigint, k bigint, fdate date",
    )


def test_pit_enrich_asof_semantics(spark):
    out = pit_enrich(
        _facts_df(spark), _collapse(spark),
        fact_key="k", dim_key="k", fact_date="fdate", attr="attr",
    )
    got = {r["fid"]: r["attr"] for r in out.collect()}
    assert got == {100: None, 101: "A", 102: "B", 103: "A", 104: "Q", 105: None}


def test_pit_enrich_preserves_fact_rows(spark):
    """PIT is an enrichment, never a filter/multiplier: row count and
    fact columns pass through 1:1."""
    facts = _facts_df(spark)
    out = pit_enrich(
        facts, _collapse(spark),
        fact_key="k", dim_key="k", fact_date="fdate", attr="attr",
    )
    assert out.count() == facts.count()
    assert sorted(out.columns) == sorted([*facts.columns, "attr"])


def test_scd2_plan_single_exchange(spark):
    """Both window passes share (partition key, sort order): the whole
    collapse must cost exactly ONE Exchange (plus its Sort) — a second
    shuffle would break the claim in the module docstring."""
    plan = _collapse(spark)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_pit_plan_no_range_join(spark):
    """The as-of union must not plan a nested-loop/cartesian interval
    join at any size."""
    out = pit_enrich(
        _facts_df(spark), _collapse(spark),
        fact_key="k", dim_key="k", fact_date="fdate", attr="attr",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_collapse_is_partition_layout_invariant(spark):
    """Same versions regardless of the input's physical partitioning."""
    base = _obs_df(spark)
    a = {tuple(r) for r in scd2_collapse(base, "k", "attr", "ts", "tb").collect()}
    b = {
        tuple(r)
        for r in scd2_collapse(
            base.repartition(7, F.col("tb")), "k", "attr", "ts", "tb"
        ).collect()
    }
    assert a == b


def test_merge_equals_batch_recompute(spark):
    """The incremental merge must be EXACTLY the batch collapse of the
    full history, for every split point of the hand stream."""
    from bigdatamlteamrepo_spark.queries.scd2 import scd2_merge

    obs = _obs_df(spark)
    full = {tuple(r) for r in scd2_collapse(obs, "k", "attr", "ts", "tb").collect()}
    for split in ["2024-01-02", "2024-01-04", "2024-02-15"]:
        dim = scd2_collapse(
            obs.filter(F.col("ts") <= F.lit(_d(split))), "k", "attr", "ts", "tb"
        )
        batch = obs.filter(F.col("ts") > F.lit(_d(split)))
        merged = scd2_merge(dim, batch, "k", "attr", "ts", "tb")
        assert {tuple(r) for r in merged.collect()} == full, split


def test_merge_equals_batch_on_random_streams(spark):
    import random

    from bigdatamlteamrepo_spark.queries.scd2 import scd2_merge

    rng = random.Random(11)
    rows = []
    tb = 0
    for k in range(12):
        for day in sorted(rng.sample(range(1, 28), rng.randint(1, 12))):
            tb += 1
            rows.append((k, _d(f"2024-01-{day:02d}"), tb, rng.choice("ABC")))
    obs = spark.createDataFrame(rows, "k bigint, ts date, tb bigint, attr string")
    full = {tuple(r) for r in scd2_collapse(obs, "k", "attr", "ts", "tb").collect()}
    split = _d("2024-01-14")
    dim = scd2_collapse(obs.filter(F.col("ts") <= F.lit(split)), "k", "attr", "ts", "tb")
    merged = scd2_merge(
        dim, obs.filter(F.col("ts") > F.lit(split)), "k", "attr", "ts", "tb"
    )
    assert {tuple(r) for r in merged.collect()} == full


def test_merge_leaves_untouched_keys_alone_and_handles_new_keys(spark):
    from bigdatamlteamrepo_spark.queries.scd2 import scd2_merge

    obs = _obs_df(spark)
    dim = scd2_collapse(obs, "k", "attr", "ts", "tb")
    # batch touches key 1 (existing) and key 99 (brand new)
    batch = spark.createDataFrame(
        [(1, _d("2024-06-01"), 90, "Z"), (99, _d("2024-06-02"), 91, "Q")],
        "k bigint, ts date, tb bigint, attr string",
    )
    merged = {(r["k"], r["version"]): r for r in scd2_merge(
        dim, batch, "k", "attr", "ts", "tb"
    ).collect()}
    # untouched keys identical to the original dim rows
    for r in dim.collect():
        if r["k"] in (2, 3):
            assert merged[(r["k"], r["version"])]["attr"] == r["attr"]
            assert merged[(r["k"], r["version"])]["valid_from"] == r["valid_from"]
            assert merged[(r["k"], r["version"])]["is_current"] == r["is_current"]
    # key 1 gained version 4 (Z), closing version 3
    assert merged[(1, 4)]["attr"] == "Z" and merged[(1, 4)]["is_current"]
    assert merged[(1, 3)]["valid_to"] == _d("2024-06-01")
    assert not merged[(1, 3)]["is_current"]
    # brand-new key starts at version 1, open
    assert merged[(99, 1)]["attr"] == "Q" and merged[(99, 1)]["is_current"]


def test_merge_validate_catches_late_data(spark):
    import pytest

    from bigdatamlteamrepo_spark.queries.scd2 import (
        MergeContractViolated,
        scd2_merge,
    )

    obs = _obs_df(spark)
    dim = scd2_collapse(obs, "k", "attr", "ts", "tb")
    late = spark.createDataFrame(
        [(1, _d("2024-02-15"), 90, "Z")],  # before key 1's last change (03-01)
        "k bigint, ts date, tb bigint, attr string",
    )
    with pytest.raises(MergeContractViolated):
        scd2_merge(dim, late, "k", "attr", "ts", "tb", validate=True)
    # a conforming batch passes validation and merges
    ok = spark.createDataFrame(
        [(1, _d("2024-06-01"), 91, "Z")],
        "k bigint, ts date, tb bigint, attr string",
    )
    out = scd2_merge(dim, ok, "k", "attr", "ts", "tb", validate=True)
    assert out.filter("k = 1 AND is_current").collect()[0]["attr"] == "Z"


def test_pit_enrich_rejects_column_clash(spark):
    import pytest

    facts = _facts_df(spark).withColumnRenamed("fid", "attr")
    with pytest.raises(ValueError, match="collide"):
        pit_enrich(
            facts, _collapse(spark),
            fact_key="k", dim_key="k", fact_date="fdate", attr="attr",
        )


def test_pit_enrich_non_string_attr(spark):
    """ADVICE_r10: the union placeholder is typed from the dim attr, so
    a non-string SCD2 attribute (here bigint) enriches correctly."""
    obs = spark.createDataFrame(
        [
            (1, _d("2024-01-01"), 10, 100),
            (1, _d("2024-02-01"), 11, 250),
            (2, _d("2024-01-05"), 20, 7),
        ],
        "k bigint, ts date, tb bigint, attr bigint",
    )
    dim = scd2_collapse(obs, "k", "attr", "ts", "tb")
    facts = spark.createDataFrame(
        [
            (100, 1, _d("2024-01-15")),
            (101, 1, _d("2024-03-01")),
            (102, 2, _d("2024-01-01")),  # before first version → NULL
        ],
        "fid bigint, k bigint, fdate date",
    )
    out = pit_enrich(
        facts, dim, fact_key="k", dim_key="k", fact_date="fdate", attr="attr"
    )
    assert dict(out.select("fid", "attr").collect()) == {
        100: 100,
        101: 250,
        102: None,
    }
    assert out.schema["attr"].dataType.typeName() == "long"
