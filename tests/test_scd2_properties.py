"""Property-based pins for the SCD2 tier: for ARBITRARY observation
streams (same-day ties included) and ANY split day, the incremental
merge must equal the batch collapse, and the collapse must satisfy the
interval invariants.  A pure-Python reference collapse is the third
implementation (Spark face, DuckDB oracle, and this)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.scd2 import scd2_collapse, scd2_merge


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


#: streams: up to 4 keys × up to 6 observations on days 1..20 over a
#: 3-letter alphabet; tiebreaks are made unique and ORDER-CONSISTENT
#: with days per key (the contract under which same-day ties resolve)
_streams = st.lists(
    st.tuples(
        st.integers(0, 3),            # key
        st.integers(1, 20),           # day
        st.sampled_from("ABC"),       # attr
    ),
    min_size=1,
    max_size=16,
)


def _normalize(raw):
    """Assign per-key tiebreaks increasing with (day, arrival order)."""
    rows = []
    counter = 0
    for k, day, a in sorted(raw, key=lambda t: (t[0], t[1])):
        counter += 1
        rows.append((k, _d(day), counter, a))
    return rows


def _py_collapse(rows):
    """Pure-Python SCD2 reference."""
    by_key: dict[int, list] = {}
    for k, ts, tb, a in rows:
        by_key.setdefault(k, []).append((ts, tb, a))
    out = set()
    for k, obs in by_key.items():
        obs.sort()
        changes = []
        prev = None
        for ts, tb, a in obs:
            if prev is None or a != prev:
                changes.append((ts, a))
            prev = a
        for i, (ts, a) in enumerate(changes):
            valid_to = changes[i + 1][0] if i + 1 < len(changes) else None
            out.add((k, a, ts, valid_to, i + 1, valid_to is None))
    return out


def _spark_rows(df):
    return {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["version"],
         r["is_current"])
        for r in df.collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_streams, split_day=st.integers(0, 21))
def test_collapse_and_merge_match_python_reference(spark, raw, split_day):
    rows = _normalize(raw)
    df = spark.createDataFrame(
        rows, "k bigint, ts date, tb bigint, attr string"
    )
    expected = _py_collapse(rows)
    assert _spark_rows(scd2_collapse(df, "k", "attr", "ts", "tb")) == expected

    split = _d(split_day) if 1 <= split_day <= 20 else (
        dt.date(2023, 12, 31) if split_day == 0 else dt.date(2024, 2, 1)
    )
    dim = scd2_collapse(
        df.filter(F.col("ts") <= F.lit(split)), "k", "attr", "ts", "tb"
    )
    batch = df.filter(F.col("ts") > F.lit(split))
    merged = scd2_merge(dim, batch, "k", "attr", "ts", "tb")
    assert _spark_rows(merged) == expected
