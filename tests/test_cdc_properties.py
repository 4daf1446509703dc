"""Property pin for the CDC snapshot diff: on ARBITRARY append-only
logs (same-timestamp ties included) and ANY split instant, the
struct-max one-pass diff must equal a pure-Python compaction diff."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.cdc import snapshot_diff


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


#: logs: up to 5 keys × events at minutes 0..30, 2 types, 3 values —
#: small alphabets force same-(key, ts) ties and every diff status
_logs = st.lists(
    st.tuples(
        st.integers(0, 4),         # key
        st.integers(0, 30),        # minute
        st.sampled_from("pq"),     # type
        st.sampled_from([1.0, 2.0, 3.0]),
    ),
    min_size=1,
    max_size=18,
)


def _py_diff(rows, split_minute):
    logs: dict[int, list] = {}
    for eid, (k, m, t, v) in enumerate(rows):
        logs.setdefault(k, []).append((_ts(m), eid, t, v))
    out = {}
    for k, evs in logs.items():
        evs.sort()
        s2 = evs[-1]
        pre = [e for e in evs if e[0] <= _ts(split_minute)]
        if not pre:
            out[k] = "added"
            continue
        s1 = pre[-1]
        if s2[1] == s1[1]:
            out[k] = "unchanged"
        elif (s2[2], s2[3]) == (s1[2], s1[3]):
            out[k] = "noop_update"
        else:
            out[k] = "changed"
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_logs, split_minute=st.integers(-1, 31))
def test_diff_matches_python_reference(spark, raw, split_minute):
    rows = [
        (eid, _ts(m), k, t, v) for eid, (k, m, t, v) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    got = {
        r["user_id"]: r["status"]
        for r in snapshot_diff(
            df,
            key="user_id",
            ts="ts",
            tiebreak="event_id",
            payload=["event_type", "value"],
            split=F.lit(_ts(split_minute)),
        ).collect()
    }
    assert got == _py_diff(raw, split_minute)
