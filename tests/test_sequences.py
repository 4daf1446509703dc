"""Sequential patterns: hand-stream transition counts/probabilities,
trigram enumeration, per-row probability normalization, and user
isolation (no cross-user phantom steps)."""

from __future__ import annotations

import datetime as dt

from bigdatamlteamrepo_spark.queries.sequences import MICRO


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m)


#: u1: A B A B A ; u2: B B C — transitions within users only
_EVENTS = [
    (1, 0, 10, "A"), (1, 1, 11, "B"), (1, 2, 12, "A"),
    (1, 3, 13, "B"), (1, 4, 14, "A"),
    (2, 0, 20, "B"), (2, 1, 21, "B"), (2, 2, 22, "C"),
]


def _df(spark):
    return spark.createDataFrame(
        [(u, _ts(m), e, t) for u, m, e, t in _EVENTS],
        "user_id bigint, ts timestamp, event_id bigint, event_type string",
    )


def _faces(spark, df):
    import bigdatamlteamrepo_spark.queries.sequences as s

    orig = s.load_table
    s.load_table = lambda *_a, **_k: df
    try:
        trans = {
            (r["prev_type"], r["next_type"]): (r["n_steps"], r["p_micro"])
            for r in s.events_type_transition_matrix(spark, "ignored").collect()
        }
        tri = {
            r["trigram"]: r["n"]
            for r in s.events_type_top_trigrams(spark, "ignored").collect()
        }
    finally:
        s.load_table = orig
    return trans, tri


def test_hand_stream_transitions_and_trigrams(spark):
    trans, tri = _faces(spark, _df(spark))
    # u1: A>B, B>A, A>B, B>A ; u2: B>B, B>C
    assert {k: v[0] for k, v in trans.items()} == {
        ("A", "B"): 2, ("B", "A"): 2, ("B", "B"): 1, ("B", "C"): 1,
    }
    # row B: 2+1+1 = 4 steps → 500000 / 250000 / 250000
    assert trans[("B", "A")][1] == 500000
    assert trans[("B", "B")][1] == 250000
    assert trans[("B", "C")][1] == 250000
    assert trans[("A", "B")][1] == MICRO
    # trigrams: u1 A>B>A, B>A>B, A>B>A ; u2 B>B>C
    assert tri == {"A>B>A": 2, "B>A>B": 1, "B>B>C": 1}


def test_no_cross_user_steps(spark):
    """The last event of u1 must not chain into the first of u2."""
    trans, tri = _faces(spark, _df(spark))
    # 8 events, 2 users → 8 - 2 = 6 transitions exactly
    assert sum(v[0] for v in trans.values()) == 6
    assert sum(tri.values()) == 8 - 2 * 2


def test_probability_rows_normalize(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.sequences import (
        events_type_transition_matrix,
    )

    rows = events_type_transition_matrix(spark, sf_dir).collect()
    by_prev: dict[str, int] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0) + r["p_micro"]
    for prev, s in by_prev.items():
        # half-away rounding keeps each row within |types| half-units
        assert abs(s - MICRO) <= 3, (prev, s)
