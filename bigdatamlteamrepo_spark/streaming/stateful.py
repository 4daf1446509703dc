"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 note / §7 step 7: the escape hatch when built-in windowed
aggs can't express the semantics).

Example operator: per-user running totals with explicit state — the
shape every custom sessionizer / CDC dedup / enrichment cache follows.
State is a single (count, total) pair per user key; Spark shards state
by the groupBy key, so state size is O(distinct users) spread across
executors and checkpointed incrementally — the scalable pattern for
100 TB streams.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum) with explicit state.

    Each micro-batch emits the updated totals for users present in the
    batch ("update"-style custom aggregation).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Same operator on the transformWithStateInPandas API (Spark 4.x):
    typed ValueState handles, explicit processor lifecycle — the
    forward-looking surface for multi-state/timer operators (the old
    API has a single state tuple and flat timeouts).

    Runtime requirement: the TWS driver worker imports
    ``google.protobuf`` (state-server protocol); environments without
    the ``protobuf`` package fail at query start — the test suite
    skips in that case and the applyInPandasWithState op above is the
    portable fallback."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# --------------------------------------------------------------------------
# Streaming funnel state machine: per-user (view → click → purchase)
# stage tracking — the streaming twin of the batch
# events_funnel_view_click_purchase query.  State is three nullable
# epoch-micros timestamps per user; each batch's rows are processed in
# event-time order, so with per-user in-order arrival the final state
# equals the batch chained-conditional-min computation (asserted in
# tests).  O(1) state per user, sharded by the groupBy key.
# --------------------------------------------------------------------------

FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)

FUNNEL_STATE = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)


def _funnel_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    # pandas datetime64 is nanoseconds regardless of the parquet unit —
    # convert to epoch MICROS to match Spark's unix_micros on the twin
    ts_us = rows["ts"].astype("int64") // 1000
    for ts, etype in zip(ts_us, rows["event_type"]):
        ts = int(ts)
        if etype == "view" and t1 is None:
            t1 = ts
        elif etype == "click" and t1 is not None and t2 is None and ts > t1:
            t2 = ts
        elif etype == "purchase" and t2 is not None and t3 is None and ts > t2:
            t3 = ts
    state.update((t1, t2, t3))
    stage = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stage": [stage],
            "t1_us": [t1],
            "t2_us": [t2],
            "t3_us": [t3],
        }
    )


def user_funnel_stages(events: DataFrame) -> DataFrame:
    """Streaming per-user funnel stage (0-3) with first-transition
    timestamps; ``update`` mode emits the current stage for users seen
    in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming retention cohorts: the streaming twin of the batch
# events_retention_cohorts matrix.  Per-user state = (cohort week =
# ISO week of the FIRST event ever seen, list of activity weeks already
# emitted); each micro-batch emits one (cohort_week_us,
# activity_week_us) DELTA row per NEWLY-seen (user, week) cell.
# Summing deltas per cell downstream therefore equals the batch
# matrix's COUNT(DISTINCT user_id) exactly — the state dedups, so the
# rollup is a plain additive count, the streaming-friendly form of a
# distinct count.  State is O(weeks-active) per user (bounded by the
# stream's age in weeks), sharded by the groupBy key.
# --------------------------------------------------------------------------

RETENTION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cohort_week_us", T.LongType()),
        T.StructField("activity_week_us", T.LongType()),
    ]
)

RETENTION_STATE = T.StructType(
    [
        T.StructField("cohort_us", T.LongType()),
        T.StructField("weeks", T.ArrayType(T.LongType())),
    ]
)

_US_PER_DAY = 86_400_000_000


def _iso_week_us(ts_us: int) -> int:
    """Epoch micros → epoch micros of that week's ISO Monday 00:00 UTC
    (the streaming twin of ``date_trunc('week', ts)`` on this UTC-tz
    runtime).  1970-01-01 was a Thursday, so day (d + 3) % 7 == 0 is a
    Monday."""
    days = ts_us // _US_PER_DAY
    return (days - (days + 3) % 7) * _US_PER_DAY


def _retention_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    cohort, weeks = state.get if state.exists else (None, [])
    seen = set(weeks)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    ts_us = rows["ts"].astype("int64") // 1000  # pandas ns → µs
    new_weeks = []
    for ts in ts_us:
        w = _iso_week_us(int(ts))
        if cohort is None:
            cohort = w  # first event ever seen defines the cohort
        if w not in seen:
            seen.add(w)
            new_weeks.append(w)
    state.update((cohort, sorted(seen)))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(new_weeks),
            "cohort_week_us": [cohort] * len(new_weeks),
            "activity_week_us": new_weeks,
        }
    )


def user_retention_cells(events: DataFrame) -> DataFrame:
    """Streaming (user, cohort_week, activity_week) cell deltas — each
    cell appears EXACTLY ONCE across the stream's lifetime, so
    ``groupBy(cohort, activity).count()`` over the emitted rows equals
    the batch cohort matrix.  Requires per-user in-order arrival for
    the cohort week (same contract as the funnel operator); late
    PRE-cohort events would need the batch path's full recompute."""
    return events.groupBy("user_id").applyInPandasWithState(
        _retention_update,
        outputStructType=RETENTION_OUTPUT,
        stateStructType=RETENTION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Streaming bottom-k-by-hash quantile sketch: the streaming twin of the
# batch events_value_quantile_sketch.  The sketch is MERGEABLE by
# construction (bottom-k of a union = bottom-k of concatenated
# bottom-k's), so per-key state is exactly the batch sketch of the
# prefix seen so far: merge each micro-batch's (h, value) rows into the
# stored bottom-k, emit the current rank-selected quantile estimates.
# State is O(k) per event type; the hash IS the sample's randomness, so
# stream and batch agree bit-for-bit on any prefix (asserted in tests).
# --------------------------------------------------------------------------

QSKETCH_OUTPUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_sample", T.LongType()),
        T.StructField("p10_est", T.DoubleType()),
        T.StructField("p50_est", T.DoubleType()),
        T.StructField("p90_est", T.DoubleType()),
        T.StructField("p99_est", T.DoubleType()),
    ]
)

QSKETCH_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def _h60_py(key: str) -> int:
    """Python twin of operators/sketches.h60 (first 15 md5 hex digits)."""
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _round_half_up_6(x: float) -> float:
    """Python twin of Spark's F.round(double, 6): shortest-decimal repr
    (BigDecimal.valueOf semantics — repr(float) is also shortest), then
    HALF_UP at the 6th decimal.  Python's builtin round() is half-EVEN
    on the binary value and disagrees on decimal-tie values like
    2.0000005."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _qsketch_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    from bigdatamlteamrepo_spark.queries.sketches import QSK_K, _QSK_PCTS

    (event_type,) = key
    n, hs, vals = state.get if state.exists else (0, [], [])
    pairs = list(zip(hs, vals))
    for pdf in pdfs:
        n += len(pdf)
        ts_us = pdf["ts"].astype("int64") // 1000  # pandas ns → µs
        for uid, ts, v in zip(pdf["user_id"], ts_us, pdf["value"]):
            if pd.isna(uid) or pd.isna(ts):
                continue  # NULL key → no hash → outside the sample
                # (the batch twin's NULL-propagating concat, mirrored)
            pairs.append((_h60_py(f"{int(uid)}|{int(ts)}"), float(v)))
    pairs.sort()  # (h, value) — the batch tie-break
    pairs = pairs[: QSK_K]
    state.update(
        (n, [h for h, _ in pairs], [v for _, v in pairs])
    )
    by_val = sorted(v for _, v in pairs)
    ns = len(by_val)
    ests = {
        f"p{p}_est": [
            _round_half_up_6(by_val[max(1, (ns * p + 99) // 100) - 1])
        ]
        if ns
        else [None]
        for p in _QSK_PCTS
    }
    yield pd.DataFrame(
        {"event_type": [event_type], "n": [n], "n_sample": [ns], **ests}
    )


def value_quantile_sketch_stream(events: DataFrame) -> DataFrame:
    """Streaming per-type quantile estimates from the mergeable
    bottom-k-by-hash sketch; ``update`` mode emits the current
    estimates for types seen in each micro-batch."""
    return events.groupBy("event_type").applyInPandasWithState(
        _qsketch_update,
        outputStructType=QSKETCH_OUTPUT,
        stateStructType=QSKETCH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
