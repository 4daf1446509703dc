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
