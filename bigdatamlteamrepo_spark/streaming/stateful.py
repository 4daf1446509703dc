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
