"""As-of join — the canonical "operator Spark lacks" (pyspark guide's
common-OLAP list), implemented as cogrouped ``applyInPandas`` with
``pd.merge_asof`` per key group.

Semantics: for each left row, attach the single right row with the
largest ``right_ts`` ≤ ``left_ts`` (backward direction) within the same
key — the time-series enrichment join (trades→quotes, events→latest
order, CDC snapshot lookup).

Scale: cogroup shuffles both sides once on the key; each group is
sort-merged in Arrow batches executor-side.  Keys must fit per-task
memory (true for per-user/per-symbol histories); a hot key would be
salted by time-bucketing the right side.  No driver state, no
broadcast requirement on either side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """Backward/forward as-of join on key column ``on``.

    Returns all left columns plus the matched ``right_ts`` and
    ``right_cols`` (null when no match).  Both ts columns must be
    timestamps.
    """
    right_cols = right_cols or []
    keep_right = [right_ts, *right_cols]

    clash = set(keep_right) & {f.name for f in left.schema.fields}
    if clash:
        # fail driver-side: duplicate names in the output StructType would
        # otherwise surface as an executor-side pandas KeyError at runtime
        raise ValueError(
            f"asof_join: right columns {sorted(clash)} collide with left "
            "columns; rename them on the right side before joining"
        )

    out_fields = list(left.schema.fields) + [
        right.schema[c] for c in keep_right
    ]
    out_schema = T.StructType(out_fields)
    left_names = [f.name for f in left.schema.fields]

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        l = l.sort_values(left_ts)
        if len(r) == 0:
            out = l.copy()
            for c in keep_right:
                # typed nulls (NaT for timestamps) so Arrow conversion holds
                out[c] = pd.Series(index=l.index, dtype=r[c].dtype)
            return out
        r = r[[*keep_right]].sort_values(right_ts).rename(
            columns={right_ts: f"__r_{right_ts}"}
        )
        merged = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=f"__r_{right_ts}",
            direction=direction,
            tolerance=tolerance,
        )
        merged = merged.rename(columns={f"__r_{right_ts}": right_ts})
        return merged[[*left_names, *keep_right]]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda key, l, r: merge(l, r), schema=out_schema)
    )
