"""Streaming ingest deduplication — exactly-once delivery on top of an
at-least-once upstream (producer retries, file re-deliveries).

Unified batch/stream builder in the house style (streaming/windows.py):
the streaming path is ``dropDuplicatesWithinWatermark``, whose state
holds one entry per key only inside the watermark horizon — bounded
state, indefinitely runnable; the batch twin is plain
``dropDuplicates``, so stream ≡ batch is testable on the same input.

At 100 TB-ingest scale the dedup key should be a content fingerprint
(e.g. the md5/SimHash fingerprints from queries/text_dedup.py) rather
than a producer-assigned id, making this the streaming front door of
the same dedup tier the batch corpus runs through.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_events(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Keep the first arrival per key (batch or stream).

    Streaming: duplicates arriving within ``watermark`` of the original
    event time are suppressed by keyed state; older re-deliveries are
    dropped by the watermark itself — either way a key is emitted at
    most once.  Rows are emitted immediately (dedup is a stateful
    filter, not an aggregation), so sink latency stays per-row.
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))
