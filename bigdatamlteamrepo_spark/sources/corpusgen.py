"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-corpus generator, batch and streaming.

Why a generator source: scale experiments need a corpus bigger than any
fixture on disk, with zero I/O cost and task-retry determinism.  Each
document is generated purely from (seed, doc_id), so a retried or
speculatively-executed task regenerates byte-identical rows — the same
idempotency contract the driver's parquet fixtures give, without the
storage.  ``partitions`` controls read parallelism exactly like file
splits (one ``InputPartition`` per doc_id range).

Batch:  ``spark.read.format("corpusgen").option("n_docs", 10000)
.option("partitions", 32).load()``
Stream: ``spark.readStream.format("corpusgen").option("rows_per_batch",
500).load()`` — offsets are doc_id watermarks, so exactly-once replay
holds across restarts (same range ⇒ same rows).

Register first: ``spark.dataSource.register(CorpusGenDataSource)``.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_VOCAB = (
    "spark query hash join merge filter stream window batch table row column "
    "shuffle partition broadcast sample index vector token shard corpus "
    "model train eval metric graph node edge cluster label weight"
).split()
_LANGS = ["en", "de", "fr", "es", "zh"]
_N_SOURCES = 20


def _gen_doc(
    seed: int, doc_id: int, dup_fraction: float = 0.0
) -> tuple[int, str, str, str, int]:
    """One document, a pure function of (seed, doc_id, dup_fraction).

    ``dup_fraction`` > 0 makes that share of documents NEAR-COPIES of an
    earlier document (same token stream with ~10% of tokens mutated) —
    still purely deterministic, since the base document is regenerated
    from its own (seed, base_id).  Gives scale experiments a realistic
    near-dup structure; the default 0.0 keeps the original corpus.

    The dup decision uses its OWN string-seeded RNG (str seeding is
    process-stable, unlike ``hash()``), never the document RNG: an extra
    draw on the doc stream would make the regenerated base diverge from
    the text actually stored at base_id (the r2 ADVICE defect — measured
    dup-vs-stored-base Jaccard 0.34 instead of 0.60).  The base is
    regenerated with the SAME dup_fraction so dup-of-dup chains resolve
    to the stored text.
    """
    if dup_fraction > 0.0 and doc_id > 0:
        dup_rng = random.Random(f"{seed}:{doc_id}:dup")
        if dup_rng.random() < dup_fraction:
            base_id = dup_rng.randrange(doc_id)  # strictly earlier, never itself
            base = _gen_doc(seed, base_id, dup_fraction)
            toks = base[1].split()
            for i in range(len(toks)):
                if dup_rng.random() < 0.1:
                    toks[i] = dup_rng.choice(_VOCAB)
            text = " ".join(toks)
            return (
                doc_id,
                text,
                base[2],
                f"src_{dup_rng.randrange(_N_SOURCES)}",
                len(text),
            )
    rng = random.Random(seed * 1_000_003 + doc_id)
    n_tokens = rng.randint(20, 120)
    text = " ".join(rng.choice(_VOCAB) for _ in range(n_tokens))
    lang = rng.choice(_LANGS)
    source = f"src_{rng.randrange(_N_SOURCES)}"
    return (doc_id, text, lang, source, len(text))


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class CorpusGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.dup_fraction = float(options.get("dup_fraction", 0.0))

    def partitions(self) -> list[InputPartition]:
        return [
            _RangePartition(
                i * self.n_docs // self.n_parts,
                (i + 1) * self.n_docs // self.n_parts,
            )
            for i in range(self.n_parts)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.lo, partition.hi):
            yield _gen_doc(self.seed, doc_id, self.dup_fraction)


class CorpusGenStreamReader(SimpleDataSourceStreamReader):
    """Offsets are doc_id high-water marks: batch (start, end) always
    regenerates the same rows, giving exactly-once semantics on replay
    after a checkpoint restart."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def read(self, start: dict):
        lo = start["doc_id"]
        hi = lo + self.rows_per_batch
        return (
            iter([_gen_doc(self.seed, i) for i in range(lo, hi)]),
            {"doc_id": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [_gen_doc(self.seed, i) for i in range(start["doc_id"], end["doc_id"])]
        )


class CorpusGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "corpusgen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CorpusGenReader:
        return CorpusGenReader(self.options)

    def simpleStreamReader(self, schema) -> CorpusGenStreamReader:
        return CorpusGenStreamReader(self.options)
