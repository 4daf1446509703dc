"""Z-order (Morton) clustered writes — multi-column data skipping
without a table format.

Sorting a write by ONE column gives parquet row-group min/max stats
that prune scans on that column only; interleaving the bits of several
columns (the Morton curve) keeps every interleaved column's per-file
extent small simultaneously, so predicates on ANY of them skip most
row groups.  This is what ``OPTIMIZE ... ZORDER BY`` does in lakehouse
formats, expressed here as pure column arithmetic + a range
repartition — no Delta/Iceberg jars required (none exist in this
container; the docstring in sources/readers.py records that gap).

The z-value is bit-interleaving over fixed-width normalized ranks, so
it is a deterministic pure expression (codegen-friendly, no UDF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (16 bits × 2 dims = 32-bit z-values)
Z_BITS = 16


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2^bits) over its
    observed [lo, hi] range (degenerate range → 0)."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    max_code = (1 << bits) - 1
    return F.least(
        F.floor(frac * max_code).cast("long"), F.lit(max_code).cast("long")
    )


def zvalue(codes: Sequence[Column], bits: int = Z_BITS) -> Column:
    """Morton interleave of pre-normalized integer codes (each in
    [0, 2^bits)); dimension d contributes bit i to output bit
    ``i * n_dims + d``."""
    n = len(codes)
    out = F.lit(0).cast("long")
    for d, c in enumerate(codes):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * n + d))
    return out


def write_zordered(
    df: DataFrame,
    out_dir: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of ``cols``.

    One pass computes per-column min/max (an aggregate, broadcast back
    as literals via crossJoin of a 1-row frame), a second writes with
    ``repartitionByRange`` on the z-value + an in-partition sort — the
    standard two-pass OPTIMIZE shape.  Each output file then covers a
    small hyper-rectangle of the key space: row-group stats prune scans
    filtered on ANY clustered column.
    """
    stats = df.agg(
        *[F.min(c).alias(f"__lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"__hi_{i}") for i, c in enumerate(cols)],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    codes = [
        _normalize(
            F.col(c), F.col(f"__lo_{i}"), F.col(f"__hi_{i}"), bits
        )
        for i, c in enumerate(cols)
    ]
    z = zvalue(codes, bits)
    (
        with_stats.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__lo_{i}" for i in range(len(cols))],
              *[f"__hi_{i}" for i in range(len(cols))])
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_mb: int = 128,
    sort_within_by: Sequence[str] | None = None,
    recursive: bool = False,
) -> int:
    """Compact a small-files parquet landing zone into ~``target_mb``
    files; returns the output file-count.

    Streaming ingests and partitioned writes leave landing zones with
    thousands of KB-scale files; at 100 TB the scan pays per-file open/
    footer costs and the driver pays per-file listing — compaction into
    ~128 MB files is the standard remedy (the ``OPTIMIZE`` half of
    lakehouse maintenance; the Z-order write above is the other half).

    File count = ceil(input bytes / target), measured from the source
    footprint via Hadoop's FileSystem (works for any supported scheme,
    not just local paths).  ``sort_within_by`` optionally sorts within
    output files so row-group min/max stats prune scans on those
    columns.  Compression usually shrinks output below target_mb —
    sizing from INPUT bytes biases toward slightly smaller, splittable
    files rather than oversized ones.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(hconf)
    total_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    # recursive: landing zones whose writers drop batch-scoped
    # SUBDIRECTORIES (non key=value names, so partition discovery
    # won't find them) need the full file tree
    reader = spark.read.option("recursiveFileLookup", "true") if recursive else spark.read
    df = reader.parquet(src)
    out = df.repartition(int(n_files))
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst)
    return int(n_files)
