"""Z-order clustering: data preserved, and per-file extents on BOTH
clustered columns shrink vs a single-column sort (the data-skipping
property parquet row-group stats then exploit)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.sources.layout import write_zordered
from tests.conftest import SF_DIR


def _extents(path_glob: str, col_a: str, col_b: str):
    """Per-file (span_a, span_b) from parquet footer stats."""
    spans = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        los_a, his_a, los_b, his_b = [], [], [], []
        names = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(names[col_a]).statistics
            sb = md.row_group(rg).column(names[col_b]).statistics
            los_a.append(sa.min); his_a.append(sa.max)
            los_b.append(sb.min); his_b.append(sb.max)
        spans.append((max(his_a) - min(los_a), max(his_b) - min(los_b)))
    return spans


def test_zorder_preserves_rows_and_shrinks_extents(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.hour("ts").alias("hour"), "value"
    )
    n = ev.count()

    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "single")
    write_zordered(ev, zdir, cols=["user_id", "hour"], n_files=8)
    # baseline: same file count, sorted by user_id only
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    back = spark.read.parquet(zdir)
    assert back.count() == n
    assert {r.event_id for r in back.select("event_id").collect()} == {
        r.event_id for r in ev.select("event_id").collect()
    }

    z_spans = _extents(zdir + "/part-*.parquet", "user_id", "hour")
    s_spans = _extents(sdir + "/part-*.parquet", "user_id", "hour")
    # single-column sort: hour spans stay ~full-range per file.
    # z-order: BOTH dimensions' average spans must be well under the
    # single-sort baseline's hour span (the whole point of interleaving)
    avg = lambda xs: sum(xs) / len(xs)
    z_user = avg([a for a, _ in z_spans])
    z_hour = avg([b for _, b in z_spans])
    s_user = avg([a for a, _ in s_spans])
    s_hour = avg([b for _, b in s_spans])
    assert s_user < z_user  # single sort wins on its own column...
    assert z_hour < 0.8 * s_hour  # ...but z-order also bounds the second
    # and z-order's user span is still far from the full range
    full_user = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("s")
    ).collect()[0].s
    assert z_user < 0.8 * full_user


def test_compact_parquet_small_files(spark, tmp_path_factory):
    import glob
    import os as _os

    from bigdatamlteamrepo_spark.sources.layout import compact_parquet

    src = str(tmp_path_factory.mktemp("landing"))
    dst = str(tmp_path_factory.mktemp("compacted"))
    # a landing zone of 40 tiny files
    spark.range(0, 4000).selectExpr(
        "id", "CAST(id % 7 AS INT) AS k", "repeat('x', 100) AS pad"
    ).repartition(40).write.mode("overwrite").parquet(src)
    assert len(glob.glob(_os.path.join(src, "part-*"))) == 40
    n = compact_parquet(spark, src, dst, target_mb=128, sort_within_by=["k"])
    assert n == 1  # tiny input → one target-size file
    files = glob.glob(_os.path.join(dst, "part-*"))
    assert len(files) == 1
    back = spark.read.parquet(dst)
    assert back.count() == 4000
    assert back.agg({"id": "sum"}).first()[0] == sum(range(4000))


def test_zorder_blocks_bound_both_dimensions(spark):
    """Every Morton block spans ≤ 2^4 codes in each dimension — the
    two-dimensional locality that makes z-clustered files prunable on
    either column."""
    from bigdatamlteamrepo_spark.queries.events import events_zorder_blocks

    rows = events_zorder_blocks(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["x_max"] - r["x_min"] <= 15
        assert r["y_max"] - r["y_min"] <= 15
