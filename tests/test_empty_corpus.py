"""Empty-corpus robustness: every registered query must PLAN AND RUN
against a corpus whose tables all exist but contain zero rows — the
100 TB reality of empty partitions, fresh sources, and filtered-away
inputs.  Returning an empty frame is fine; raising is not.

Known principled exceptions are listed with the reason; everything
else must produce a result (possibly 0 rows)."""

from __future__ import annotations

import pytest

from bigdatamlteamrepo_spark.catalog import TABLE_SCHEMAS
from bigdatamlteamrepo_spark.queries import QUERIES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty-sf")
    for name, schema in TABLE_SCHEMAS.items():
        spark.createDataFrame([], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"{name}.parquet"))
    return str(d)


#: queries that legitimately cannot run on an empty corpus, with why.
#: Keep this list SHORT — every entry is a documented contract, not an
#: excuse.  (MLlib KMeans refuses empty fits; those operators define
#: "no data -> no model" and the callers guard before fitting.)
EXPECTED_EMPTY_FAILURES: dict[str, str] = {}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_on_empty_corpus(name, spark, empty_sf_dir):
    if name in EXPECTED_EMPTY_FAILURES:
        pytest.skip(EXPECTED_EMPTY_FAILURES[name])
    df = QUERIES[name](spark, empty_sf_dir)
    rows = df.collect()
    assert rows is not None
