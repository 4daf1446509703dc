"""Skew-mitigated equi-join via key salting.

AQE's skew-join handles skew in *sort-merge* joins at runtime, but when
a key is pathologically hot (one key = a large fraction of the fact
side) explicit salting is the reliable fix and works for every join
strategy: the fact side gets a random salt in [0, n), the (smaller)
build side is replicated n× with every salt, and the join key becomes
(key, salt) — the hot key's rows spread over n reducer partitions.

Cost model: replicates the build side n× (shuffle volume × n on that
side only).  Choose n ≈ hot-key share × shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

#: join types preserved exactly by fact-side salting (the build side is
#: replicated n_salts×, so right/full outer would emit each unmatched
#: build row once per salt — n_salts duplicates)
_SALT_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi",
                  "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join on ``on`` with the fact side salted into ``n_salts``
    sub-keys.  Result equals ``fact.join(build, on, how)`` exactly for
    fact-preserving join types (inner/left/semi/anti); right and full
    outer are rejected because replicating the build side would
    duplicate its unmatched rows once per salt.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join does not preserve how={how!r}: the build side is "
            f"replicated {n_salts}x, so unmatched build rows would be "
            "emitted once per salt. Use inner/left/left_semi/left_anti, or "
            "salt the other side."
        )
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    replicated = build.select("*", salts)
    out = salted_fact.join(replicated, [on, SALT_COL], how)
    return out.drop(SALT_COL)
