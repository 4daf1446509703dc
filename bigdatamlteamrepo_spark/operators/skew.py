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


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join on ``on`` with the fact side salted into ``n_salts``
    sub-keys.  Result equals ``fact.join(build, on, how)`` exactly.
    """
    salted_fact = fact.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    replicated = build.select("*", salts)
    out = salted_fact.join(replicated, [on, SALT_COL], how)
    return out.drop(SALT_COL)
