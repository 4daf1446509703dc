"""Mergeable distinct/frequency sketches as portable column expressions.

Three classic streaming sketches — HyperLogLog (distinct count), KMV /
bottom-k (distinct count), and count-min (frequency) — built entirely
from md5-derived integer hashing so the SAME arithmetic runs in Spark
and in the DuckDB oracle (value-hash-checkable, like the MinHash tier
in functions/text.py).

Why sketches matter at 100 TB: each one is an algebraic aggregate —
per-partition partial states (register maxes, bottom-k heaps, counter
grids) merge associatively, so Spark computes them as map-side partial
aggregates + one O(sketch-size) reduce, never shuffling raw values.
``COUNT(DISTINCT x)`` shuffles every distinct value; an HLL register
table is 256 rows per group no matter how many rows the group holds.

Hashing: h60(v) = first 15 hex digits of md5(v) as a 60-bit integer —
below 2^60, so every intermediate here (shifts, mods, sums of 256
pow-of-two terms ≤ 2^53) stays exact in signed 64-bit arithmetic in
both engines (same safety argument as functions/text.uh_constants).

Reference parity: the reference engine has no sketch tier; this extends
the LLM-training-pipeline surface (corpus cardinality / heavy-hitter
profiling before dedup and mixture planning).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared 60-bit portable hash
# ---------------------------------------------------------------------------

#: 2^52 — the low-bit window HLL ranks scan (60-bit hash minus 8 register bits)
_POW52 = 1 << 52
#: 2^53 — rank-0 term weight; max term of the HLL harmonic sum
_POW53 = 1 << 53
#: 2^60 — the h60 hash range
POW60 = 1 << 60


def h60(col: Column) -> Column:
    """60-bit integer hash: first 15 md5 hex digits (exact in BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB twin of :func:`h60`."""
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# HyperLogLog (p=8 → m=256 registers)
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256
#: Flajolet et al. bias constant α_m for m ≥ 128: 0.7213 / (1 + 1.079/m).
#: Computed once and embedded as the SAME double literal in both engines.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

#: max rank: 52 scannable low bits all zero → rank 53
_MAX_RANK = 53


def hll_register(h: Column) -> Column:
    """Register index = top 8 bits of the 60-bit hash (shift, not double
    division — h exceeds 2^53 so float division would lose bits)."""
    return F.shiftright(h, 60 - HLL_P)


def hll_rank(h: Column) -> Column:
    """Leading-zero rank of the low 52 bits, in [1, 53].

    bit_length(w) via the minimal base-2 string (Spark ``conv`` and
    DuckDB ``bin`` both emit no leading zeros) — integer-exact, no
    floating log2 near power-of-two boundaries.
    """
    w = h % F.lit(_POW52)
    bitlen = F.length(F.conv(w, 10, 2))
    return F.when(w == 0, F.lit(_MAX_RANK)).otherwise(F.lit(_MAX_RANK) - bitlen)


def hll_register_sql(hexpr: str) -> str:
    return f"(({hexpr}) // {1 << (60 - HLL_P)})"


def hll_rank_sql(hexpr: str) -> str:
    return (
        f"(CASE WHEN ({hexpr}) % {_POW52} = 0 THEN {_MAX_RANK} "
        f"ELSE {_MAX_RANK} - length(bin(({hexpr}) % {_POW52})) END)"
    )


def hll_finalize(s_present: Column, n_present: Column) -> Column:
    """Final HLL estimate (double, rounded to 6 decimals for cross-engine
    hash stability of the single ``ln`` in the linear-counting branch).

    Inputs are the two aggregates callers compute over a per-(group,
    register) max-rank table: ``s_present`` = Σ 2^(53-M_j) as an exact
    BIGINT (each term ≤ 2^53, ≤ 256 terms < 2^62 — float summation
    order never enters, so the estimate is deterministic under any
    partitioning) and ``n_present`` = register count; missing registers
    contribute 2^53 each (rank 0).  Small-range (linear-counting)
    correction applied below 2.5·m when empty registers remain, per the
    HLL paper."""
    zeros = F.lit(HLL_M) - n_present
    s_total = s_present + zeros.cast("long") * F.lit(_POW53)
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(_POW53)) / s_total.cast("double")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    return F.round(
        F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), lc).otherwise(raw), 6
    )


def hll_finalize_sql(s_present: str, n_present: str) -> str:
    zeros = f"({HLL_M} - {n_present})"
    s_total = f"({s_present} + {zeros} * {_POW53})"
    raw = f"({HLL_ALPHA * HLL_M * HLL_M * float(_POW53)!r} / CAST({s_total} AS DOUBLE))"
    lc = f"({float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({zeros} AS DOUBLE)))"
    return (
        f"round(CASE WHEN {raw} <= {2.5 * HLL_M!r} AND {zeros} > 0 "
        f"THEN {lc} ELSE {raw} END, 6)"
    )


# ---------------------------------------------------------------------------
# HLL as ONE aggregation: 2^p conditional register maxes.
#
# The register table above needs two grouped aggregations (per-register
# max, then per-group finalize) — fine in batch, illegal in Structured
# Streaming (single-aggregation rule).  This formulation folds the whole
# sketch into one groupBy: state = 2^p small ints per group, exactly an
# HLL's memory contract, so the SAME builder runs batch and streaming
# (streaming/windows.tumbling_hll_users).  Practical for small p (the
# expression tree is 2^p aggregates wide); the two-pass register table
# stays the path for large m.
# ---------------------------------------------------------------------------

#: Flajolet bias constants for small register counts
_HLL_ALPHAS = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    return _HLL_ALPHAS.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_agg_exprs(h: Column, p: int, prefix: str = "r") -> list[Column]:
    """One conditional MAX(rank) aggregate per register
    ({prefix}0..{prefix}{2^p-1}); ``prefix`` lets several sketches
    (e.g. one per profiled column) share a single wide aggregation."""
    m = 1 << p
    low = 60 - p
    max_rank = low + 1
    reg = F.shiftright(h, low)
    w = h % F.lit(1 << low)
    bitlen = F.length(F.conv(w, 10, 2))
    rank = F.when(w == 0, F.lit(max_rank)).otherwise(F.lit(max_rank) - bitlen)
    return [
        F.max(F.when(reg == j, rank)).alias(f"{prefix}{j}") for j in range(m)
    ]


def hll_agg_finalize(p: int, prefix: str = "r") -> Column:
    """Estimate from the {prefix}0..{prefix}{2^p-1} columns (NULL
    register = empty).  Same exact-integer harmonic sum (scaled
    2^(low+1)) and linear-counting correction as the two-pass form;
    rounded to 6 decimals."""
    m = 1 << p
    max_rank = 60 - p + 1
    term0 = 1 << max_rank
    s: Column = F.lit(0).cast("long")
    zeros: Column = F.lit(0)
    for j in range(m):
        r = F.col(f"{prefix}{j}")
        s = s + F.coalesce(
            F.pow(F.lit(2.0), F.lit(max_rank) - r).cast("long"), F.lit(term0)
        )
        zeros = zeros + F.when(r.isNull(), 1).otherwise(0)
    raw = F.lit(hll_alpha(m) * m * m * float(term0)) / s.cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.round(
        F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw), 6
    )


def hll_agg_exprs_sql(hexpr: str, p: int) -> list[str]:
    """DuckDB twins of :func:`hll_agg_exprs` (aliases r0..r{2^p-1})."""
    m = 1 << p
    low = 60 - p
    max_rank = low + 1
    rank = (
        f"(CASE WHEN ({hexpr}) % {1 << low} = 0 THEN {max_rank} "
        f"ELSE {max_rank} - length(bin(({hexpr}) % {1 << low})) END)"
    )
    reg = f"(({hexpr}) // {1 << low})"
    return [
        f"MAX(CASE WHEN {reg} = {j} THEN {rank} END) AS r{j}" for j in range(m)
    ]


def hll_agg_finalize_sql(p: int) -> str:
    m = 1 << p
    max_rank = 60 - p + 1
    term0 = 1 << max_rank
    s = " + ".join(
        f"COALESCE(CAST(pow(2.0, {max_rank} - r{j}) AS BIGINT), {term0})"
        for j in range(m)
    )
    zeros = " + ".join(
        f"(CASE WHEN r{j} IS NULL THEN 1 ELSE 0 END)" for j in range(m)
    )
    raw = f"({hll_alpha(m) * m * m * float(term0)!r} / CAST(({s}) AS DOUBLE))"
    lc = f"({float(m)!r} * ln({float(m)!r} / CAST(({zeros}) AS DOUBLE)))"
    return (
        f"round(CASE WHEN {raw} <= {2.5 * m!r} AND ({zeros}) > 0 "
        f"THEN {lc} ELSE {raw} END, 6)"
    )


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct sketch
# ---------------------------------------------------------------------------

KMV_K = 64


def kmv_estimate(kth: Column, n: Column) -> Column:
    """(k-1)·2^60 / h_(k) when the sketch is full, else the exact count
    (fewer than k distinct hashes seen = the sketch IS the distinct set).
    2^60 is a power of two — exact as a double scale factor."""
    return F.round(
        F.when(
            n >= KMV_K,
            F.lit(float(KMV_K - 1)) * F.lit(float(POW60)) / kth.cast("double"),
        ).otherwise(n.cast("double")),
        6,
    )


def kmv_estimate_sql(kth: str, n: str) -> str:
    return (
        f"round(CASE WHEN {n} >= {KMV_K} THEN "
        f"{float(KMV_K - 1)!r} * {float(POW60)!r} / CAST({kth} AS DOUBLE) "
        f"ELSE CAST({n} AS DOUBLE) END, 6)"
    )


# ---------------------------------------------------------------------------
# Bloom filter (1024 bits = 16 words × 64, k = 3)
#
# The runtime-filter pattern made portable: aggregate a small key set
# into a fixed-size bitmap (ONE row — 16 BIGINT words via conditional
# BIT_OR), broadcast it, and pre-filter a fact scan with pure bit
# arithmetic before any join.  At 100 TB this is the difference between
# shuffling the fact table for a semi-join and a scan-local filter that
# drops most rows at the source.  Hashes are the md5-derived universal
# family, so membership — including FALSE POSITIVES — is deterministic
# and identical in DuckDB.
# ---------------------------------------------------------------------------

#: 63 usable bits per word — DuckDB raises on ``1::BIGINT << 63``
#: (signed overflow), so the sign bit is simply never used and every
#: word value stays positive in both engines
_BITS_PER_WORD = 63
BLOOM_WORDS = 16
BLOOM_BITS = BLOOM_WORDS * _BITS_PER_WORD  # 1008
BLOOM_K = 3


def bloom_positions(h32_col: Column, seed: int = 77) -> list[Column]:
    """k bit positions in [0, BLOOM_BITS) for a key's 32-bit hash."""
    rng = random.Random(seed)
    out = []
    for _ in range(BLOOM_K):
        a, b = rng.randrange(1, 1 << 20) | 1, rng.randrange(1 << 20)
        out.append((F.lit(a) * h32_col + F.lit(b)) % F.lit(_CMS_PRIME) % F.lit(BLOOM_BITS))
    return out


def bloom_positions_sql(h32_expr: str, seed: int = 77) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(BLOOM_K):
        a, b = rng.randrange(1, 1 << 20) | 1, rng.randrange(1 << 20)
        out.append(f"((({a} * {h32_expr} + {b}) % {_CMS_PRIME}) % {BLOOM_BITS})")
    return out


def bloom_build_aggs(pos_name: str = "pos") -> list[Column]:
    """Conditional BIT_OR per word over an exploded (key, position) set →
    columns bw0..bw{15}; every word stays positive (63 bits used).
    ``pos_name`` must be a real column (Spark's shiftleft Column API
    takes only literal shift amounts, so the dynamic shift is SQL)."""
    b = _BITS_PER_WORD
    one_shifted = F.expr(
        f"shiftleft(cast(1 as bigint), cast({pos_name} % {b} as int))"
    )
    return [
        F.bit_or(
            F.when(F.expr(f"{pos_name} div {b}") == w, one_shifted)
            .otherwise(F.lit(0).cast("long"))
        ).alias(f"bw{w}")
        for w in range(BLOOM_WORDS)
    ]


def bloom_test_expr(pos_name: str) -> str:
    """Spark-SQL expression: 1 iff the bit at column ``pos_name`` is set
    in the broadcast bw0..bw15 row (use inside F.expr after the
    cross-join; dynamic shifts require the SQL surface)."""
    b = _BITS_PER_WORD
    word = "CASE " + " ".join(
        f"WHEN ({pos_name} div {b}) = {w} THEN bw{w}" for w in range(BLOOM_WORDS)
    ) + " END"
    return f"(shiftright({word}, cast({pos_name} % {b} as int)) & 1)"


def bloom_build_aggs_sql(pos_expr: str) -> list[str]:
    b = _BITS_PER_WORD
    return [
        f"BIT_OR(CASE WHEN ({pos_expr}) // {b} = {w} "
        f"THEN (1::BIGINT << (({pos_expr}) % {b})) ELSE 0::BIGINT END) AS bw{w}"
        for w in range(BLOOM_WORDS)
    ]


def bloom_test_sql(pos_expr: str) -> str:
    b = _BITS_PER_WORD
    word = "CASE " + " ".join(
        f"WHEN ({pos_expr}) // {b} = {w} THEN bw{w}" for w in range(BLOOM_WORDS)
    ) + " END"
    return f"((({word}) >> (({pos_expr}) % {b})) & 1)"


# ---------------------------------------------------------------------------
# Count-min sketch (depth 4 × width 1024)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
#: prime just under 2^20 for the universal-hash mod chain
_CMS_PRIME = 1048573


def cms_constants(seed: int = 2024) -> list[tuple[int, int]]:
    """Per-depth (a, b): a odd < 2^20 so a·h32 < 2^52 stays exact."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 20) | 1, rng.randrange(1 << 20))
        for _ in range(CMS_DEPTH)
    ]


def h32(col: Column) -> Column:
    """32-bit md5-derived hash (same scheme as queries/shards.hash32)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT"


def cms_bucket(h32_col: Column, a: int, b: int) -> Column:
    return (F.lit(a) * h32_col + F.lit(b)) % F.lit(_CMS_PRIME) % F.lit(CMS_WIDTH)


def cms_bucket_sql(h32_expr: str, a: int, b: int) -> str:
    return f"((({a} * {h32_expr} + {b}) % {_CMS_PRIME}) % {CMS_WIDTH})"


def cms_counters(df: DataFrame, key: str) -> DataFrame:
    """(depth j, bucket, cnt) counter grid — ≤ 4·1024 rows regardless of
    input size; built with ONE map-side-combinable aggregation over a
    4-way posexplode (each input row contributes to one bucket per
    depth, exactly the streaming update rule)."""
    h = h32(F.col(key))
    buckets = F.array(*[cms_bucket(h, a, b) for a, b in cms_constants()])
    return (
        df.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Bottom-k-by-hash prefilter: the shared definition of the cutoff trick
# (doc_stratified_sample discipline) used by every bottom-k sketch —
# per-group KMV/theta containment (queries/curation.py::overlap_kmv)
# and the quantile sketch (queries/sketches.py).  The cutoff is PART OF
# THE SKETCH DEFINITION: bottom-k of a uniform 60-bit hash lies below
# ~safety·k/n of the range, so the per-group sort that follows sees
# O(k) rows at any corpus size.  Mirror with :func:`bottomk_cutoff_sql`
# so both engines share one derivation.
# ---------------------------------------------------------------------------


def bottomk_prefilter(
    df: DataFrame, group_col: str, k: int, safety: int, h_col: str = "h"
) -> tuple[DataFrame, DataFrame]:
    """(prefiltered rows, per-group counts): keep rows of ``df`` whose
    ``h_col`` lies below the count-derived integer cutoff
    ``(2^60 div n) · safety·k`` (everything when n ≤ safety·k) —
    all-bigint arithmetic, tie-free to mirror."""
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    cutoff = F.when(
        F.col("n") <= safety * k, F.lit(POW60).cast("long")
    ).otherwise(F.expr(f"({POW60}L div n) * {safety * k}L"))
    pref = df.join(F.broadcast(n), group_col).filter(F.col(h_col) < cutoff)
    return pref, n


def bottomk_cutoff_sql(n_expr: str, k: int, safety: int) -> str:
    """DuckDB twin of :func:`bottomk_prefilter`'s cutoff expression."""
    return (
        f"CASE WHEN {n_expr} <= {safety * k} THEN {POW60} "
        f"ELSE ({POW60} // {n_expr}) * {safety * k} END"
    )
