"""Poisson bootstrap: multiplicity law (mean ≈ 1, matches the embedded
CDF thresholds), SE agreement with the analytic sd/sqrt(n) on a
synthetic sample, exact point-estimate arithmetic, and partitioning
invariance of the deterministic resample."""

from __future__ import annotations

import hashlib
import math
import statistics

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.queries.bootstrap import (
    MICRO,
    N_REPLICATES,
    _THRESHOLDS,
    poisson_bootstrap_means,
)


def _py_mult(rid: str, b: int) -> int:
    # replicate b reads the (b % 4)-th 8-hex slice of md5(rid:b//4)
    d = hashlib.md5(f"{rid}:{b // 4}".encode()).hexdigest()
    h = int(d[8 * (b % 4): 8 * (b % 4) + 8], 16)
    return sum(h >= t for t in _THRESHOLDS)


def test_thresholds_are_the_poisson1_cdf():
    cdf = 0.0
    for k, t in enumerate(_THRESHOLDS):
        cdf += math.exp(-1.0) / math.factorial(k)
        assert t == math.floor(cdf * 2**32)
    assert _THRESHOLDS == sorted(_THRESHOLDS)


def test_multiplicity_mean_is_one():
    """E[m] = 1 for Poisson(1); the hash-derived multiplicities must
    land near it (10k draws → SE ≈ 0.01)."""
    ms = [_py_mult(str(i), b) for i in range(500) for b in range(20)]
    assert abs(statistics.mean(ms) - 1.0) < 0.04
    assert max(ms) <= len(_THRESHOLDS)


def _sample_df(spark, n=400):
    # deterministic synthetic sample: v_i = 1000 + (i*37 % 100) micro-ish
    rows = [(i, "g", (1000 + (i * 37) % 100) * MICRO) for i in range(n)]
    return spark.createDataFrame(rows, "rid bigint, grp string, v bigint")


def test_replicate_means_match_python(spark):
    df = _sample_df(spark, n=120)
    got = {
        (r["grp"], r["b"]): r["mean_b"]
        for r in poisson_bootstrap_means(
            df, "grp", "rid", "v", n_replicates=8
        ).collect()
    }
    vals = {i: (1000 + (i * 37) % 100) * MICRO for i in range(120)}
    for b in range(8):
        s1 = sum(_py_mult(str(i), b) * v for i, v in vals.items())
        s0 = sum(_py_mult(str(i), b) for i in vals)
        assert got[("g", b)] == (2 * s1 + s0) // (2 * s0)


def test_bootstrap_se_tracks_analytic_se(spark):
    """For an i.i.d.-ish sample the bootstrap SE must sit near the
    analytic sd/sqrt(n) — the whole point of the method."""
    df = _sample_df(spark, n=400)
    reps = [
        r["mean_b"]
        for r in poisson_bootstrap_means(df, "grp", "rid", "v").collect()
    ]
    assert len(reps) == N_REPLICATES
    boot_se = statistics.stdev(reps)
    vals = [(1000 + (i * 37) % 100) * MICRO for i in range(400)]
    analytic_se = statistics.pstdev(vals) / math.sqrt(len(vals))
    assert 0.6 * analytic_se < boot_se < 1.6 * analytic_se


def test_resample_is_partitioning_invariant(spark):
    df = _sample_df(spark, n=200)
    a = sorted(
        tuple(r) for r in poisson_bootstrap_means(df, "grp", "rid", "v").collect()
    )
    b = sorted(
        tuple(r)
        for r in poisson_bootstrap_means(
            df.repartition(13, F.col("rid")), "grp", "rid", "v"
        ).collect()
    )
    assert a == b


def test_registered_face_point_estimate(spark, sf_dir):
    """mean_micro must be the exact half-away mean of the quantized
    values — independent of anything bootstrap."""
    from bigdatamlteamrepo_spark.catalog import load_table
    from bigdatamlteamrepo_spark.queries.bootstrap import events_bootstrap_ci

    out = {r["event_type"]: r for r in events_bootstrap_ci(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.expr(f"CAST(round(value * {MICRO}) AS BIGINT)").alias("v"))
        .groupBy("event_type")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in ev:
        exp_mean = (2 * r["s"] + r["n"]) // (2 * r["n"])
        got = out[r["event_type"]]
        assert got["mean_micro"] == exp_mean
        assert got["n_events"] == r["n"]
        assert got["rep_min_micro"] <= exp_mean <= got["rep_max_micro"]
        assert got["boot_se_micro"] > 0


# --------------------------------------------------------------------------
# Neyman allocation
# --------------------------------------------------------------------------


def test_neyman_budget_exact_and_oversamples_variance(spark, sf_dir):
    from bigdatamlteamrepo_spark.queries.bootstrap import (
        NEYMAN_BUDGET,
        events_neyman_allocation,
    )

    rows = events_neyman_allocation(spark, sf_dir).collect()
    assert sum(r["neyman_n"] for r in rows) == NEYMAN_BUDGET
    assert sum(r["proportional_n"] for r in rows) == NEYMAN_BUDGET
    for r in rows:
        assert r["neyman_n"] >= 0 and r["sd_micro"] > 0
    # Neyman vs proportional must differ exactly where sd_h deviates
    # from the population-average sd: strata with above-average spread
    # gain seats, below-average lose them
    tot_nw = sum(r["n_rows"] * r["sd_micro"] for r in rows)
    tot_n = sum(r["n_rows"] for r in rows)
    for r in rows:
        exact_neyman = NEYMAN_BUDGET * r["n_rows"] * r["sd_micro"] / tot_nw
        exact_prop = NEYMAN_BUDGET * r["n_rows"] / tot_n
        assert abs(r["neyman_n"] - exact_neyman) < 1
        assert abs(r["proportional_n"] - exact_prop) < 1


def test_largest_remainder_is_deterministic_python_replica(spark):
    """Seat-for-seat agreement with a pure-Python Hamilton
    apportionment over a hand stratification (ties included)."""
    from bigdatamlteamrepo_spark.queries.bootstrap import (
        MICRO,
        events_neyman_allocation,
    )
    import bigdatamlteamrepo_spark.queries.bootstrap as bm

    rows = [
        # (event_type, value): stratum A tight around 10, B wide, C tiny
        *((i, "A", 10.0 + (i % 3) * 0.01) for i in range(300)),
        *((1000 + i, "B", 10.0 + (i % 7) * 5.0) for i in range(100)),
        *((2000 + i, "C", 50.0 + (i % 2) * 0.5) for i in range(20)),
    ]
    df = spark.createDataFrame(
        [(i, t, v) for i, t, v in rows],
        "event_id bigint, event_type string, value double",
    )
    orig = bm.load_table
    bm.load_table = lambda *_a, **_k: df
    try:
        got = {
            r["event_type"]: (r["neyman_n"], r["proportional_n"])
            for r in events_neyman_allocation(spark, "ignored").collect()
        }
    finally:
        bm.load_table = orig

    # python replica
    import math as _m
    from collections import defaultdict

    vals = defaultdict(list)
    for _, t, v in rows:
        vals[t].append(round(v * MICRO))

    def sd_micro(vs):
        n = len(vs)
        s1, s2 = sum(vs), sum(v * v for v in vs)
        return round(_m.sqrt((n * s2 - float(s1) * s1) / (n * n)))

    B = bm.NEYMAN_BUDGET
    nw = {t: len(vs) * sd_micro(vs) for t, vs in vals.items()}
    tot = sum(nw.values())
    base = {t: B * w // tot for t, w in nw.items()}
    rem = {t: B * w % tot for t, w in nw.items()}
    left = B - sum(base.values())
    for t in sorted(rem, key=lambda t: (-rem[t], t))[:left]:
        base[t] += 1
    assert {t: got[t][0] for t in got} == base
    # wide-spread B must be oversampled vs its share; tight A under
    assert got["B"][0] > got["B"][1]
    assert got["A"][0] < got["A"][1]


def test_hex_threshold_compare_equals_numeric():
    """r13 rewrite pin: comparing the 8-hex md5 slice AS A STRING
    against hex-formatted thresholds decides exactly what the numeric
    conv() comparison did — fixed-width lowercase hex is
    order-isomorphic to the 32-bit value.  Checked at every threshold
    boundary (T-1, T, T+1) and the domain edges."""
    from bigdatamlteamrepo_spark.queries.bootstrap import _THRESHOLDS

    probes = {0, 2**32 - 1}
    for t in _THRESHOLDS:
        probes |= {max(0, t - 1), t, min(2**32 - 1, t + 1)}
    for h in sorted(probes):
        hs = f"{h:08x}"
        for t in _THRESHOLDS:
            assert (hs >= f"{t:08x}") == (h >= t), (h, t)
