#!/usr/bin/env python
"""sf1 (10× bench-SF) scaling evidence for the top bench headliners
(VERDICT_r9 #2).

SCALING.md's per-query walls top out at the driver's sf0.1 tables
(600 k lineitem rows / 5 k docs); the "linear by construction" claims
for the most expensive headliners deserve a measured 10×-growth point.
The driver ships no sf1 fixture, so this tool GENERATES one — seeded,
distribution-matched to the sf0.1 tables it extrapolates (never
modifying /root/testdata):

* ``lineitem`` — 1.5 M orders with zero-truncated-Poisson basket sizes
  fitted to the sf0.1 empirical histogram, part keys uniform over a
  10×-wider key space (the part-count-per-SF rule of the driver
  tables), dates/numerics/flags matched to the sf0.1 marginals.  Only
  the (l_orderkey, l_partkey) structure matters to the co-purchase
  graph headliner; the rest keeps the table honest for scans.
* ``documents`` — 50 k docs sampled from the sf0.1 corpus's OWN
  word-frequency table (same closed vocabulary, same Zipf weights,
  empirical words-per-doc distribution, per-source/lang shares) with
  exact duplicates planted at the measured sf0.1 rate.  This matches
  the shingle/n-gram statistics the dedup + LM headliners are
  sensitive to, instead of naively replicating rows (which would
  plant a 10-clique of artificial near-dups on every doc and turn the
  candidate-verify stage into a different workload).

Then each headliner runs COLD (fresh stage-cache-off session) at
sf0.1 and sf1, wall time and the physical plan's Exchange count are
recorded, and a SCALING.md section is appended.  Pass/fail lens:
wall growth ≤ ~10× at 10× data and an UNCHANGED exchange count (a new
Exchange at scale = a plan that re-shapes with data volume — the
100 TB red flag the verdict asks this evidence to rule out).

Run: python tools/sf1_scaling.py            (~10 min)
     python tools/sf1_scaling.py --gen-only (just build /tmp fixture)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1_DIR = "/tmp/spark-graft-sf1"
SEED = 20260816

#: headliners to measure (the 5 most expensive per VERDICT_r9) and the
#: tables each needs in the generated dir
HEADLINERS = [
    "substring_dedup_summary",
    "neardup_dedup_summary",
    "part_copurchase_communities",
    "source_distinct_ngrams",
    "doc_lm_perplexity",
]


# ---------------------------------------------------------------- generate
def _gen_lineitem(con, rng) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    hist = dict(
        con.execute(
            f"""SELECT c, COUNT(*) FROM (
                 SELECT COUNT(*) AS c FROM '{SF01}/lineitem.parquet'
                 GROUP BY l_orderkey) GROUP BY 1"""
        ).fetchall()
    )
    sizes = np.array(sorted(hist))
    probs = np.array([hist[s] for s in sizes], dtype=float)
    probs /= probs.sum()
    n_orders = 1_500_000
    n_parts = 200_000
    basket = rng.choice(sizes, size=n_orders, p=probs)
    n_rows = int(basket.sum())
    orderkey = np.repeat(np.arange(n_orders, dtype=np.int64), basket)
    linenumber = np.concatenate([np.arange(1, b + 1) for b in basket]).astype(
        np.int32
    )
    lo, hi = con.execute(
        f"SELECT MIN(l_shipdate), MAX(l_shipdate) FROM '{SF01}/lineitem.parquet'"
    ).fetchone()
    span_days = (hi - lo).days
    flags = con.execute(
        f"""SELECT l_returnflag, l_linestatus, COUNT(*)
            FROM '{SF01}/lineitem.parquet' GROUP BY 1, 2"""
    ).fetchall()
    fprobs = np.array([c for _, _, c in flags], dtype=float)
    fprobs /= fprobs.sum()
    fidx = rng.choice(len(flags), size=n_rows, p=fprobs)
    qty = rng.integers(1, 51, size=n_rows).astype(float)
    price = np.round(900.0 + rng.random(n_rows) * 104100.0, 2)
    tbl = pa.table(
        {
            "l_orderkey": orderkey,
            "l_partkey": rng.integers(0, n_parts, size=n_rows),
            "l_suppkey": rng.integers(0, 10_000, size=n_rows),
            "l_linenumber": linenumber,
            "l_quantity": qty,
            "l_extendedprice": price,
            "l_discount": np.round(rng.integers(0, 11, size=n_rows) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, size=n_rows) / 100.0, 2),
            "l_returnflag": pa.array(
                [flags[i][0] for i in fidx], type=pa.string()
            ),
            "l_linestatus": pa.array(
                [flags[i][1] for i in fidx], type=pa.string()
            ),
            "l_shipdate": pa.array(
                np.datetime64(lo, "D")
                + rng.integers(0, span_days + 1, size=n_rows).astype(
                    "timedelta64[D]"
                ),
                type=pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(SF1_DIR, "lineitem.parquet"))
    print(f"  lineitem: {n_rows:,} rows / {n_orders:,} orders")


def _gen_documents(con, rng) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab_rows = con.execute(
        f"""SELECT w, COUNT(*) AS c FROM (
             SELECT UNNEST(string_split(text, ' ')) AS w
             FROM '{SF01}/documents.parquet') GROUP BY 1 ORDER BY c DESC"""
    ).fetchall()
    words = np.array([w for w, _ in vocab_rows])
    wprobs = np.array([c for _, c in vocab_rows], dtype=float)
    wprobs /= wprobs.sum()
    wc_rows = con.execute(
        f"""SELECT LEN(string_split(text, ' ')) AS n, COUNT(*)
            FROM '{SF01}/documents.parquet' GROUP BY 1"""
    ).fetchall()
    wcs = np.array([n for n, _ in wc_rows])
    wcp = np.array([c for _, c in wc_rows], dtype=float)
    wcp /= wcp.sum()
    langs = con.execute(
        f"SELECT lang, COUNT(*) FROM '{SF01}/documents.parquet' GROUP BY 1"
    ).fetchall()
    lprobs = np.array([c for _, c in langs], dtype=float)
    lprobs /= lprobs.sum()
    n_total, n_distinct = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT text) FROM '{SF01}/documents.parquet'"
    ).fetchone()
    dup_rate = 1.0 - n_distinct / n_total

    n_docs = 50_000
    n_sources = 20
    counts = rng.choice(wcs, size=n_docs, p=wcp)
    texts: list[str] = []
    for i in range(n_docs):
        if texts and rng.random() < dup_rate:
            texts.append(texts[int(rng.integers(0, len(texts)))])
        else:
            texts.append(
                " ".join(rng.choice(words, size=int(counts[i]), p=wprobs))
            )
    lidx = rng.choice(len(langs), size=n_docs, p=lprobs)
    tbl = pa.table(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([langs[i][0] for i in lidx], type=pa.string()),
            "source": pa.array(
                [f"src{int(i) % n_sources}" for i in np.arange(n_docs)],
                type=pa.string(),
            ),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, os.path.join(SF1_DIR, "documents.parquet"))
    print(f"  documents: {n_docs:,} docs, planted dup rate {dup_rate:.4f}")


def generate() -> None:
    import duckdb

    marker = os.path.join(SF1_DIR, "_DONE")
    if os.path.exists(marker):
        print(f"sf1 fixture already at {SF1_DIR}")
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(SEED)
    print(f"generating sf1 fixture at {SF1_DIR} (seed {SEED})")
    _gen_lineitem(con, rng)
    _gen_documents(con, rng)
    with open(marker, "w") as f:
        f.write(f"seed={SEED}\n")


# ----------------------------------------------------------------- measure
def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange ")


def measure() -> list[dict]:
    from bigdatamlteamrepo_spark import get_spark
    from bigdatamlteamrepo_spark.queries.registry import QUERIES

    rows = []
    for name in HEADLINERS:
        fn = QUERIES[name]
        rec = {"query": name}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1_DIR)):
            spark = get_spark(app_name=f"sf1-scaling-{name}-{label}")
            spark.sparkContext.setLogLevel("ERROR")
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            wall = time.time() - t0
            rec[label] = wall
            rec[f"{label}_rows"] = n
            rec[f"{label}_exchanges"] = _exchanges(fn(spark, sf_dir))
            spark.stop()
            print(
                f"  {name} @ {label}: {wall:6.1f}s, {n} rows, "
                f"{rec[f'{label}_exchanges']} exchanges"
            )
        rec["growth"] = rec["sf1"] / rec["sf0.1"]
        rows.append(rec)
    return rows


def append_scaling_md(rows: list[dict]) -> None:
    lines = [
        "",
        "## sf1 (10× bench SF) walls for the top-5 headliners (round 10)",
        "",
        "Generated sf1 fixture (`tools/sf1_scaling.py`: 6 M lineitem rows /",
        "1.5 M orders / 50 k docs, distribution-matched to sf0.1 — fitted",
        "basket-size histogram, same closed vocabulary + Zipf weights, exact",
        "dups planted at the measured rate).  Each cell is a COLD run in its",
        "own session, stage cache off.  `Δexch` compares the physical plan's",
        "Exchange count at the two SFs — 0 means the plan shape is",
        "data-size-invariant (no re-shaping at scale).",
        "",
        "| query | sf0.1 wall | sf1 wall | growth at 10× data | Δexch |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['query']} | {r['sf0.1']:.1f} s | {r['sf1']:.1f} s "
            f"| {r['growth']:.1f}× | "
            f"{r['sf1_exchanges'] - r['sf0.1_exchanges']:+d} |"
        )
    lines.append("")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    with open(path, "a") as f:
        f.write("\n".join(lines))
    print("appended sf1 section to SCALING.md")


def main() -> None:
    generate()
    if "--gen-only" in sys.argv:
        return
    rows = measure()
    append_scaling_md(rows)


if __name__ == "__main__":
    main()
