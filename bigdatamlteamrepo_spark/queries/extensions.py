"""Extension-tier queries: SimHash dedup, embedding near-dup (exact and
LSH), ANN (approximate similarity search).

Near-dup tier design (the 100 TB story):

* ``embedding_neardup_pairs`` — EXACT cosine ≥ t semantics, implemented
  with KMeans-cell blocking + triangle-inequality block pruning
  (operators/dedup.py).  The pruning is provably lossless, so the oracle
  is the plain exact SQL and hash-matches regardless of clustering.
* ``embedding_neardup_lsh`` — the approximate path: RP-LSH banded
  candidates + exact cosine verify.  The hyperplanes are literal
  constants embedded in BOTH the Spark plan and the DuckDB oracle, so
  even this LSH query is hash-checked end to end.  Config (4 planes ×
  16 bands) has measured recall 1.0 vs the exact baseline at the
  driver's sf0.01 (tests/test_ann_dedup.py pins recall bounds).
* ``simhash_neardup_pairs`` — 64-bit md5-derived SimHash, 4×16-bit
  bands (complete for Hamming ≤ 3), oracle-checked via the same
  portable bit derivation.

ANN: the single-sketch RP-LSH top-k is fully hash-checked (literal
hyperplanes in both engines, cosine re-rank bit-exact); banded/
multi-probe/IVF variants are rows-only with recall-vs-exact asserted
in pytest on planted-cluster fixtures (IVF's quantizer is engine-side
MLlib KMeans, so no SQL twin exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.catalog import load_table
from bigdatamlteamrepo_spark.functions.vectors import cosine_similarity, dot_expr, norm_expr
from bigdatamlteamrepo_spark.operators.dedup import (
    embedding_neardup_pairs as _emb_pairs,
    simhash_neardup_pairs as _simhash_pairs,
)
from bigdatamlteamrepo_spark.operators.similarity import (
    hyperplane_values,
    ivf_topk,
    rp_band_candidate_pairs,
    rp_lsh_topk,
)
from bigdatamlteamrepo_spark.queries.registry import query

_NEARDUP_THRESHOLD = 0.35
_LSH_THRESHOLD = 0.45
_LSH_DIM = 64
_LSH_PLANES_PER_BAND = 4
_LSH_N_BANDS = 16
_LSH_SEED = 42

_COS = (
    f"({dot_expr('a.embedding', 'b.embedding')} / "
    f"({norm_expr('a.embedding')} * {norm_expr('b.embedding')}))"
)


@query(
    "embedding_neardup_pairs",
    oracle=f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS} >= {_NEARDUP_THRESHOLD}
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact threshold pairs; cell-blocked plan with quantile radii +
    outlier spill tier, brute-force oracle — the triangle-inequality
    pruning is lossless so both agree.  n_cells auto-scales with the
    corpus (16 at driver SFs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _emb_pairs(emb, threshold=_NEARDUP_THRESHOLD)


@query(
    "embedding_semdedup_summary",
    oracle=f"""
WITH RECURSIVE
__pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_COS} >= {_NEARDUP_THRESHOLD}
),
__edges AS (
  SELECT id_a AS src, id_b AS dst FROM __pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM __pairs
),
__reach AS (
  SELECT src, dst FROM __edges
  UNION
  SELECT r.src, e.dst FROM __reach r JOIN __edges e ON r.dst = e.src
),
__rep AS (
  SELECT src AS vec_id, LEAST(src, MIN(dst)) AS rep FROM __reach GROUP BY src
),
__m AS (
  SELECT emb.label, emb.vec_id, COALESCE(r.rep, emb.vec_id) AS rep
  FROM embeddings emb LEFT JOIN __rep r ON r.vec_id = emb.vec_id
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN vec_id = rep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN vec_id <> rep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM __m GROUP BY label
""",
)
def embedding_semdedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup capstone (SemDeDup, Abbas et al. 2023, made
    EXACT): vectors connected by cosine ≥ threshold form a semantic
    cluster; the min vec_id survives; per-label report of kept/removed.
    Abbas et al. approximate the pair search with k-means cells and
    within-cell pairs only — this engine's blocked pair operator
    (operators/dedup.py) IS that cell structure made lossless (quantile
    radii + spill tier), so the exact variant costs the same plan shape
    and the recursive oracle can verify it end-to-end.  Composes the
    same star-contraction components as the text dedup capstone —
    dedup semantics identical across modalities.

    Wall-clock honesty: the synthetic driver corpus is near-UNIFORM on
    the sphere, the adversarial case where no lossless blocking can
    prune (operators/dedup.py docstring) — at sf0.1 this query is an
    honest ~n²/2-comparison verify (~41 s local), which is why it is
    window-registered for correctness but not a bench headliner; on
    clustered real-world embeddings the same plan prunes most of the
    grid, and the approximate path (embedding_neardup_lsh) is the
    recall-tunable alternative either way."""
    from bigdatamlteamrepo_spark.operators.dedup import semdedup_label_rollup
    from bigdatamlteamrepo_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = _emb_pairs(emb, threshold=_NEARDUP_THRESHOLD).select("id_a", "id_b")
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return semdedup_label_rollup(emb.select("vec_id", "label"), comp)


#: coarse-quantizer size for the ANN SemDeDup variant: first-16 corpus
#: vectors as deterministic Voronoi anchors (the ann_voronoi_topk
#: quantizer — data-defined, so the whole capstone stays oracle-paired)
_SEM_ANCHORS = 16

_SEM_ACOS = (
    f"({dot_expr('e.embedding', 'a.a_emb')} / "
    f"({norm_expr('e.embedding')} * {norm_expr('a.a_emb')}))"
)
_SEM_PCOS = (
    f"({dot_expr('a.v_emb', 'b.v_emb')} / "
    f"({norm_expr('a.v_emb')} * {norm_expr('b.v_emb')}))"
)


@query(
    "embedding_semdedup_ann_summary",
    oracle=f"""
WITH RECURSIVE
__anchors AS (
  SELECT vec_id AS cell, embedding AS a_emb FROM embeddings
  WHERE vec_id < {_SEM_ANCHORS}
),
__asim AS (
  SELECT e.vec_id, e.embedding AS v_emb, a.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY ({_SEM_ACOS}) DESC, a.cell) AS r
  FROM embeddings e CROSS JOIN __anchors a
),
__assigned AS (SELECT vec_id, v_emb, cell FROM __asim WHERE r = 1),
__pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM __assigned a JOIN __assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_SEM_PCOS} >= {_NEARDUP_THRESHOLD}
),
__edges AS (
  SELECT id_a AS src, id_b AS dst FROM __pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM __pairs
),
__reach AS (
  SELECT src, dst FROM __edges
  UNION
  SELECT r.src, e.dst FROM __reach r JOIN __edges e ON r.dst = e.src
),
__rep AS (
  SELECT src AS vec_id, LEAST(src, MIN(dst)) AS rep FROM __reach GROUP BY src
),
__m AS (
  SELECT emb.label, emb.vec_id, COALESCE(r.rep, emb.vec_id) AS rep
  FROM embeddings emb LEFT JOIN __rep r ON r.vec_id = emb.vec_id
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN vec_id = rep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN vec_id <> rep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM __m GROUP BY label
""",
)
def embedding_semdedup_ann_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup as Abbas et al. actually run it: candidate pairs are
    WITHIN-CELL pairs of a coarse quantizer (here the deterministic
    first-16-anchor Voronoi assignment of ann_voronoi_topk, so the
    whole capstone — assignment, pairs, components, rollup — stays
    oracle-paired), then exact-cosine verify → connected components →
    per-label kept/removed.

    This is the 100 TB candidate stage the EXACT capstone
    (embedding_semdedup_summary) replaces with lossless blocking: the
    pairwise cost drops from n²/2 to Σ|cell|²/2 at the price of
    missing cross-cell pairs (recall vs the exact operator pinned in
    tests/test_ann_dedup.py; n_cells is the recall/cost knob — Abbas
    et al. use 50k clusters at LAION scale).  The persisted-index
    composition (operators/pq.semdedup_from_index over
    build_ivfpq_index's cell-partitioned ``vectors/`` layout) runs the
    SAME pair stage per ``cell=`` directory, partition-pruned and
    embarrassingly parallel."""
    from bigdatamlteamrepo_spark.operators.dedup import semdedup_label_rollup
    from bigdatamlteamrepo_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = semdedup_voronoi_pairs(emb).select("id_a", "id_b")
    comp = connected_components(pairs, src="id_a", dst="id_b")
    return semdedup_label_rollup(emb.select("vec_id", "label"), comp)


def semdedup_voronoi_pairs(
    emb: DataFrame,
    n_anchors: int = _SEM_ANCHORS,
    threshold: float = _NEARDUP_THRESHOLD,
) -> DataFrame:
    """(id_a, id_b, cosine_sim) — within-Voronoi-cell cosine ≥ t pairs.

    Assignment is a broadcast cross join against the n_anchors-row
    anchor table collapsed by a max_by hash-agg (map-side combine —
    the PQ-encode discipline; no per-key window sort), mirrored in SQL
    by the equivalent top-1 window.  The pair stage joins the assigned
    corpus to itself ON CELL — the shuffle key a 100 TB run bucketing
    ``vectors/`` by cell avoids entirely."""
    anchors = emb.filter(F.col("vec_id") < n_anchors).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("a_emb")
    )
    asim = cosine_similarity(F.col("c_emb"), F.col("a_emb"))
    assigned = (
        emb.select(F.col("vec_id"), F.col("embedding").alias("c_emb"))
        .crossJoin(F.broadcast(anchors))
        .select("vec_id", "c_emb", "cell", asim.alias("a_sim"))
        .groupBy("vec_id")
        .agg(
            F.first("c_emb").alias("v_emb"),
            F.expr(
                "max_by(cell, struct(a_sim, -cell))"
            ).alias("cell"),
        )
    )
    from bigdatamlteamrepo_spark.operators.dedup import within_cell_cosine_pairs

    return within_cell_cosine_pairs(assigned, threshold, vec_col="v_emb")


@query(
    "embedding_cell_occupancy_drift",
    oracle=f"""
WITH __anchors AS (
  SELECT vec_id AS cell, embedding AS a_emb FROM embeddings
  WHERE vec_id < {_SEM_ANCHORS}
),
__asim AS (
  SELECT e.vec_id, a.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY ({_SEM_ACOS}) DESC, a.cell) AS r
  FROM embeddings e CROSS JOIN __anchors a
),
__assigned AS (
  SELECT vec_id, cell, vec_id % 2 AS grp FROM __asim WHERE r = 1
),
__per AS (
  SELECT cell,
         CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM __assigned GROUP BY cell
)
SELECT cell, n_base, n_cur,
       CAST(FLOOR(ABS(
         CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER ()
         - CAST(n_base AS DOUBLE) / SUM(n_base) OVER ()
       ) * 1000000.0) AS BIGINT) AS drift_ppm
FROM __per
""",
)
def embedding_cell_occupancy_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer-health monitor for the frozen-anchor regime
    (streaming/vectors.py freezes centroids at build time; THIS is the
    signal that says when to re-train): per Voronoi cell, baseline
    occupancy (even vec_ids) vs current occupancy (odd vec_ids) and
    the share drift in ppm.  Counts are exact integers; each share is
    ONE double division and the ppm floor is bit-identical across
    engines (the micro-quantization convention).  At 100 TB the
    occupancy counts fall out of the cell-partitioned layout's
    metadata-sized per-cell aggregation — no vector math beyond the
    one assignment scan a batch pays anyway."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _SEM_ANCHORS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("a_emb")
    )
    asim = cosine_similarity(F.col("c_emb"), F.col("a_emb"))
    assigned = (
        emb.select("vec_id", F.col("embedding").alias("c_emb"))
        .crossJoin(F.broadcast(anchors))
        .select("vec_id", "cell", asim.alias("a_sim"))
        .groupBy("vec_id")
        .agg(F.expr("max_by(cell, struct(a_sim, -cell))").alias("cell"))
        .select("cell", (F.col("vec_id") % 2).alias("grp"))
    )
    per = assigned.groupBy("cell").agg(
        F.sum((F.col("grp") == 0).cast("int")).cast("bigint").alias("n_base"),
        F.sum((F.col("grp") == 1).cast("int")).cast("bigint").alias("n_cur"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    return per.select(
        "cell",
        "n_base",
        "n_cur",
        F.floor(
            F.abs(
                F.col("n_cur").cast("double") / F.sum("n_cur").over(w)
                - F.col("n_base").cast("double") / F.sum("n_base").over(w)
            )
            * 1000000.0
        )
        .cast("bigint")
        .alias("drift_ppm"),
    )


def _rp_lsh_ctes() -> str:
    """Oracle CTE chain ending in ``__cand(id_a, id_b)`` — the DuckDB
    twin of :func:`rp_band_candidate_pairs` with identical literal
    hyperplanes (sequential-fold dots → identical sign bits)."""
    rows = []
    for p in range(_LSH_PLANES_PER_BAND * _LSH_N_BANDS):
        vals = hyperplane_values(_LSH_DIM, p, _LSH_SEED)
        lit = "[" + ", ".join(repr(v) for v in vals) + "]"
        rows.append(f"({p}, {lit}::DOUBLE[])")
    values = ",\n    ".join(rows)
    return f"""__planes(plane_id, p) AS (VALUES
    {values}),
__bits AS (
  SELECT e.vec_id, pl.plane_id,
         CASE WHEN list_sum(list_transform(range(1, {_LSH_DIM} + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM embeddings e CROSS JOIN __planes pl
),
__bands AS (
  SELECT vec_id, plane_id // {_LSH_PLANES_PER_BAND} AS band,
         string_agg(bit, '' ORDER BY plane_id) AS key
  FROM __bits GROUP BY vec_id, plane_id // {_LSH_PLANES_PER_BAND}
),
__cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM __bands a JOIN __bands b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
)"""


@query(
    "embedding_neardup_lsh",
    oracle=f"""
WITH {_rp_lsh_ctes()}
SELECT c.id_a, c.id_b, {_COS} AS cosine_sim
FROM __cand c
JOIN embeddings a ON a.vec_id = c.id_a
JOIN embeddings b ON b.vec_id = c.id_b
WHERE {_COS} >= {_LSH_THRESHOLD}
""",
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-LSH candidates + exact cosine verify (candidates-then-verify).

    Linear-shuffle banding replaces the O(n²) cross product; recall
    follows the LSH s-curve 1-(1-p^4)^16 and is measured 1.0 on the
    driver corpus at sf0.01 (see tests).  At production near-dup
    thresholds (≥0.85) the same operator prunes aggressively; at low
    thresholds on gapless data no LSH can prune — documented tradeoff.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cand = rp_band_candidate_pairs(
        emb,
        dim=_LSH_DIM,
        planes_per_band=_LSH_PLANES_PER_BAND,
        n_bands=_LSH_N_BANDS,
        seed=_LSH_SEED,
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= _LSH_THRESHOLD)
    )


def _simhash_ctes() -> str:
    """Oracle twin of operators/dedup.py:simhash_fingerprints — the same
    md5-derived 64-bit majority-vote fingerprint, bit for bit."""
    lo_votes = ",\n         ".join(
        f"SUM(CASE WHEN (w1 >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS lo{b}"
        for b in range(32)
    )
    hi_votes = ",\n         ".join(
        f"SUM(CASE WHEN (w2 >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS hi{b}"
        for b in range(32)
    )
    sh_lo = " | ".join(f"((CASE WHEN lo{b} > 0 THEN 1 ELSE 0 END)::BIGINT << {b})" for b in range(32))
    sh_hi = " | ".join(f"((CASE WHEN hi{b} > 0 THEN 1 ELSE 0 END)::BIGINT << {b})" for b in range(32))
    band_sel = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, sh_lo, sh_hi, {i} AS band_idx, {expr} AS band FROM __fp"
        for i, expr in enumerate(
            ["sh_lo & 65535", "(sh_lo >> 16) & 65535", "sh_hi & 65535", "(sh_hi >> 16) & 65535"]
        )
    )
    return f"""__toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents
),
__words AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS w1,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS w2
  FROM __toks
),
__votes AS (
  SELECT doc_id,
         {lo_votes},
         {hi_votes}
  FROM __words GROUP BY doc_id
),
__fp AS (
  SELECT doc_id, {sh_lo} AS sh_lo, {sh_hi} AS sh_hi FROM __votes
),
__sh_bands AS (
  {band_sel}
)"""


@query(
    "simhash_neardup_pairs",
    oracle=f"""
WITH {_simhash_ctes()}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh_lo, b.sh_lo)) + bit_count(xor(a.sh_hi, b.sh_hi)) AS INTEGER) AS hamming
FROM __sh_bands a JOIN __sh_bands b
  ON a.band_idx = b.band_idx AND a.band = b.band AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh_lo, b.sh_lo)) + bit_count(xor(a.sh_hi, b.sh_hi)) <= 3
""",
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs, Hamming ≤ 3 (banding-complete)."""
    docs = load_table(spark, sf_dir, "documents")
    return _simhash_pairs(docs, max_hamming=3)


def _queries_set(spark: SparkSession, sf_dir: str, n_queries: int = 5) -> DataFrame:
    """First ``n_queries`` corpus vectors as the ANN query set
    (parameterized — benchmark scale is a knob, not a constant)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


_ANN_PLANES = 4
_ANN_K = 10
_ANN_NQ = 5


def _ann_sketch_oracle() -> str:
    """DuckDB twin of the single-sketch RP-LSH top-k: identical literal
    hyperplanes ⇒ identical sign bits ⇒ identical buckets; cosine
    re-rank is the same sequential fold as knn_cosine_topk's bit-exact
    oracle, so rank order (tie-broken by neighbor_id) matches."""
    rows = []
    for p in range(_ANN_PLANES):
        vals = hyperplane_values(_LSH_DIM, p, _LSH_SEED)
        lit = "[" + ", ".join(repr(v) for v in vals) + "]"
        rows.append(f"({p}, {lit}::DOUBLE[])")
    values = ",\n    ".join(rows)
    cos = (
        f"({dot_expr('q_emb', 'c_emb')} / "
        f"({norm_expr('q_emb')} * {norm_expr('c_emb')}))"
    )
    return f"""
WITH __planes(plane_id, p) AS (VALUES
    {values}),
__sig AS (
  SELECT e.vec_id, e.embedding,
         CAST(SUM(CASE WHEN list_sum(list_transform(range(1, {_LSH_DIM} + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
              THEN 1 << pl.plane_id ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN __planes pl
  GROUP BY e.vec_id, e.embedding
),
__j AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS q_emb, c.embedding AS c_emb
  FROM __sig q JOIN __sig c USING (bucket)
  WHERE q.vec_id < {_ANN_NQ} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, {cos} AS cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY {cos} DESC, neighbor_id) AS INT) AS rank
FROM __j
QUALIFY rank <= {_ANN_K}
"""


@query("ann_rp_lsh_topk", bench=True, priority=90, oracle=_ann_sketch_oracle())
def ann_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return rp_lsh_topk(
        emb,
        _queries_set(spark, sf_dir, _ANN_NQ),
        k=_ANN_K,
        dim=_LSH_DIM,
        n_planes=_ANN_PLANES,
        exclude_self=True,
    )


_BANDED_PPB = 4
_BANDED_NB = 8


def _ann_banded_oracle() -> str:
    """DuckDB twin of the banded (OR-amplified) RP-LSH top-k: same
    32 literal hyperplanes, candidates = any shared (band, key)."""
    rows = []
    for p in range(_BANDED_PPB * _BANDED_NB):
        vals = hyperplane_values(_LSH_DIM, p, _LSH_SEED)
        lit = "[" + ", ".join(repr(v) for v in vals) + "]"
        rows.append(f"({p}, {lit}::DOUBLE[])")
    values = ",\n    ".join(rows)
    cos = (
        f"({dot_expr('q_emb', 'c_emb')} / "
        f"({norm_expr('q_emb')} * {norm_expr('c_emb')}))"
    )
    return f"""
WITH __planes(plane_id, p) AS (VALUES
    {values}),
__bits AS (
  SELECT e.vec_id, pl.plane_id,
         CASE WHEN list_sum(list_transform(range(1, {_LSH_DIM} + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM embeddings e CROSS JOIN __planes pl
),
__bands AS (
  SELECT vec_id, plane_id // {_BANDED_PPB} AS band,
         string_agg(bit, '' ORDER BY plane_id) AS key
  FROM __bits GROUP BY vec_id, plane_id // {_BANDED_PPB}
),
__cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM __bands q JOIN __bands c ON q.band = c.band AND q.key = c.key
  WHERE q.vec_id < {_ANN_NQ} AND c.vec_id <> q.vec_id
),
__j AS (
  SELECT cd.query_id, cd.neighbor_id,
         eq.embedding AS q_emb, ec.embedding AS c_emb
  FROM __cand cd
  JOIN embeddings eq ON eq.vec_id = cd.query_id
  JOIN embeddings ec ON ec.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, {cos} AS cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY {cos} DESC, neighbor_id) AS INT) AS rank
FROM __j
QUALIFY rank <= {_ANN_K}
"""


@query("ann_rp_lsh_banded_topk", priority=90, oracle=_ann_banded_oracle())
def ann_rp_lsh_banded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamlteamrepo_spark.operators.similarity import rp_lsh_banded_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return rp_lsh_banded_topk(
        emb,
        _queries_set(spark, sf_dir, _ANN_NQ),
        k=_ANN_K,
        dim=_LSH_DIM,
        planes_per_band=_BANDED_PPB,
        n_bands=_BANDED_NB,
        exclude_self=True,
    )


_MP_FLIP = 2


def _ann_multiprobe_oracle() -> str:
    """DuckDB twin of the multi-probe sketch: per-plane dots are the
    same sequential folds, so |margin| ordering (tie-broken by plane)
    and the XOR'd probe buckets match bit-for-bit.

    Currently UNREFERENCED: the face was deregistered in r12 (registry
    headroom; see the comment above ann_rp_lsh_multiprobe_topk).  Kept,
    like sketches._KMV_BY_FLAG_ORACLE, so a future re-registration
    round-trips without digging through git history."""
    rows = []
    for p in range(_ANN_PLANES):
        vals = hyperplane_values(_LSH_DIM, p, _LSH_SEED)
        lit = "[" + ", ".join(repr(v) for v in vals) + "]"
        rows.append(f"({p}, {lit}::DOUBLE[])")
    values = ",\n    ".join(rows)
    cos = (
        f"({dot_expr('q_emb', 'c_emb')} / "
        f"({norm_expr('q_emb')} * {norm_expr('c_emb')}))"
    )
    return f"""
WITH __planes(plane_id, p) AS (VALUES
    {values}),
__dots AS (
  SELECT e.vec_id, pl.plane_id,
         list_sum(list_transform(range(1, {_LSH_DIM} + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i])) AS d
  FROM embeddings e CROSS JOIN __planes pl
),
__sig AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN d >= 0 THEN 1 << plane_id ELSE 0 END) AS BIGINT)
           AS bucket
  FROM __dots GROUP BY vec_id
),
__flips AS (
  SELECT vec_id, plane_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY abs(d), plane_id)
           AS rk
  FROM __dots
),
__probes AS (
  SELECT vec_id, bucket AS probe FROM __sig WHERE vec_id < {_ANN_NQ}
  UNION ALL
  SELECT f.vec_id, xor(s.bucket, CAST(1 << f.plane_id AS BIGINT)) AS probe
  FROM __flips f JOIN __sig s USING (vec_id)
  WHERE f.rk <= {_MP_FLIP} AND f.vec_id < {_ANN_NQ}
),
__j AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         eq.embedding AS q_emb, ec.embedding AS c_emb
  FROM __probes p
  JOIN __sig c ON c.bucket = p.probe
  JOIN embeddings eq ON eq.vec_id = p.vec_id
  JOIN embeddings ec ON ec.vec_id = c.vec_id
  WHERE c.vec_id <> p.vec_id
)
SELECT query_id, neighbor_id, {cos} AS cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY {cos} DESC, neighbor_id) AS INT) AS rank
FROM __j
QUALIFY rank <= {_ANN_K}
"""


# Deregistered in r12 (registry headroom, NOTES_r17 candidates): of the
# three RP-LSH variants the base + banded pair stays registered (banded
# is the recall-improving one — 0.934 vs multiprobe's 0.478 best,
# SWEEP.md); multiprobe keeps its operator pins
# (tests/test_ann_dedup.py::test_rp_lsh_multiprobe_recall) and stays
# callable.
def ann_rp_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamlteamrepo_spark.operators.similarity import rp_lsh_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return rp_lsh_multiprobe_topk(
        emb,
        _queries_set(spark, sf_dir, _ANN_NQ),
        k=_ANN_K,
        dim=_LSH_DIM,
        n_planes=_ANN_PLANES,
        n_flip=_MP_FLIP,
        exclude_self=True,
    )


_VOR_ANCHORS = 8
_VOR_PROBE = 3


def _ann_voronoi_oracle() -> str:
    """DuckDB twin of :func:`voronoi_topk`: anchors come from the data
    (vec_id < n_anchors), so no fitted model stands between the two
    engines — assignment, probing, and re-rank are all the same
    deterministic folds."""
    acos = (
        f"({dot_expr('v_emb', 'a_emb')} / "
        f"({norm_expr('v_emb')} * {norm_expr('a_emb')}))"
    )
    cos = (
        f"({dot_expr('q_emb', 'c_emb')} / "
        f"({norm_expr('q_emb')} * {norm_expr('c_emb')}))"
    )
    return f"""
WITH __anchors AS (
  SELECT vec_id AS cell, embedding AS a_emb FROM embeddings
  WHERE vec_id < {_VOR_ANCHORS}
),
__asim AS (
  SELECT e.vec_id, e.embedding AS v_emb, a.cell, a.a_emb,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY ({acos.replace('v_emb', 'e.embedding')}) DESC, a.cell) AS r
  FROM embeddings e CROSS JOIN __anchors a
),
__assigned AS (
  SELECT vec_id AS neighbor_id, v_emb AS c_emb, cell FROM __asim WHERE r = 1
),
__probed AS (
  SELECT vec_id AS query_id, v_emb AS q_emb, cell FROM __asim
  WHERE vec_id < {_ANN_NQ} AND r <= {_VOR_PROBE}
),
__j AS (
  SELECT p.query_id, c.neighbor_id, p.q_emb, c.c_emb
  FROM __probed p JOIN __assigned c USING (cell)
  WHERE c.neighbor_id <> p.query_id
)
SELECT query_id, neighbor_id, {cos} AS cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY {cos} DESC, neighbor_id) AS INT) AS rank
FROM __j
QUALIFY rank <= {_ANN_K}
"""


@query("ann_voronoi_topk", oracle=_ann_voronoi_oracle(), priority=90)
def ann_voronoi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamlteamrepo_spark.operators.similarity import voronoi_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return voronoi_topk(
        emb,
        _queries_set(spark, sf_dir, _ANN_NQ),
        k=_ANN_K,
        n_anchors=_VOR_ANCHORS,
        n_probe=_VOR_PROBE,
        exclude_self=True,
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib-KMeans IVF top-k — DEREGISTERED from the query registry
    (VERDICT_r8 #2): the fitted quantizer's cells are nondeterministic,
    so its driver row could never be more than rows-only and sat
    permanently non-green in the ledger.  The operator stays fully
    covered: recall ≥ pinned thresholds in tests/test_ann_dedup.py, and
    the deterministic-quantizer registry faces of the same family are
    ``ann_voronoi_topk`` (oracle-green) and ``ann_ivfpq_topk``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        _queries_set(spark, sf_dir),
        k=10,
        n_cells=8,
        n_probe=3,
        exclude_self=True,
        fit_sample_fraction=0.5,
    )


_MAXSIM_K = 3  # labels returned per query


@query(
    "ann_maxsim_label_topk",
    oracle=f"""
WITH __q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {_ANN_NQ}
),
__s AS (
  SELECT q.query_id, c.label,
         MAX({dot_expr('c.embedding', 'q.q_emb')} /
             ({norm_expr('c.embedding')} * {norm_expr('q.q_emb')})) AS maxsim
  FROM embeddings c CROSS JOIN __q q
  WHERE c.vec_id <> q.query_id
  GROUP BY q.query_id, c.label
)
SELECT query_id, label, maxsim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY maxsim DESC, label) AS INT) AS rank
FROM __s
QUALIFY rank <= {_MAXSIM_K}
""",
)
def ann_maxsim_label_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (MaxSim) retrieval over vector GROUPS: each
    label's vectors act as one multi-vector document and its score for
    a query is the MAX per-vector cosine — the pooling step of
    ColBERT-style late interaction (Khattab & Zaharia 2020,
    arXiv:2004.12832), where a document is represented by many vectors
    and similarity max-pools over them.  One scan: per-(query, label)
    MAX is a hash aggregation with map-side combine (no per-group
    sort), then a top-k window over |labels| rows per query.  At
    100 TB the scan side is the ANN candidate stage (prefix/IVF
    buckets), not the full corpus — this query pins the POOLING
    semantics exactly (max of deterministic folds, hash-checkable)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_set(spark, sf_dir, _ANN_NQ)
    sim = cosine_similarity(F.col("embedding"), F.col("q_emb"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "label")
        .agg(F.max(sim).alias("maxsim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("label"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= _MAXSIM_K)



# --------------------------------------------------------------------------
# Prefix-dimension (Matryoshka) ANN: rank by the first PRE_DIM
# components, exact full-dim rerank of the survivors (Kusupati et al.
# 2022).  Deterministic truncation — no fitted model — so both the
# two-stage top-k AND the cosine-distortion audit are oracle-paired.
# --------------------------------------------------------------------------

_PRE_DIM = 16
_PRE_CAND = 50
_FID_DIMS = (8, 16, 32)


def _ann_prefix_oracle() -> str:
    pre_cos = (
        f"({dot_expr('c.pre', 'q.q_pre')} / "
        f"({norm_expr('c.pre')} * {norm_expr('q.q_pre')}))"
    )
    cos = (
        f"({dot_expr('q_emb', 'c_emb')} / "
        f"({norm_expr('q_emb')} * {norm_expr('c_emb')}))"
    )
    return f"""
WITH __pre AS (
  SELECT vec_id, embedding, embedding[1:{_PRE_DIM}] AS pre FROM embeddings
),
__q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, pre AS q_pre
  FROM __pre WHERE vec_id < {_ANN_NQ}
),
__j AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         q.q_emb, c.embedding AS c_emb,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
           ORDER BY ({pre_cos}) DESC, c.vec_id) AS pre_rank
  FROM __pre c CROSS JOIN __q q
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, {cos} AS cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY {cos} DESC, neighbor_id) AS INT) AS rank
FROM __j WHERE pre_rank <= {_PRE_CAND}
QUALIFY rank <= {_ANN_K}
"""


@query("ann_prefix_rerank_topk", bench=True, oracle=_ann_prefix_oracle())
def ann_prefix_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style two-stage ANN: dim-16 prefix cosine selects 50
    candidates (¼ of the scan bytes and multiply-adds at 100 TB with a
    dim-sliced layout), exact dim-64 rerank emits the top-10.  The
    operator is a deterministic fold chain, so the registered face is
    value-hash-checked end-to-end; recall vs the exact scan is pinned
    in tests/test_ann_dedup.py."""
    from bigdatamlteamrepo_spark.operators.similarity import prefix_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return prefix_rerank_topk(
        emb,
        _queries_set(spark, sf_dir, _ANN_NQ),
        k=_ANN_K,
        prefix_dim=_PRE_DIM,
        candidates=_PRE_CAND,
        exclude_self=True,
    )


def _prefix_fidelity_oracle() -> str:
    cos64 = (
        f"({dot_expr('q', 'e')} / ({norm_expr('q')} * {norm_expr('e')}))"
    )
    parts = []
    for d in _FID_DIMS:
        cos_d = (
            f"({dot_expr(f'e[1:{d}]', f'q[1:{d}]')} / "
            f"({norm_expr(f'e[1:{d}]')} * {norm_expr(f'q[1:{d}]')}))"
        )
        parts.append(
            f"""SELECT {d} AS prefix_dim,
       CAST(FLOOR(ABS(({cos_d}) - ({cos64})) * 1000000.0) AS BIGINT) AS err
FROM __p"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH __q AS (
  SELECT vec_id AS qid, embedding AS q FROM embeddings
  WHERE vec_id < {_ANN_NQ}
),
__p AS (
  SELECT c.embedding AS e, q.q FROM embeddings c CROSS JOIN __q q
  WHERE c.vec_id <> q.qid
),
__e AS (
{union}
)
SELECT prefix_dim,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(err) AS BIGINT) AS err_micro_sum,
       CAST(SUM(err) AS DOUBLE) / COUNT(*) AS mean_err_micro
FROM __e GROUP BY prefix_dim
"""


@query("embedding_prefix_dim_fidelity", oracle=_prefix_fidelity_oracle())
def embedding_prefix_dim_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement behind the prefix-rerank knob: per prefix width
    (8/16/32 of 64), the cosine distortion |cos_prefix − cos_full| over
    every (query, corpus) pair, micro-quantized per pair BEFORE
    aggregation (the decode-stats discipline: FLOOR(x·1e6) of one IEEE
    double is bit-identical in both engines, and BIGINT sums need no
    float tolerance).  Read it as the recall/cost curve's x-axis —
    widths whose mean distortion is ≪ the top-k cosine gaps are safe
    candidate widths."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q")
    )
    pairs = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(F.col("embedding").alias("e"), "q")
    )
    cos64 = cosine_similarity(F.col("q"), F.col("e"))
    errs = F.array(
        *[
            F.struct(
                F.lit(d).alias("prefix_dim"),
                F.floor(
                    F.abs(
                        cosine_similarity(
                            F.slice(F.col("q"), 1, d), F.slice(F.col("e"), 1, d)
                        )
                        - cos64
                    )
                    * 1000000.0
                )
                .cast("bigint")
                .alias("err"),
            )
            for d in _FID_DIMS
        ]
    )
    return (
        pairs.select(F.explode(errs).alias("x"))
        .select("x.prefix_dim", "x.err")
        .groupBy("prefix_dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("err").cast("bigint").alias("err_micro_sum"),
            (F.sum("err").cast("double") / F.count(F.lit(1))).alias(
                "mean_err_micro"
            ),
        )
    )


# --------------------------------------------------------------------------
# Product quantization ADC top-k (operators/pq.py): codes-only ranking
# + exact re-rank on the k survivors.  Codebooks are data-derived
# anchors (vec_id < PQ_K), the same oracle-reproducibility device as
# ann_voronoi_topk, so the full PQ pipeline — encode, ADC, re-rank —
# is value-checked end-to-end against DuckDB.
# --------------------------------------------------------------------------


def _ann_pq_oracle() -> str:
    from bigdatamlteamrepo_spark.functions.vectors import l2_sq_expr
    from bigdatamlteamrepo_spark.operators.pq import PQ_K, PQ_M, PQ_SUB

    subs = ", ".join(str(s) for s in range(PQ_M))
    sl = f"[(s*{PQ_SUB}+1):(s*{PQ_SUB}+{PQ_SUB})]"
    pd_terms = " + ".join(f"pd{i}" for i in range(PQ_M))
    cn_terms = " + ".join(f"cn{i}" for i in range(PQ_M))
    per_sub = ",\n         ".join(
        f"SUM(CASE WHEN s = {i} THEN pd END) AS pd{i},\n         "
        f"SUM(CASE WHEN s = {i} THEN cn2 END) AS cn{i}"
        for i in range(PQ_M)
    )
    sqn = "list_sum(list_transform(c_sub, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    cos = (
        f"({dot_expr('e.embedding', 't.q_emb')} / "
        f"({norm_expr('e.embedding')} * {norm_expr('t.q_emb')}))"
    )
    return f"""
WITH __subs AS (SELECT unnest([{subs}]) AS s),
__cb AS (
  SELECT s, vec_id AS center_id, embedding{sl} AS c_sub
  FROM embeddings CROSS JOIN __subs WHERE vec_id < {PQ_K}
),
__vs AS (
  SELECT vec_id, s, embedding{sl} AS v_sub
  FROM embeddings CROSS JOIN __subs
),
__enc AS (
  SELECT vec_id, s, center_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s
           ORDER BY {l2_sq_expr('v_sub', 'c_sub')} ASC, center_id) AS r
  FROM __vs JOIN __cb USING (s)
),
__codes AS (SELECT vec_id, s, center_id AS code FROM __enc WHERE r = 1),
__qs AS (
  SELECT vec_id AS query_id, s, embedding{sl} AS q_sub
  FROM embeddings CROSS JOIN __subs WHERE vec_id < {_ANN_NQ}
),
__part AS (
  SELECT q.query_id, c.vec_id, c.s,
         {dot_expr('q.q_sub', 'b.c_sub')} AS pd,
         {sqn} AS cn2
  FROM __codes c
  JOIN __cb b ON b.s = c.s AND b.center_id = c.code
  JOIN __qs q ON q.s = c.s
),
__g AS (
  SELECT query_id, vec_id,
         {per_sub}
  FROM __part GROUP BY query_id, vec_id
),
__qn AS (
  SELECT vec_id AS query_id,
         sqrt({dot_expr('embedding', 'embedding')}) AS qn,
         embedding AS q_emb
  FROM embeddings WHERE vec_id < {_ANN_NQ}
),
__top AS (
  SELECT g.query_id, g.vec_id AS neighbor_id,
         ({pd_terms}) / (qn * sqrt({cn_terms})) AS adc_score,
         q.q_emb,
         CAST(ROW_NUMBER() OVER (PARTITION BY g.query_id
           ORDER BY ({pd_terms}) / (qn * sqrt({cn_terms})) DESC, g.vec_id)
           AS INT) AS rank
  FROM __g g JOIN __qn q USING (query_id)
  WHERE g.vec_id <> g.query_id
  QUALIFY rank <= {_ANN_K}
)
SELECT t.query_id, t.neighbor_id, t.adc_score,
       {cos} AS cosine_sim, t.rank
FROM __top t JOIN embeddings e ON e.vec_id = t.neighbor_id
"""


@query("ann_pq_adc_topk", oracle=_ann_pq_oracle(), priority=90, bench=True)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamlteamrepo_spark.operators.pq import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb, _queries_set(spark, sf_dir, _ANN_NQ), k=_ANN_K, exclude_self=True
    )


# --------------------------------------------------------------------------
# IVF→PQ→exact-re-rank (operators/pq.py::ivfpq_topk): the FAISS IVFPQ
# architecture end-to-end — Voronoi cell pruning, code-only ADC ranking
# inside probed cells, exact cosine re-rank of the shortlist.  Both the
# cells and the codebooks are data-derived (vec_id < N), so the entire
# three-layer index is one deterministic SQL expression and the oracle
# value-checks it end-to-end.
# --------------------------------------------------------------------------

_IVFPQ_RERANK = 30


def _ann_ivfpq_oracle() -> str:
    from bigdatamlteamrepo_spark.functions.vectors import l2_sq_expr
    from bigdatamlteamrepo_spark.operators.pq import PQ_K, PQ_M, PQ_SUB

    subs = ", ".join(str(s) for s in range(PQ_M))
    sl = f"[(s*{PQ_SUB}+1):(s*{PQ_SUB}+{PQ_SUB})]"
    pd_terms = " + ".join(f"pd{i}" for i in range(PQ_M))
    cn_terms = " + ".join(f"cn{i}" for i in range(PQ_M))
    per_sub = ",\n         ".join(
        f"SUM(CASE WHEN s = {i} THEN pd END) AS pd{i},\n         "
        f"SUM(CASE WHEN s = {i} THEN cn2 END) AS cn{i}"
        for i in range(PQ_M)
    )
    sqn = "list_sum(list_transform(c_sub, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    acell = (
        f"({dot_expr('e.embedding', 'a.a_emb')} / "
        f"({norm_expr('e.embedding')} * {norm_expr('a.a_emb')}))"
    )
    cos = (
        f"({dot_expr('e.embedding', 't.q_emb')} / "
        f"({norm_expr('e.embedding')} * {norm_expr('t.q_emb')}))"
    )
    return f"""
WITH __subs AS (SELECT unnest([{subs}]) AS s),
__cb AS (
  SELECT s, vec_id AS center_id, embedding{sl} AS c_sub
  FROM embeddings CROSS JOIN __subs WHERE vec_id < {PQ_K}
),
__vs AS (
  SELECT vec_id, s, embedding{sl} AS v_sub
  FROM embeddings CROSS JOIN __subs
),
__enc AS (
  SELECT vec_id, s, center_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s
           ORDER BY {l2_sq_expr('v_sub', 'c_sub')} ASC, center_id) AS r
  FROM __vs JOIN __cb USING (s)
),
__codes AS (SELECT vec_id, s, center_id AS code FROM __enc WHERE r = 1),
__anchors AS (
  SELECT vec_id AS cell, embedding AS a_emb FROM embeddings
  WHERE vec_id < {_VOR_ANCHORS}
),
__asim AS (
  SELECT e.vec_id, a.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {acell} DESC, a.cell) AS r
  FROM embeddings e CROSS JOIN __anchors a
),
__assigned AS (SELECT vec_id, cell FROM __asim WHERE r = 1),
__pcodes AS (
  SELECT c.vec_id, c.s, c.code, g.cell
  FROM __codes c JOIN __assigned g USING (vec_id)
),
__qprobe AS (
  SELECT vec_id AS query_id, cell FROM __asim
  WHERE vec_id < {_ANN_NQ} AND r <= {_VOR_PROBE}
),
__qs AS (
  SELECT vec_id AS query_id, s, embedding{sl} AS q_sub
  FROM embeddings CROSS JOIN __subs WHERE vec_id < {_ANN_NQ}
),
__part AS (
  SELECT p.query_id, c.vec_id, c.s,
         {dot_expr('q.q_sub', 'b.c_sub')} AS pd,
         {sqn} AS cn2
  FROM __pcodes c
  JOIN __qprobe p USING (cell)
  JOIN __cb b ON b.s = c.s AND b.center_id = c.code
  JOIN __qs q ON q.query_id = p.query_id AND q.s = c.s
),
__g AS (
  SELECT query_id, vec_id,
         {per_sub}
  FROM __part GROUP BY query_id, vec_id
),
__qn AS (
  SELECT vec_id AS query_id,
         sqrt({dot_expr('embedding', 'embedding')}) AS qn,
         embedding AS q_emb
  FROM embeddings WHERE vec_id < {_ANN_NQ}
),
__short AS (
  SELECT g.query_id, g.vec_id AS neighbor_id,
         ({pd_terms}) / (qn * sqrt({cn_terms})) AS adc_score,
         q.q_emb,
         ROW_NUMBER() OVER (PARTITION BY g.query_id
           ORDER BY ({pd_terms}) / (qn * sqrt({cn_terms})) DESC, g.vec_id) AS ar
  FROM __g g JOIN __qn q USING (query_id)
  WHERE g.vec_id <> g.query_id
  QUALIFY ar <= {_IVFPQ_RERANK}
)
SELECT t.query_id, t.neighbor_id, t.adc_score,
       {cos} AS cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY t.query_id
         ORDER BY {cos} DESC, t.neighbor_id) AS INT) AS rank
FROM __short t JOIN embeddings e ON e.vec_id = t.neighbor_id
QUALIFY rank <= {_ANN_K}
"""


@query("ann_ivfpq_topk", oracle=_ann_ivfpq_oracle(), priority=90)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatamlteamrepo_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb,
        _queries_set(spark, sf_dir, _ANN_NQ),
        k=_ANN_K,
        n_anchors=_VOR_ANCHORS,
        n_probe=_VOR_PROBE,
        rerank=_IVFPQ_RERANK,
        exclude_self=True,
    )


# --------------------------------------------------------------------------
# Curate → search composition: similarity search restricted to the
# documents the END-TO-END corpus build actually ships.  The synthetic
# corpus links embeddings to documents 1:1 by id (vec_id = doc_id), so
# the survivor set from queries/textmodel.corpus_stage_frames projects
# directly onto the embedding table — the retrieval surface a curated
# 100 TB corpus exposes (dedup/quality-filter first, then index ONLY
# the shipped vectors; dead weight never enters the ANN tier).
# --------------------------------------------------------------------------

_SURV_NQ = 5
_SURV_K = 10


def _survivor_knn_oracle() -> str:
    from bigdatamlteamrepo_spark.queries.textmodel import _corpus_survivor_ctes

    cos = (
        f"({dot_expr('q.embedding', 'c.embedding')} / "
        f"({norm_expr('q.embedding')} * {norm_expr('c.embedding')}))"
    )
    return f"""
WITH RECURSIVE
{_corpus_survivor_ctes()},
__semb AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN __csel s ON e.vec_id = s.doc_id
),
__squeries AS (
  SELECT vec_id, embedding FROM __semb ORDER BY vec_id LIMIT {_SURV_NQ}
),
__spairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine_sim
  FROM __squeries q JOIN __semb c ON c.vec_id <> q.vec_id
),
__sranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
         ) AS INT) AS rank
  FROM __spairs
)
SELECT query_id, neighbor_id, cosine_sim, rank
FROM __sranked WHERE rank <= {_SURV_K}
"""


@query("corpus_survivor_knn", oracle=_survivor_knn_oracle())
def corpus_survivor_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over the CURATED corpus: candidates (and the
    query vectors — the lowest-id survivors) are restricted to the
    end-to-end build's shipped doc_ids before any similarity work runs.

    Plan: the survivor id set is corpus-shrunk and materialized once
    (queries/textmodel.corpus_survivor_ids — every stage a hash
    semi/anti join); the embedding scan hash-semi-joins against it, the
    query set is broadcast, cosine is a JVM expression fold, and the
    per-query top-k window shuffles only (query, candidate) rows.  At
    100 TB the win is structural: the ANN/index tier (see
    tests/test_corpus_ann.py for the IVF-PQ-index composition of this
    same surface) is built over survivors only — typically 30-60%
    smaller than raw after dedup + quality gating."""
    from pyspark.sql import Window

    from bigdatamlteamrepo_spark.queries.textmodel import corpus_survivor_ids

    emb = load_table(spark, sf_dir, "embeddings")
    surv = corpus_survivor_ids(spark, sf_dir).select(
        F.col("doc_id").alias("vec_id")
    )
    semb = emb.join(surv, "vec_id", "left_semi")
    queries = (
        semb.orderBy("vec_id")
        .limit(_SURV_NQ)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    )
    cand = semb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_emb"), F.col("embedding")).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _SURV_K)
    )
