"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Determinism design: float components are quantized to integers
(floor(x·1e6)) so dot products and squared norms are EXACT integer
sums (order-independent → identical across engines); the final cosine
is a fixed sequence of IEEE double ops on those integers.  64-dim
unit-ish vectors → |q|≤1e6, products ≤1e12, 64-term sums ≤ 6.4e13 —
comfortably BIGINT.

Queries:
* ann_cosine_topk — brute-force top-5 for the first 8 query vectors:
  the correctness baseline (full cross join, candidate set = n).
* ann_ivf_fit — deterministic Lloyd's k-means (k=8, centroids seeded
  from the first k vectors, 2 unrolled iterations) producing the IVF
  cell assignment.  Each iteration is the 100-TB-correct shape: an
  assignment join of every vector against the k-row (broadcastable)
  centroid set, then ONE (cell, pos) shuffle to recompute element-wise
  integer means.  All math is exact-integer until the final mean
  (one IEEE division + floor), so both engines fit identical cells.
* ann_ivf_topk — the scale path: candidates pruned to the query's
  FITTED cell (consumes ann_ivf_fit's assignment end-to-end).  Same
  ranking math as brute force, a fraction of the candidates — at
  10^12 rows the cross join is infeasible and this cell-pruned join
  (plus broadcast of the tiny query set) is the shape that survives.

``ivf_fit_df`` is the PRODUCTION form of the same fit: an iterative
DataFrame loop with the per-round inputs persisted, because Catalyst
inlines (re-evaluates) every CTE reference — fine at fixture scale,
catastrophic at 10^12 vectors.  The unrolled SQL stays as the
cross-engine oracle; a test pins cell-for-cell agreement between the
two forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..relational import DUCK, SPARK, LEN, ORD_ARRAY

QUERIES = {}


def query(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


def _quantized(d: str) -> str:
    """embedding (array<float>) → array<bigint> of floor(x*1e6)."""
    body = "CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)"
    if d == SPARK:
        return "transform(embedding, x -> %s)" % body
    return "[%s for x in embedding]" % body


def _dot(a: str, b: str, d: str) -> str:
    """Exact integer dot product of two quantized vectors."""
    if d == SPARK:
        return ("aggregate(zip_with(%s, %s, (x, y) -> x * y), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)" % (a, b))
    return ("CAST(list_sum(list_transform(range(1, %s + 1), "
            "i -> %s[i] * %s[i])) AS BIGINT)" % (LEN(a, d), a, b))


def _ssq(a: str, d: str) -> str:
    return _dot(a, a, d)


def _sqdist(a: str, b: str, d: str) -> str:
    """Exact integer squared L2 distance.  Components ≤ ~2e6 → diff²
    ≤ 1.6e13, 64-term sum ≤ ~1e15 — comfortably BIGINT."""
    if d == SPARK:
        return ("aggregate(zip_with(%s, %s, (x, y) -> (x - y) * (x - y)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)" % (a, b))
    return ("CAST(list_sum(list_transform(range(1, %s + 1), "
            "i -> (%s[i] - %s[i]) * (%s[i] - %s[i]))) AS BIGINT)"
            % (LEN(a, d), a, b, a, b))


def _kmeans_ctes(d: str, k: int = 8, iters: int = 2) -> str:
    """CTE chain: quantized vectors → seeded centroids → ``iters``
    unrolled Lloyd rounds → ``fit(vec_id, cell)`` final assignment.

    Determinism: init = the first k vectors by vec_id; assignment
    ties break on lowest cell id; centroid recompute is an exact
    integer sum, one IEEE division, floor — identical across engines.
    Centroid means stay exact in double (|component sum| ≤ n·2e6 ≪
    2^53).  The vector components are exploded ONCE (``comps``) and
    reused by every recompute round."""
    if d == SPARK:
        comps = ("SELECT vec_id, pos, v FROM base "
                 "LATERAL VIEW posexplode(qv) t AS pos, v")
    else:
        comps = ("SELECT vec_id, CAST(pos AS INT) AS pos, "
                 "qv[pos + 1] AS v FROM "
                 "(SELECT vec_id, qv, unnest(range(0, len(qv))) AS pos "
                 "FROM base) t")
    parts = [
        "base AS (SELECT vec_id, %s AS qv FROM embeddings)" % _quantized(d),
        "comps AS (%s)" % comps,
        "cent0 AS (SELECT CAST(vec_id AS INT) AS cell, qv AS cv "
        "FROM base WHERE vec_id < %d)" % k,
    ]
    assign_tpl = """
assign{r} AS (
  SELECT vec_id, cell FROM (
    SELECT b.vec_id, c.cell,
      ROW_NUMBER() OVER (PARTITION BY b.vec_id
                         ORDER BY {dist}, c.cell) AS rn
    FROM base b CROSS JOIN cent{p} c
  ) t WHERE rn = 1
)"""
    cent_tpl = """
cent{r} AS (
  SELECT cell, {arr} AS cv FROM (
    SELECT a.cell, c.pos,
      CAST(floor(SUM(c.v) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS m
    FROM assign{r} a JOIN comps c ON a.vec_id = c.vec_id
    GROUP BY a.cell, c.pos
  ) g GROUP BY cell
)"""
    dist = _sqdist("b.qv", "c.cv", d)
    for r in range(1, iters + 1):
        parts.append(assign_tpl.format(r=r, p=r - 1, dist=dist).strip())
        parts.append(cent_tpl.format(r=r, arr=ORD_ARRAY("m", "pos", d))
                     .strip())
    parts.append(assign_tpl.format(r=iters + 1, p=iters, dist=dist).strip())
    parts.append("fit AS (SELECT vec_id, cell FROM assign%d)" % (iters + 1))
    return ",\n".join(parts)


def _topk_sql(d: str, candidate_filter: str) -> str:
    """Shared shape: quantize → (query × candidates) → integer dot &
    norms → cosine → rank ≤ 5."""
    return """
WITH q AS (
  SELECT vec_id AS query_id, {quant} AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT vec_id AS cand_id, {quant} AS cv, label AS clabel
  FROM embeddings
),
scored AS (
  SELECT query_id, cand_id,
    CAST({dot} AS DOUBLE)
      / (sqrt(CAST({qssq} AS DOUBLE)) * sqrt(CAST({cssq} AS DOUBLE)))
      AS cosine
  FROM q JOIN c ON q.query_id <> c.cand_id {candfilter}
),
ranked AS (
  SELECT query_id, cand_id, cosine,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, cand_id AS neighbor_id, rank, cosine
FROM ranked WHERE rank <= 5
""".format(quant=_quantized(d), dot=_dot("qv", "cv", d),
           qssq=_ssq("qv", d), cssq=_ssq("cv", d),
           candfilter=candidate_filter)


@query("ann_cosine_topk")
def q_brute(d: str) -> str:
    """Brute-force cosine top-5 (the correctness baseline)."""
    return _topk_sql(d, "")


@query("ann_ivf_fit")
def q_ivf_fit(d: str) -> str:
    """The IVF coarse quantizer: deterministic k-means cell per vector
    (k=8, 2 Lloyd rounds) plus the distance to its centroid."""
    return """
WITH {kmeans}
SELECT f.vec_id, f.cell,
  {dist} AS sq_dist
FROM fit f
JOIN base b ON b.vec_id = f.vec_id
JOIN cent2 c ON c.cell = f.cell
""".format(kmeans=_kmeans_ctes(d), dist=_sqdist("b.qv", "c.cv", d))


@query("ann_ivf_topk")
def q_ivf(d: str) -> str:
    """IVF-style cell-pruned top-5: candidates share the query's
    FITTED k-means cell (the ann_ivf_fit assignment, computed
    in-plan end-to-end)."""
    return """
WITH {kmeans},
q AS (
  SELECT b.vec_id AS query_id, b.qv, f.cell
  FROM base b JOIN fit f ON b.vec_id = f.vec_id
  WHERE b.vec_id < 8
),
c AS (
  SELECT b.vec_id AS cand_id, b.qv AS cv, f.cell
  FROM base b JOIN fit f ON b.vec_id = f.vec_id
),
scored AS (
  SELECT query_id, cand_id,
    CAST({dot} AS DOUBLE)
      / (sqrt(CAST({qssq} AS DOUBLE)) * sqrt(CAST({cssq} AS DOUBLE)))
      AS cosine
  FROM q JOIN c ON q.cell = c.cell AND q.query_id <> c.cand_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, cand_id AS neighbor_id, rank, cosine
FROM ranked WHERE rank <= 5
""".format(kmeans=_kmeans_ctes(d), dot=_dot("q.qv", "c.cv", d),
           qssq=_ssq("q.qv", d), cssq=_ssq("c.cv", d))


@query("dedup_embedding_cosine")
def q_embed_neardup(d: str) -> str:
    """Embedding-cosine near-duplicate pairs: candidates pruned to the
    coarse cell (label), kept when cosine ≥ 0.9 — the embedding tier
    of the dedup ladder (exact → minhash → simhash → embedding).
    Quantized-integer math as above → engine-identical doubles.

    The driver corpus has no near-dup vectors (random embeddings), so
    a twin tier is synthesized in-plan: every 10th vector re-enters
    with its first component nudged (+5% of the quantization unit) —
    cosine ≈ 0.999, found by the threshold; unrelated pairs stay far
    below it."""
    if d == SPARK:
        twin = ("concat(array(element_at(qv, 1) + 50000), "
                "slice(qv, 2, size(qv) - 1))")
    else:
        twin = "[qv[1] + 50000] || qv[2:len(qv)]"
    return """
WITH base AS (
  SELECT vec_id, {quant} AS qv, label FROM embeddings
),
q AS (
  SELECT vec_id, qv, label FROM base
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, {twin} AS qv, label
  FROM base WHERE vec_id % 10 = 0
),
pairs AS (
  SELECT a.vec_id AS left_id, b.vec_id AS right_id,
    CAST({dot} AS DOUBLE)
      / (sqrt(CAST({assq} AS DOUBLE)) * sqrt(CAST({bssq} AS DOUBLE)))
      AS cosine
  FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT left_id, right_id, cosine FROM pairs WHERE cosine >= 0.9
""".format(quant=_quantized(d), twin=twin, dot=_dot("a.qv", "b.qv", d),
           assq=_ssq("a.qv", d), bssq=_ssq("b.qv", d))


# ------------------------------------------------------- production fit
def ivf_fit_df(embeddings: DataFrame, k: int = 8,
               iters: int = 2) -> DataFrame:
    """Iterative Lloyd's k-means over (vec_id, embedding) — the form
    you run on a cluster.  Same math as the ``ann_ivf_fit`` SQL (which
    remains the DuckDB-checkable oracle): floor(x*1e6) quantization,
    exact-integer distances, ties to the lowest cell, element-wise
    integer-floored means.

    Scale shape per round: ONE broadcast hash join of the vectors
    against the k-row centroid set (constant join key — the broadcast
    side is k rows, so this is the legal spelling of a tiny cross
    join), then ONE (cell, pos) shuffle of partial sums.  ``base`` and
    ``comps`` are persisted once and reused every round instead of
    being re-derived — the property the inlined-CTE SQL form cannot
    express."""
    base = embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
               " * 1000000.0) AS BIGINT))").alias("qv"),
    ).persist()
    comps = base.select(
        "vec_id", F.posexplode("qv").alias("pos", "v")
    ).persist()
    sqdist = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    cent = base.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("qv").alias("cv"))

    def assign(centroids: DataFrame) -> DataFrame:
        scored = (
            base.withColumn("_one", F.lit(1))
            .join(F.broadcast(centroids.withColumn("_one", F.lit(1))),
                  "_one")
            .select("vec_id", "cell", sqdist.alias("sq_dist"))
        )
        return scored.groupBy("vec_id").agg(
            F.min_by("cell", F.struct("sq_dist", "cell")).alias("cell"))

    assigned = None
    for _ in range(iters):
        assigned = assign(cent)
        means = (
            assigned.join(comps, "vec_id")
            .groupBy("cell", "pos")
            .agg(F.expr("CAST(floor(SUM(v) / CAST(COUNT(*) AS DOUBLE))"
                        " AS BIGINT)").alias("m"))
        )
        cent = means.groupBy("cell").agg(
            F.expr("transform(array_sort(collect_list("
                   "struct(pos as o, m as v))), x -> x.v)").alias("cv"))
        # materialize the round's centroids so the next round's plan
        # does not recursively re-derive every previous round
        cent = cent.sparkSession.createDataFrame(
            cent.collect(), schema=cent.schema)
    final = assign(cent)
    base.unpersist()
    comps.unpersist()
    return final
