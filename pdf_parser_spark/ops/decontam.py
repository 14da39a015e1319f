"""Benchmark decontamination — 13-gram overlap screening of a training
corpus against a held-out eval set (the GPT-3 appendix-C / Pile
protocol: a train document is contaminated if it shares any 13-token
n-gram with an eval document).

The reference has no counterpart (training-data tier).  The fixture
corpus has no eval benchmark, so — same pattern as the dedup tiers'
injected corpora — both engines derive the SAME split + contamination
in-plan: every 50th document (doc_id % 50 = 7, with >= 13 tokens; the
standard protocol excludes shorter eval rows from the n-gram screen)
is the "eval set" (eval rows are the benchmark, not training data —
they never appear in the per-train-document output, whatever their
length), the rest is "train", and train docs with
doc_id % 17 = 3 get their partner eval doc's first 13 words appended
so the screen has true positives to find.

Shape at 10^12 train docs: the eval side is tiny by construction
(benchmarks are ~1e5 rows), so the gram equi-join broadcasts; the
train side is one posexplode + lead-window pass per document (the
array-free shingle form — Catalyst inlines split() into slice-lambda
shingles and goes O(words^2) per doc, see ops/dedup._exploded_shingles)
followed by a hash semi-join + per-doc count.  No all-pairs work
anywhere: cost is O(total train grams).
"""

from __future__ import annotations

from ..relational import DUCK, SPARK, JOINA, LEN, SLICE

QUERIES = {}


def query(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


_K = 13


def _grams(src: str, d: str, k: int = _K) -> str:
    """CTE chain ``src(doc_id, text)`` → ``{src}_grams(doc_id, g)`` of
    full k-word grams (documents shorter than k words emit none).
    Spark: posexplode + lead window (array-free, one doc_id exchange);
    DuckDB: list comprehension over the pre-split array."""
    if d == SPARK:
        leads = ", ".join("lead(w, %d) OVER w%s" % (i, src)
                          for i in range(1, k))
        return """
{src}_ws AS (
  SELECT doc_id, pos, w FROM {src}
  LATERAL VIEW posexplode(split(text, ' ')) t AS pos, w
),
{src}_led AS (
  SELECT doc_id, pos, concat_ws(' ', w, {leads}) AS g,
    count(*) OVER (PARTITION BY doc_id) AS n
  FROM {src}_ws
  WINDOW w{src} AS (PARTITION BY doc_id ORDER BY pos)
),
{src}_grams AS (
  SELECT doc_id, g FROM {src}_led WHERE pos + 1 <= n - {km1}
)""".format(src=src, leads=leads, km1=k - 1)
    from .dedup import _shingles_from_ws, _split_ws
    return """
{src}_ws AS (SELECT doc_id, {split} AS ws FROM {src}),
{src}_sh AS (SELECT doc_id, {sh} AS shingles FROM {src}_ws
             WHERE {n} >= {k}),
{src}_grams AS (SELECT doc_id, unnest(shingles) AS g FROM {src}_sh)
""".format(src=src, split=_split_ws(d), sh=_shingles_from_ws(d, k),
           n=LEN("ws", d), k=k)


@query("decontam_13gram")
def q_decontam(d: str) -> str:
    """Per TRAIN document: how many distinct eval 13-grams it contains
    and the resulting contaminated flag (drop rule)."""
    ws = ("split(text, ' ')" if d == SPARK else "string_split(text, ' ')")
    probe = JOINA(SLICE("ws", "1", str(_K), d), " ", d)
    return """
WITH evalset AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % 50 = 7 AND {nw} >= {k}
),
evws AS (SELECT doc_id, {ws} AS ws FROM evalset),
probes AS (SELECT doc_id, {probe} AS probe FROM evws),
train AS (
  SELECT t.doc_id,
    CASE WHEN t.doc_id % 17 = 3 AND e.probe IS NOT NULL
         THEN t.text || ' ' || e.probe ELSE t.text END AS text
  FROM (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 7) t
  LEFT JOIN probes e ON e.doc_id = 7 + 50 * (t.doc_id % 10)
),
{ev_grams},
{tr_grams},
ev_distinct AS (SELECT DISTINCT g FROM evalset_grams),
hits AS (
  SELECT tg.doc_id, COUNT(DISTINCT tg.g) AS n_hits
  FROM train_grams tg JOIN ev_distinct ev ON ev.g = tg.g
  GROUP BY tg.doc_id
)
SELECT tr.doc_id,
  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_eval_grams_hit,
  CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM train tr
LEFT JOIN hits h ON h.doc_id = tr.doc_id
""".format(nw=LEN(ws, d), k=_K, ws=ws, probe=probe,
           ev_grams=_grams("evalset", d).lstrip(),
           tr_grams=_grams("train", d).lstrip())
