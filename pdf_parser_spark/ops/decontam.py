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


@query("decontam_fuzzy")
def q_decontam_fuzzy(d: str) -> str:
    """FUZZY decontamination — the screen exact 13-grams cannot do:
    a benchmark document lightly reformatted inside a web page (words
    dropped, whitespace renormalized) shares no long exact n-gram but
    is still contamination.  The industry answer is the same
    MinHash/LSH ladder as near-dup dedup, run ACROSS corpora: band
    the eval set and the train set together, candidates = band-bucket
    collisions, keep only eval×train pairs, verify at exact 4-gram
    Jaccard ≥ 0.5.

    Same in-plan split as ``decontam_13gram`` (every 50th doc is
    eval), but the injected twins model the fuzzy case: a train doc
    with doc_id % 17 = 3 has its text REPLACED by its partner eval
    doc's text minus the first word — the near-dup twin shape of the
    dedup tier.  On the fixture corpus the screen also surfaces one
    ORGANIC eval near-duplicate no injection created (56 ↔ 157,
    Jaccard 0.98) — exactly the finding class this operator exists
    for (test-pinned).

    Shape at 10^12 train docs: the shared ``_lsh_ctes`` chain — the
    eval side adds ~1e5 rows to the banding, candidates are bounded
    by band-bucket fan-in, the E×T filter runs before the pairwise
    verify, and nothing is all-pairs.  Keys are 'E'/'T'-prefixed so
    one banding pass serves both corpora and the pair orientation is
    fixed by the prefix sort order."""
    from .dedup import _JACCARD, _jaccard_ctes, _lsh_ctes

    cstr = (("lpad(CAST(doc_id AS STRING), 6, '0')") if d == SPARK
            else ("lpad(CAST(doc_id AS VARCHAR), 6, '0')"))
    corpus0 = """
probes AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 50 = 7
),
trainset AS (
  SELECT t.doc_id,
    CASE WHEN t.doc_id % 17 = 3 AND e.text IS NOT NULL
         THEN substring(e.text, instr(e.text, ' ') + 1)
         ELSE t.text END AS text
  FROM (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 7) t
  LEFT JOIN probes e ON e.doc_id = 7 + 50 * (t.doc_id % 10)
),
corpus0 AS (
  SELECT 'E' || {cstr} AS doc_id, text FROM probes
  UNION ALL
  SELECT 'T' || {cstr} AS doc_id, text FROM trainset
)""".format(cstr=cstr).strip()
    return """
WITH {lsh},
cand_et AS (
  SELECT left_id, right_id FROM cand
  WHERE substring(left_id, 1, 1) = 'E'
    AND substring(right_id, 1, 1) = 'T'
),
{jac}
SELECT
  CAST(substring(i.right_id, 2) AS BIGINT) AS train_doc_id,
  CAST(substring(i.left_id, 2) AS BIGINT) AS eval_doc_id,
  i.inter, sa.n AS eval_n, sb.n AS train_n,
  {jexpr} AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.left_id
JOIN sizes sb ON sb.doc_id = i.right_id
WHERE {jexpr} >= 0.5
""".format(lsh=_lsh_ctes(d, corpus0_sql=corpus0),
           jac=_jaccard_ctes("cand_et"), jexpr=_JACCARD)
