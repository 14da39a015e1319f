"""Full-text retrieval over the ``documents`` corpus: BM25-ranked
top-k search — the index/serve tier of a training-data pipeline
(quality-prior scoring, dataset search, targeted decontamination all
rank documents against term queries).

The reference has no counterpart (training-data tier).  The query set
is a small inline VALUES relation (the realistic shape: thousands of
queries against 10^12 documents), so the term join broadcasts the
query side — a plan test pins the BroadcastHashJoin.

Cross-engine determinism: classic BM25 needs ln() and float division,
whose last-ulp behavior differs across math libraries and summation
orders — fatal for the value-hash oracle.  So the scoring is an
integer-exact BM25 surrogate with the same monotonicity:

    idf'(t)  = floor( (N - df) * 1000 / (df + 1) )          [~ x1000]
    w(t, d)  = floor( idf' * tf * 22 * S
                      / (10*S*tf + 3*S + 9*dl*N) )

which is Robertson BM25 with k1=1.2, b=0.75 and avgdl = S/N after
multiplying numerator and denominator by 10*S (all operands BIGINT,
every division an exact floor — see webgraph.IDIV).  The rational idf
surrogate (N-df)/(df+1) replaces ln((N-df+0.5)/(df+0.5)) — monotone in
df, so rankings agree where idf dominates; documented, not hidden.

Shape at 10^12 docs: tokenize (narrow explode) → broadcast-join the
tiny query-term list (only matching tokens survive — the inverted-
index posting fetch) → (query, term, doc) partial-agg tf → df per term
(an agg over the already-tiny matched set) → per-(query, doc) sum →
per-query top-k window.  The only data-sized shuffle is the tf
group-by; the top-k window partitions by query_id (thousands of
groups, each already reduced to matching docs).
"""

from __future__ import annotations

from ..relational import DUCK, SPARK
from .webgraph import IDIV

QUERIES = {}


def query(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


_TOP_K = 10
_IDF_SCALE = 1000   # keeps idf'*tf*22*S < 2^63 through sf1 (N=5e5)

# (query_id, term) — terms from the corpus vocabulary; q4's term is
# absent from the corpus on purpose (the no-match path must yield no
# rows for that query, identically in both engines)
_QUERY_TERMS = [
    (0, "spark"), (0, "join"),
    (1, "dup"),
    (2, "window"), (2, "stream"), (2, "filter"),
    (3, "hash"), (3, "merge"),
    (4, "zzzabsent"),
]


def _qterms(d: str) -> str:
    vals = ", ".join("(%d, '%s')" % qt for qt in _QUERY_TERMS)
    if d == SPARK:
        return ("SELECT CAST(query_id AS BIGINT) AS query_id, term "
                "FROM VALUES %s AS t(query_id, term)" % vals)
    return ("SELECT CAST(query_id AS BIGINT) AS query_id, term "
            "FROM (VALUES %s) AS t(query_id, term)" % vals)


@query("bm25_topk")
def q_bm25_topk(d: str) -> str:
    """BM25 top-k per query (k=10), integer-exact (module docstring);
    ties broken by doc_id for full determinism."""
    if d == SPARK:
        toks = """
toks AS (
  SELECT doc_id, w FROM documents
  LATERAL VIEW explode(split(text, ' ')) t AS w
)"""
    else:
        toks = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)"""
    idf = IDIV("((SELECT n FROM stats) - f.df) * %d" % _IDF_SCALE,
               "f.df + 1")
    wgt = IDIV(
        "(%s) * m.tf * 22 * (SELECT s FROM stats)" % idf,
        "10 * (SELECT s FROM stats) * m.tf"
        " + 3 * (SELECT s FROM stats)"
        " + 9 * d.dl * (SELECT n FROM stats)")
    return """
WITH qterms AS ({qterms}),{toks},
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks
  GROUP BY doc_id
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS s
  FROM dl
),
matched AS (
  SELECT q.query_id, q.term, t.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t JOIN qterms q ON q.term = t.w
  GROUP BY q.query_id, q.term, t.doc_id
),
docfreq AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM matched GROUP BY term
),
scored AS (
  SELECT m.query_id, m.doc_id,
         CAST(SUM({wgt}) AS BIGINT) AS score_scaled
  FROM matched m
  JOIN docfreq f ON f.term = m.term
  JOIN dl d ON d.doc_id = m.doc_id
  GROUP BY m.query_id, m.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_scaled,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY score_scaled DESC, doc_id) AS BIGINT) AS rk
  FROM scored
)
SELECT query_id, doc_id, score_scaled, rk
FROM ranked WHERE rk <= {k}
""".format(qterms=_qterms(d), toks=toks.strip(), wgt=wgt, k=_TOP_K)
