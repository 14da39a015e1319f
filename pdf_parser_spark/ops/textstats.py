"""Text-analysis operators over ``documents``: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All per-row arithmetic is integer or single-expression double math —
IEEE-deterministic, so both engines emit identical values.
"""

from __future__ import annotations

from ..relational import DUCK, SPARK, AMIN, LEN, REALL, lit

QUERIES = {}


def query(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


_LANG_MARKERS = [
    ("en", r"\b(the|and|of|to|in|is|you|that)\b"),
    ("es", r"\b(el|la|los|las|de|que|en|una?)\b"),
    ("de", r"\b(der|die|das|und|ist|nicht|ein)\b"),
    ("fr", r"\b(le|les|des|est|une?|dans|pour)\b"),
]


@query("lang_id_heuristic")
def q_lang_id(d: str) -> str:
    """n-gram/stopword language ID: marker-word hit counts per
    language, argmax with fixed tie order (en>es>de>fr, then und)."""
    cols = ", ".join(
        "CAST(%s AS BIGINT) AS %s_hits"
        % (LEN(REALL("lower(text)", pat, d), d), lang)
        for lang, pat in _LANG_MARKERS
    )
    best = (
        "CASE WHEN en_hits >= es_hits AND en_hits >= de_hits "
        "AND en_hits >= fr_hits AND en_hits > 0 THEN 'en' "
        "WHEN es_hits >= de_hits AND es_hits >= fr_hits AND es_hits > 0 "
        "THEN 'es' "
        "WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de' "
        "WHEN fr_hits > 0 THEN 'fr' ELSE 'und' END"
    )
    return """
WITH hits AS (SELECT doc_id, {cols} FROM documents)
SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       {best} AS pred_lang
FROM hits
""".format(cols=cols, best=best)


@query("quality_score")
def q_quality(d: str) -> str:
    """Quality scoring: length/stopword/digit/punctuation signals
    blended into one double score (deterministic per-row math)."""
    n_tok = "CAST(%s AS BIGINT)" % LEN(REALL("text", r"\S+", d), d)
    n_stop = "CAST(%s AS BIGINT)" % LEN(
        REALL("lower(text)", r"\b(the|a|and|of|to|in|is)\b", d), d)
    n_digit = "CAST(%s AS BIGINT)" % LEN(REALL("text", r"[0-9]", d), d)
    n_punct = "CAST(%s AS BIGINT)" % LEN(REALL("text", r"[^\w\s]", d), d)
    return """
WITH feats AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS chars,
    {n_tok} AS n_tokens, {n_stop} AS n_stop,
    {n_digit} AS n_digits, {n_punct} AS n_punct
  FROM documents
)
SELECT doc_id, chars, n_tokens, n_stop, n_digits, n_punct,
  CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
  CAST(chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len,
  0.5 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
    + 0.3 * least(CAST(n_stop AS DOUBLE)
                  / CAST(n_tokens AS DOUBLE) * 4.0, 1.0)
    + 0.2 * (1.0 - least(CAST(n_digits AS DOUBLE)
                         / CAST(chars AS DOUBLE) * 10.0, 1.0))
    AS quality
FROM feats WHERE n_tokens > 0
""".format(n_tok=n_tok, n_stop=n_stop, n_digit=n_digit, n_punct=n_punct)


@query("token_stats")
def q_tokens(d: str) -> str:
    """Token counting: whitespace tokens and a BPE-ish lexer
    (letter runs | digit runs | single symbols)."""
    ws = "CAST(%s AS BIGINT)" % LEN(REALL("text", r"\S+", d), d)
    bpe = "CAST(%s AS BIGINT)" % LEN(
        REALL("text", r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", d), d)
    return """
SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
  {ws} AS ws_tokens, {bpe} AS bpe_tokens
FROM documents
""".format(ws=ws, bpe=bpe)


@query("doc_fingerprint")
def q_fingerprint(d: str) -> str:
    """Document fingerprinting: minimum 8-char shingle digest over the
    first 256 chars (winnowing-style prefix fingerprint) + distinct
    shingle count."""
    if d == SPARK:
        shingles = ("transform(sequence(1, greatest(length(prefix)-7, 1)), "
                    "i -> substring(prefix, i, 8))")
        ndist = "size(array_distinct(shingles))"
    else:
        shingles = ("[substring(prefix, i, 8) "
                    "for i in range(1, greatest(length(prefix)-7, 1)+1)]")
        ndist = "len(list_distinct(shingles))"
    return """
WITH p AS (SELECT doc_id, substring(text, 1, 256) AS prefix
           FROM documents),
sh AS (SELECT doc_id, {shingles} AS shingles FROM p)
SELECT doc_id,
  {fmin} AS fingerprint,
  CAST({ndist} AS BIGINT) AS distinct_shingles
FROM sh
""".format(shingles=shingles,
           fmin=AMIN("list_transform(shingles, s -> md5(s))"
                     if d == DUCK else "transform(shingles, s -> md5(s))",
                     d),
           ndist=ndist)
