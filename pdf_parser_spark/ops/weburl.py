"""URL canonicalization — the first operator of every Common-Crawl
pipeline: dedup/joins key on the CANONICAL url, not the crawled one.

The driver corpus has no messy URLs, so (same pattern as the dedup
tiers) each doc derives one deterministically in-plan — mixed-case
scheme/host, default ports, tracking params, fragments, trailing
slashes, all varying by doc_id so every rule branch is exercised —
then the canonicalizer runs on it:

* scheme + host lowercased;
* default port stripped (``:80`` for http, ``:443`` for https);
* fragment dropped;
* tracking params removed (``utm_*``, ``fbclid``, ``gclid``) with the
  remaining params kept in original order;
* trailing slash collapsed (except the bare root path).

Pure string/regex/array expressions → identical across engines, no
UDF.  At 10^12 rows this is a narrow per-row projection: no shuffle,
whole-stage codegen, safe to fuse with the scan.
"""

from __future__ import annotations

from ..relational import DUCK, SPARK, JOINA, lit

QUERIES = {}


def query(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


def _filter(arr: str, var: str, pred: str, d: str) -> str:
    if d == SPARK:
        return "filter(%s, %s -> %s)" % (arr, var, pred)
    return "[%s for %s in %s if %s]" % (var, var, arr, pred)


def _split(s: str, sep_re: str, d: str) -> str:
    if d == SPARK:
        return "split(%s, %s)" % (s, lit(sep_re, d))
    return "string_split_regex(%s, %s)" % (s, lit(sep_re, d))


def _rex(s: str, pattern: str, group: int, d: str) -> str:
    return "regexp_extract(%s, %s, %d)" % (s, lit(pattern, d), group)


@query("url_canonicalize")
def q_url_canonicalize(d: str) -> str:
    """Messy crawled url → canonical url (rules in module docstring)."""
    messy = (
        "CASE doc_id % 4"
        " WHEN 0 THEN 'HTTP://Example' || CAST(doc_id % 50 AS STRING)"
        "   || '.COM:80/Path/' || CAST(doc_id AS STRING)"
        "   || '/?utm_source=feed&id=' || CAST(doc_id AS STRING)"
        "   || '&fbclid=AbC123#frag'"
        " WHEN 1 THEN 'https://www.Site' || CAST(doc_id % 50 AS STRING)"
        "   || '.org:443/a//b/' || CAST(doc_id AS STRING) || '/'"
        " WHEN 2 THEN 'HTTPS://CDN.host' || CAST(doc_id % 50 AS STRING)"
        "   || '.NET/x?gclid=9&q=' || CAST(doc_id AS STRING)"
        "   || '&utm_medium=cpc&keep=1'"
        " ELSE 'http://plain' || CAST(doc_id % 50 AS STRING) || '.com/'"
        " END"
    )
    if d == DUCK:
        messy = messy.replace("AS STRING", "AS VARCHAR")
    scheme = "lower(%s)" % _rex("u", r"^([A-Za-z]+)://", 1, d)
    hostport = "lower(%s)" % _rex("u", r"^[A-Za-z]+://([^/?#]+)", 1, d)
    path = _rex("u", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1, d)
    qstr = _rex("u", r"\?([^#]*)", 1, d)
    track = r"^(utm_[^=]*|fbclid|gclid)="
    if d == SPARK:
        pred = "NOT (p = '' OR p rlike %s)" % lit(track, d)
    else:
        pred = "NOT (p = '' OR regexp_matches(p, %s))" % lit(track, d)
    kept = _filter(_split("qs", "&", d), "p", pred, d)
    host = ("CASE WHEN scheme = 'http' AND hostport LIKE '%:80'"
            " THEN substring(hostport, 1, length(hostport) - 3)"
            " WHEN scheme = 'https' AND hostport LIKE '%:443'"
            " THEN substring(hostport, 1, length(hostport) - 4)"
            " ELSE hostport END")
    norm_path = ("CASE WHEN path = '' THEN '/'"
                 " WHEN path <> '/' AND path LIKE '%/'"
                 " THEN substring(path, 1, length(path) - 1)"
                 " ELSE path END")
    return """
WITH raw AS (SELECT doc_id, {messy} AS u FROM documents),
parts AS (
  SELECT doc_id, u, {scheme} AS scheme, {hostport} AS hostport,
         {path} AS path, {qstr} AS qs
  FROM raw
),
normed AS (
  SELECT doc_id, u AS crawled_url, scheme,
    {host} AS host, {norm_path} AS norm_path,
    COALESCE({joined}, '') AS kept_query
  FROM (SELECT *, {kept} AS kept_params FROM parts) k
)
SELECT doc_id, crawled_url,
  scheme || '://' || host || norm_path
    || CASE WHEN kept_query = '' THEN '' ELSE '?' || kept_query END
    AS canonical_url
FROM normed
""".format(messy=messy, scheme=scheme, hostport=hostport, path=path,
           qstr=qstr, host=host, norm_path=norm_path, kept=kept,
           joined=JOINA("kept_params", "&", d))
