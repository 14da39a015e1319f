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
    return _canon_select(d)


def _canon_select(d: str) -> str:
    """The full canonicalizer SELECT — shared by ``url_canonicalize``
    and (as a CTE) ``url_host_filter``."""
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


# --------------------------------------------- URL blocklist filter

_BLOCKLIST = ("example7.com", "site3.org", "host11.net", "plain9.com")
_KEYWORDS = ("casino", "gambling")


@query("url_host_filter")
def q_url_host_filter(d: str) -> str:
    """UT1/RefinedWeb-style URL filtering over canonical urls: a host
    is blocked when ANY of its domain suffixes (``cdn.host11.net`` →
    ``cdn.host11.net``, ``host11.net``, ``net``) appears in the
    blocklist — the registrable-domain match every blocklist consumer
    needs — and a page is blocked when its url contains an adult/spam
    keyword (injected on doc_id %% 11 = 4 so the branch has true
    positives; 'gambling' stays a negative control).  Precedence:
    blocked_host > keyword > kept; every url emits a verdict row (the
    reason histogram is the curation dashboard — see c4_clean).

    Shape at 10^12 urls + a real 4M-entry UT1 list: the suffix chain
    explode is bounded by label count (~5), the block table is tiny →
    the suffix equi-join BROADCASTS (hash join, never a regex scan of
    the list per url), and the verdict is a per-doc left semi probe.
    Keyword LIKEs are per-row string ops fused into the scan."""
    host_rex = _rex("url", r"^[a-z]+://([^/?#]+)", 1, d)
    if d == SPARK:
        sfx = ("LATERAL VIEW explode(transform(sequence(1, size(hp)), "
               "i -> concat_ws('.', slice(hp, i, size(hp) - i + 1)))) "
               "t AS suffix")
        suffixes = ("SELECT doc_id, suffix FROM parts %s" % sfx)
        block = ("SELECT * FROM VALUES %s AS t(bad_host)"
                 % ", ".join("('%s')" % b for b in _BLOCKLIST))
        hp = "split(host, '[.]')"
    else:
        suffixes = (
            "SELECT doc_id, unnest([array_to_string(hp[i:], '.') "
            "for i in range(1, len(hp) + 1)]) AS suffix FROM parts")
        block = ("SELECT * FROM (VALUES %s) t(bad_host)"
                 % ", ".join("('%s')" % b for b in _BLOCKLIST))
        hp = "string_split(host, '.')"
    kw = " OR ".join("lower(url) LIKE '%%%s%%'" % k for k in _KEYWORDS)
    return """
WITH canon AS (
{canon}
),
pageurl AS (
  SELECT doc_id, canonical_url ||
    CASE WHEN doc_id % 11 = 4 THEN '/casino/promo' ELSE '' END AS url
  FROM canon
),
hosts AS (
  SELECT doc_id, url, {host_rex} AS host FROM pageurl
),
parts AS (SELECT doc_id, {hp} AS hp FROM hosts),
suffixes AS ({suffixes}),
block AS ({block}),
blocked AS (
  SELECT DISTINCT s.doc_id FROM suffixes s
  JOIN block b ON b.bad_host = s.suffix
)
SELECT h.doc_id, h.host, h.url,
  CASE WHEN b.doc_id IS NOT NULL THEN 0
       WHEN {kw} THEN 0 ELSE 1 END AS is_kept,
  CASE WHEN b.doc_id IS NOT NULL THEN 'blocked_host'
       WHEN {kw} THEN 'keyword' ELSE 'kept' END AS reason
FROM hosts h LEFT JOIN blocked b ON b.doc_id = h.doc_id
""".format(canon=_canon_select(d).strip(), host_rex=host_rex, hp=hp,
           suffixes=suffixes, block=block, kw=kw)


# ------------------------------------------------- rendezvous sharding

_SHARDS_A = 8      # current shard count
_SHARDS_B = 9      # after adding one shard


def _hrw_shard(n: int) -> str:
    """Rendezvous (highest-random-weight) shard pick over ``url`` for
    ``n`` shards: the argmin-by-hash shard, as ONE unrolled ``least``
    fold — each candidate is ``md5('<j>|' || url) || '<j>'`` (md5 hex
    is fixed 32 chars, so the lexicographic min is the hash min and
    the winning shard id rides behind it at position 33).  Ties are
    impossible (distinct md5 inputs).  Identical SQL in both engines;
    single-digit ids only (n ≤ 10)."""
    assert n <= 10
    cands = ", ".join("md5('%d|' || url) || '%d'" % (j, j)
                      for j in range(n))
    return "CAST(substring(least(%s), 33) AS BIGINT)" % cands


@query("shard_rendezvous")
def q_shard_rendezvous(d: str) -> str:
    """Rendezvous-hash shard assignment with the minimal-movement
    guarantee (Thaler & Ravishankar '98 HRW — what consistent hashing
    gives a crawler/output-writer WITHOUT a central ring): each url is
    assigned under {a} shards and under {b}, and the movement matrix
    (shard_a, shard_b, moved, n_urls) is rolled up.  HRW's defining
    property — a key moves ONLY INTO the new shard, never between old
    shards (its per-shard hashes don't change; a new minimum can only
    come from the new candidate) — is what makes incremental scale-out
    of a 10^12-row bucketed layout cheap: ~1/{b} of keys move, the
    rest of the layout is untouched.

    Shape at 10^12 pages: the assignment is a pure per-row projection
    (an unrolled ``least`` over {b} md5s — no explode, no per-key
    shuffle, whole-stage codegen fuses it into the scan); the only
    shuffle is the final {a}x{b}-cell rollup, which partial-aggs
    map-side to at most {a}*{b} rows per partition."""
    url = "'https://h' || {h} || '.example/p' || {did}"
    if d == SPARK:
        url = url.format(h="CAST(doc_id % 40 AS STRING)",
                         did="CAST(doc_id AS STRING)")
    else:
        url = url.format(h="CAST(doc_id % 40 AS VARCHAR)",
                         did="CAST(doc_id AS VARCHAR)")
    return """
WITH urls AS (SELECT {url} AS url FROM documents),
assign AS (
  SELECT url, {sa} AS shard_a, {sb} AS shard_b FROM urls
)
SELECT shard_a, shard_b,
  CASE WHEN shard_a <> shard_b THEN 1 ELSE 0 END AS moved,
  CAST(COUNT(*) AS BIGINT) AS n_urls
FROM assign GROUP BY shard_a, shard_b
""".format(url=url, sa=_hrw_shard(_SHARDS_A), sb=_hrw_shard(_SHARDS_B))


q_shard_rendezvous.__doc__ = q_shard_rendezvous.__doc__.format(
    a=_SHARDS_A, b=_SHARDS_B)


# -------------------------------------------- redirect chain resolve

_RR_ROUNDS = 3   # pointer-doubling rounds: resolves chains <= 2^3 hops


@query("redirect_resolve")
def q_redirect_resolve(d: str) -> str:
    """Redirect-chain resolution by POINTER DOUBLING (Wyllie's
    list-ranking technique — the O(log L) alias-resolution pass a
    crawler runs so every fetched URL keys its CANONICAL terminal,
    not an intermediate 301): round k maps f(u) ← f(f(u)) with one
    self-equi-join, so after r rounds every chain of ≤ 2^r hops is
    fully resolved.  Sequential chasing needs L joins for an L-hop
    chain; doubling needs ⌈log2 L⌉ — the difference between 60 and 6
    shuffles on the 60-hop chains real link farms build.

    The synthetic redirect corpus (doc_id blocks of 8: position p
    redirects one step down, block heads are terminal) has chains up
    to 7 hops — exercising ALL {r} rounds — plus mutual 301 pairs
    (doc_id % 97 ∈ {{95, 96}}), the redirect-LOOP class a resolver
    must flag rather than chase: a 2-cycle is pointer-doubling's
    fixed point, so loops are detected by the canonical STILL having
    an outgoing redirect (terminals never do).

    Output per url: canonical url, exact accumulated hop count, and
    the resolved/loop verdict.  Shape at 10^12 urls: r self-joins on
    the id key, hop counts ride the same rows; no window, no driver
    state."""
    from .webgraph import CSTR

    nxt = ("CASE WHEN doc_id % 97 = 95 THEN doc_id + 1 "
           "WHEN doc_id % 97 = 96 THEN doc_id - 1 "
           "WHEN doc_id % 8 <> 0 THEN doc_id - 1 "
           "ELSE NULL END")

    def url_of(col: str) -> str:
        return "'https://h' || %s || '.example/r' || %s" % (
            CSTR("%s %% 40" % col, d), CSTR(col, d))
    parts = ["""
nodes AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT doc_id AS id, CAST({nxt} AS BIGINT) AS nxt
  FROM documents WHERE {nxt} IS NOT NULL
),
f0 AS (
  SELECT n.id, COALESCE(e.nxt, n.id) AS ptr,
         CAST(CASE WHEN e.nxt IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS hops
  FROM nodes n LEFT JOIN edges e ON e.id = n.id
)""".format(nxt=nxt).strip()]
    # LEFT join: a redirect target absent from the corpus (a dangling
    # 301 at the corpus boundary) resolves to itself instead of
    # silently dropping the source row
    tpl = """
f{r1} AS (
  SELECT a.id, COALESCE(b.ptr, a.ptr) AS ptr,
         a.hops + COALESCE(b.hops, 0) AS hops
  FROM f{r} a LEFT JOIN f{r} b ON b.id = a.ptr
)"""
    for r in range(_RR_ROUNDS):
        parts.append(tpl.format(r=r, r1=r + 1).strip())
    return """
WITH {parts}
SELECT {u} AS url,
  {cu} AS canonical_url,
  f.hops AS n_hops,
  CASE WHEN e2.id IS NULL THEN 'resolved' ELSE 'loop' END AS verdict
FROM f{k} f
LEFT JOIN edges e2 ON e2.id = f.ptr
""".format(parts=",\n".join(parts), u=url_of("f.id"),
           cu=url_of("f.ptr"), k=_RR_ROUNDS)


q_redirect_resolve.__doc__ = (q_redirect_resolve.__doc__ or "").format(
    r=_RR_ROUNDS)


# --------------------------------------------- head-metadata extraction

@query("html_meta_extract")
def q_html_meta_extract(d: str) -> str:
    """Head-metadata extraction + the indexability gate — the WAT-style
    metadata pass every web-curation pipeline runs beside main-content
    extraction: pull ``<title>``, the description ``<meta>``, the
    canonical ``<link>``, the ``<html lang>`` attribute, and the
    robots ``noindex`` directive, then keep only docs that are
    indexable at their own URL (no noindex, and no canonical pointing
    off-host — those rows are duplicates of the canonical target and
    must not enter the corpus twice).

    The corpus has no markup, so each doc synthesizes its head
    in-plan: title from the doc's own text, a description meta whose
    ATTRIBUTE ORDER flips on every 3rd doc (``content=`` before
    ``name=`` — real-world HTML does both, the extractor must too),
    an ``og:title`` decoy the title regex must not match, a canonical
    link that is self on ``doc_id%4=1`` and CROSS-HOST on
    ``doc_id%4=2``, and a ``noindex`` robots meta on ``doc_id%7=3``.

    Shape at 10^12 pages: a narrow per-row regexp projection — no
    shuffle, no UDF, whole-stage-codegen regexp on the JVM; the gate
    is a per-row boolean.  At real scale this reads the ``html``
    payload column once alongside the main-content pass."""
    from ..relational import RLIKE, TRIMS
    from .webgraph import CSTR, HOST

    own = HOST("doc_id % 40", d)
    did = CSTR("doc_id", d)
    t24 = TRIMS("substr(text, 1, 24)", d)
    canon_host = ("CASE doc_id % 4 WHEN 1 THEN " + own +
                  " WHEN 2 THEN " + HOST("(doc_id + 17) % 40", d) +
                  " ELSE '' END")
    head = (
        "'<html lang=\"' || lang || '\"><head>'"
        " || '<meta property=\"og:title\" content=\"OG ' || {did} || '\">'"
        " || '<title>' || {t24} || '</title>'"
        " || CASE WHEN doc_id % 3 = 0"
        "      THEN '<meta content=\"Doc ' || {did} || ' in ' || lang"
        "        || '\" name=\"description\">'"
        "      ELSE '<meta name=\"description\" content=\"Doc ' || {did}"
        "        || ' in ' || lang || '\">' END"
        " || CASE WHEN chost <> ''"
        "      THEN '<link rel=\"canonical\" href=\"https://' || chost"
        "        || '/c' || {did} || '\">' ELSE '' END"
        " || CASE WHEN doc_id % 7 = 3"
        "      THEN '<meta name=\"robots\" content=\"noindex,nofollow\">'"
        "      ELSE '' END"
        " || '</head>'"
    ).format(did=did, t24=t24)
    title = "regexp_extract(html, '<title>([^<]*)</title>', 1)"
    desc_nf = ("regexp_extract(html,"
               " '<meta name=\"description\" content=\"([^\"]*)\"', 1)")
    desc_cf = ("regexp_extract(html,"
               " '<meta content=\"([^\"]*)\" name=\"description\"', 1)")
    descr = ("CASE WHEN %s <> '' THEN %s ELSE %s END"
             % (desc_nf, desc_nf, desc_cf))
    canonical = ("lower(regexp_extract(html,"
                 " '<link rel=\"canonical\" href=\"https://([^/\"]+)', 1))")
    noindex = ("CASE WHEN %s THEN 1 ELSE 0 END"
               % RLIKE("html", '<meta name="robots" content="[^"]*noindex',
                       d))
    lang_attr = "regexp_extract(html, '<html lang=\"([^\"]*)\"', 1)"
    return """
WITH pages AS (
  SELECT doc_id, {own} AS own_host, {head} AS html
  FROM (SELECT doc_id, text, lang, {canon} AS chost FROM documents) s
),
meta AS (
  SELECT doc_id, own_host,
         {title} AS title,
         {descr} AS description,
         {lang_attr} AS lang_attr,
         {canonical} AS canonical_host,
         CAST({noindex} AS INT) AS noindex
  FROM pages
)
SELECT doc_id, title, description, lang_attr, canonical_host, noindex,
  CAST(CASE WHEN noindex = 0
            AND (canonical_host = '' OR canonical_host = own_host)
       THEN 1 ELSE 0 END AS INT) AS indexable
FROM meta
""".format(own=own, head=head, canon=canon_host, title=title,
           descr=descr, lang_attr=lang_attr, canonical=canonical,
           noindex=noindex)


@query("headings_outline")
def q_headings_outline(d: str) -> str:
    """Document-outline extraction — the structure pass beside
    main-content extraction: pull every ``<h1>``-``<h3>`` heading in
    document order and assign each its PARENT heading (the nearest
    preceding heading of a strictly lower level; -1 at the top).  The
    outline is what section-aware chunkers key on (headings carry the
    topic labels each chunk inherits) and what snippet titles come
    from.

    The corpus has no markup, so each doc synthesizes a body in-plan
    (same pattern as html_meta_extract): an h1 from the doc's own
    text, two h2 sections, an h3 detail block on ``doc_id%3=0``
    (doubled on ``doc_id%5=2``), an EMPTY h2 on ``doc_id%7=1`` (the
    empty-heading edge real HTML serves), and an ``<h4>`` decoy the
    h1-h3 outline must skip.

    Shape at 10^12 pages: a narrow per-row regexp projection (no
    shuffle, JVM codegen) feeding a positional explode; the parent
    join is headings-to-headings WITHIN one document — fan-in
    #headings^2 per doc, single digits — and never crosses documents,
    so it rides the existing doc partitioning."""
    from ..relational import TRIMS
    from .webgraph import CSTR

    did = CSTR("doc_id", d)
    t12 = TRIMS("substr(text, 1, 12)", d)
    body = (
        "'<h1>' || {t12} || '</h1><p>intro</p>'"
        " || '<h2>Part A ' || {did} || '</h2><p>a</p>'"
        " || CASE WHEN doc_id % 3 = 0"
        "      THEN '<h3>Detail A1 ' || {did} || '</h3><p>d</p>'"
        "        || CASE WHEN doc_id % 5 = 2"
        "             THEN '<h3>Detail A2</h3><p>e</p>' ELSE '' END"
        "      ELSE '' END"
        " || '<h4>not in outline</h4>'"
        " || CASE WHEN doc_id % 7 = 1 THEN '<h2></h2>' ELSE '' END"
        " || '<h2>Part B</h2><p>b</p>'"
    ).format(did=did, t12=t12)
    pat = "'<h[1-3]>[^<]*</h[1-3]>'"
    if d == SPARK:
        hs = """
hs AS (
  SELECT doc_id, pos, m FROM pages
  LATERAL VIEW posexplode(regexp_extract_all(html, {pat}, 0)) t AS pos, m
)""".format(pat=pat).strip()
    else:
        hs = """
hs AS (
  SELECT doc_id, generate_subscripts(ms, 1) - 1 AS pos, unnest(ms) AS m
  FROM (SELECT doc_id, regexp_extract_all(html, {pat}) AS ms
        FROM pages) s
)""".format(pat=pat).strip()
    return """
WITH pages AS (
  SELECT doc_id, {body} AS html FROM documents
),
{hs},
hh AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS heading_no,
         CAST(regexp_extract(m, '<h([1-3])>', 1) AS BIGINT) AS level,
         regexp_extract(m, '<h[1-3]>([^<]*)</h', 1) AS heading
  FROM hs
)
SELECT a.doc_id, a.heading_no, a.level, a.heading,
       CAST(COALESCE(MAX(b.heading_no), -1) AS BIGINT) AS parent_no
FROM hh a LEFT JOIN hh b
  ON b.doc_id = a.doc_id AND b.heading_no < a.heading_no
 AND b.level < a.level
GROUP BY a.doc_id, a.heading_no, a.level, a.heading
""".format(body=body, hs=hs)


def _gsub(s: str, pat: str, rep: str, d: str) -> str:
    """Dialect regexp_replace-all.  ``rep`` uses Java-style ``$1``
    group refs; converted to RE2 ``\\1`` for DuckDB.  Replacement
    strings may embed REAL newline characters — both parsers accept
    raw newlines inside single-quoted literals."""
    if d == SPARK:
        return "regexp_replace(%s, %s, '%s')" % (s, lit(pat, d), rep)
    return "regexp_replace(%s, %s, '%s', 'g')" % (
        s, lit(pat, d), rep.replace("$", "\\"))


@query("html_to_markdown")
def q_html_to_markdown(d: str) -> str:
    """Structure-preserving extraction — HTML → Markdown, the modern
    training-data target beside plain main-content text (engine twin:
    ``pdfio.html_extract.html_to_markdown``, differential-pinned in
    tests/test_relational.py on identically-synthesized bodies).

    The corpus has no markup, so each doc synthesizes a structured
    body in-plan (same pattern as headings_outline): an h1, a
    paragraph exercising ALL inline forms (strong, em around a
    text-derived slug, a link), a ul whose third item appears on
    ``doc_id%3=0``, an ol on ``doc_id%4=1``, a blockquote on
    ``doc_id%5=2``, and a trailing code-span paragraph.  The markdown
    conversion is then a fixed chain of regexp_replace rewrites —
    inline marks first, then the list/quote/heading/paragraph block
    forms, each block ending in one blank line, trailing whitespace
    trimmed.

    Shape at 10^12 pages: a narrow per-row regexp-projection — no
    shuffle, no UDF, whole-stage codegen end to end; safe to fuse
    with the scan (at production width the same chain runs over the
    real ``html`` column)."""
    from .webgraph import CSTR

    did = CSTR("doc_id", d)
    slug_raw = _gsub(
        _gsub("substr(text, 1, 12)", "[^A-Za-z0-9 ]", "", d),
        " +", " ", d)
    slug = ("CASE WHEN trim(%s) = '' THEN 'plain' ELSE trim(%s) END"
            % (slug_raw, slug_raw))
    body = (
        "'<h1>Doc ' || {did} || '</h1>'"
        " || '<p>Intro <strong>bold ' || {did} || '</strong> and <em>'"
        " || {slug} || '</em> text with a"
        " <a href=\"https://ex.org/d' || {did} || '\">link '"
        " || {did} || '</a>.</p>'"
        " || '<ul><li>alpha ' || {did} || '</li><li>beta</li>'"
        " || CASE WHEN doc_id % 3 = 0 THEN '<li>gamma</li>' ELSE '' END"
        " || '</ul>'"
        " || CASE WHEN doc_id % 4 = 1"
        "      THEN '<ol><li>first ' || {did} || '</li>"
        "<li>second</li></ol>' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 2"
        "      THEN '<blockquote>note ' || {did} || '</blockquote>'"
        "      ELSE '' END"
        " || '<p>tail <code>v_' || {did} || '</code></p>'"
    ).format(did=did, slug=slug)
    md = "html"
    md = _gsub(md, "<strong>([^<]*)</strong>", "**$1**", d)
    md = _gsub(md, "<em>([^<]*)</em>", "*$1*", d)
    md = _gsub(md, "<code>([^<]*)</code>", "`$1`", d)
    md = _gsub(md, '<a href="([^"]*)">([^<]*)</a>', "[$2]($1)", d)
    md = _gsub(md, "<ol><li>([^<]*)</li><li>([^<]*)</li></ol>",
               "1. $1\n2. $2\n\n", d)
    md = _gsub(md, "<li>([^<]*)</li>", "- $1\n", d)
    md = _gsub(md, "<ul>", "", d)
    md = _gsub(md, "</ul>", "\n", d)
    md = _gsub(md, "<blockquote>([^<]*)</blockquote>", "> $1\n\n", d)
    md = _gsub(md, "<h1>([^<]*)</h1>", "# $1\n\n", d)
    md = _gsub(md, "</p>", "\n\n", d)
    md = _gsub(md, "<p>", "", d)
    md = _gsub(md, r"\s+$", "", d)   # rtrim is space-only in both
    # one output column on purpose: a sibling md_chars=length(md)
    # would make CollapseProject inline (and so evaluate) the whole
    # 13-deep regexp chain twice — the hash check covers the string
    return """
WITH pages AS (
  SELECT doc_id, {body} AS html FROM documents
)
SELECT doc_id, {md} AS markdown
FROM pages
""".format(body=body, md=md)


@query("html_table_extract")
def q_html_table_extract(d: str) -> str:
    """Structured-data extraction — HTML tables to cell grids, the
    live analogue of the reference's dead ``extract_tables``
    (parsers/base.py:46-50: declared for PDFs, never called; HTML
    tables are where the tabular payload actually lives at web
    scale).  Engine twin: ``pdfio.html_extract.extract_html_tables``
    (stack parser, nested-table flattening), differential-pinned on
    identically-synthesized bodies.

    Each doc synthesizes a header row + ``1 + doc_id%4`` data rows,
    plus a second one-row table on ``doc_id%5=3`` (multi-table
    ordering), a ``<th>``-vs-``<td>`` seam in row 0, and an EMPTY
    cell every ``r+c ≡ 0 (mod 3)`` on data rows.  Extraction is
    generic: non-greedy table → row scans, group-extracted cells —
    NOT shaped to the fixture.

    Shape at 10^12 pages: three chained Generate stages over a
    per-row projection — no shuffle, no UDF; the grid coordinates
    (table_no, row_no, col_no) come from explode positions, so no
    window is needed."""
    from .webgraph import CSTR

    did = CSTR("doc_id", d)
    cell = ("CASE WHEN (r + c) % 3 = 0 THEN ''"
            " ELSE 'r' || CAST(r AS STRING) || 'c' || CAST(c AS STRING)"
            " || '_' || {did} END").format(did=did)
    if d != SPARK:
        cell = cell.replace("AS STRING", "AS VARCHAR")
    # data rows assembled from sequences so the row COUNT varies by doc
    datarows = (
        "array_join(transform(sequence(1, 1 + CAST(doc_id % 4 AS INT)),"
        " r -> concat('<tr>', concat_ws('', transform(sequence(1, 3),"
        " c -> concat('<td>', {cell}, '</td>'))), '</tr>')), '')"
    ).format(cell=cell) if d == SPARK else (
        "array_to_string([ '<tr>' || array_to_string([ '<td>' || {cell}"
        " || '</td>' for c in range(1, 4)], '') || '</tr>'"
        " for r in range(1, 2 + CAST(doc_id % 4 AS INT))], '')"
    ).format(cell=cell)
    body = (
        "'<p>pre</p><table><tr><th>H1</th><th>H2</th><th>H3</th></tr>'"
        " || {rows} || '</table>'"
        " || CASE WHEN doc_id % 5 = 3"
        "      THEN '<table><tr><td>solo ' || {did} || '</td></tr></table>'"
        "      ELSE '' END"
    ).format(rows=datarows, did=did)
    tpat = lit("<table>.*?</table>", d)
    rpat = lit("<tr>.*?</tr>", d)
    cpat = lit("<t[dh]>([^<]*)</t[dh]>", d)
    if d == SPARK:
        lvl = """
tabs AS (
  SELECT doc_id, tno, tb FROM pages
  LATERAL VIEW posexplode(regexp_extract_all(html, {tpat}, 0)) t AS tno, tb
),
trs AS (
  SELECT doc_id, tno, rno, tr FROM tabs
  LATERAL VIEW posexplode(regexp_extract_all(tb, {rpat}, 0)) t AS rno, tr
),
cells AS (
  SELECT doc_id, tno, rno, cno, cell FROM trs
  LATERAL VIEW posexplode(regexp_extract_all(tr, {cpat}, 1)) t AS cno, cell
)""".format(tpat=tpat, rpat=rpat, cpat=cpat).strip()
    else:
        lvl = """
tabs AS (
  SELECT doc_id, generate_subscripts(ts, 1) - 1 AS tno, unnest(ts) AS tb
  FROM (SELECT doc_id, regexp_extract_all(html, {tpat}) AS ts FROM pages) q
),
trs AS (
  SELECT doc_id, tno, generate_subscripts(rs, 1) - 1 AS rno, unnest(rs) AS tr
  FROM (SELECT doc_id, tno, regexp_extract_all(tb, {rpat}) AS rs FROM tabs) q
),
cells AS (
  SELECT doc_id, tno, rno, generate_subscripts(cs, 1) - 1 AS cno,
         unnest(cs) AS cell
  FROM (SELECT doc_id, tno, rno,
               regexp_extract_all(tr, {cpat}, 1) AS cs FROM trs) q
)""".format(tpat=tpat, rpat=rpat, cpat=cpat).strip()
    return """
WITH pages AS (
  SELECT doc_id, {body} AS html FROM documents
),
{lvl}
SELECT doc_id, CAST(tno AS BIGINT) AS table_no,
       CAST(rno AS BIGINT) AS row_no, CAST(cno AS BIGINT) AS col_no,
       cell,
       CAST(CASE WHEN rno = 0 AND tno = 0 THEN 1 ELSE 0 END AS INT)
         AS is_header
FROM cells
""".format(body=body, lvl=lvl)


# --------------------------------------- JSON-LD structured data

def _jsonex(js: str, path: str, d: str) -> str:
    """Dialect-paired JSON string extraction — both engines return the
    string value (numbers as their literal text) and NULL on a missing
    path, verified for the ``$.@type`` and nested ``$.a.b`` shapes."""
    fn = "get_json_object" if d == SPARK else "json_extract_string"
    return "%s(%s, '%s')" % (fn, js, path)


@query("jsonld_extract")
def q_jsonld_extract(d: str) -> str:
    """Schema.org JSON-LD extraction — the structured-data pass beside
    the WAT metadata pass: pull the ``<script type="application/
    ld+json">`` payload and project the fields a knowledge/commerce
    pipeline keys on (@type, headline/name, author.name, offers.price,
    datePublished), engine-side JSON path evaluation (get_json_object
    / json_extract_string), no UDF.

    The corpus has no markup, so each doc synthesizes its page
    in-plan: doc_id%3=0 embeds an Article (nested author object),
    %3=1 a Product (nested offers object), %3=2 no JSON-LD at all —
    and EVERY page carries a plain-JS decoy script containing
    "@type" that the ld+json regex must not match.  All three schema
    branches and the no-data path are oracle-checked.

    Shape at 10^12 pages: one non-greedy regexp_extract + four JSON
    path evaluations per row — a narrow projection fused into the
    scan, no shuffle, no UDF."""
    from .webgraph import CSTR

    did = CSTR("doc_id", d)
    pad2 = ("lpad(" + CSTR("(doc_id % 12) + 1", d) + ", 2, '0')",
            "lpad(" + CSTR("(doc_id % 28) + 1", d) + ", 2, '0')")
    article = (
        "'{\"@context\":\"https://schema.org\",\"@type\":\"Article\","
        "\"headline\":\"Doc ' || %s || ' headline\","
        "\"datePublished\":\"2024-' || %s || '-' || %s || '\","
        "\"author\":{\"@type\":\"Person\",\"name\":\"Author '"
        " || %s || '\"}}'"
    ) % (did, pad2[0], pad2[1], CSTR("doc_id % 7", d))
    product = (
        "'{\"@context\":\"https://schema.org\",\"@type\":\"Product\","
        "\"name\":\"Widget ' || %s || '\","
        "\"offers\":{\"@type\":\"Offer\",\"price\":\"'"
        " || %s || '.50\",\"priceCurrency\":\"USD\"}}'"
    ) % (did, CSTR("(doc_id % 90) + 10", d))
    decoy = ("'<script type=\"text/javascript\">var x = "
             "{\"@type\": \"Fake\"};</script>'")
    ld = ("CASE CAST(doc_id % 3 AS INT)"
          " WHEN 0 THEN '<script type=\"application/ld+json\">'"
          "   || " + article + " || '</script>'"
          " WHEN 1 THEN '<script type=\"application/ld+json\">'"
          "   || " + product + " || '</script>'"
          " ELSE '' END")
    body = ("'<html><head>' || " + decoy + " || " + ld +
            " || '</head><body>'"
            " || substr(text, 1, 40) || '</body></html>'")
    js = ("regexp_extract(html,"
          " '<script type=\"application/ld\\\\+json\">(.*?)</script>',"
          " 1)" if d == SPARK else
          "regexp_extract(html,"
          " '<script type=\"application/ld\\+json\">(.*?)</script>',"
          " 1)")
    return """
WITH pages AS (
  SELECT doc_id, {body} AS html FROM documents
),
blob AS (
  SELECT doc_id, CASE WHEN {js} <> '' THEN {js} END AS js FROM pages
)
SELECT doc_id,
  {t} AS ld_type,
  COALESCE({h}, {n}) AS title,
  {a} AS author,
  {p} AS price,
  {dp} AS published,
  CAST(CASE WHEN js IS NULL THEN 0 ELSE 1 END AS INT) AS has_jsonld
FROM blob
""".format(body=body, js=js,
           t=_jsonex("js", "$.@type", d),
           h=_jsonex("js", "$.headline", d),
           n=_jsonex("js", "$.name", d),
           a=_jsonex("js", "$.author.name", d),
           p=_jsonex("js", "$.offers.price", d),
           dp=_jsonex("js", "$.datePublished", d))


@query("hreflang_alternates")
def q_hreflang_alternates(d: str) -> str:
    """Multilingual-variant mapping from ``hreflang`` alternate links
    — the pass that keeps one language edition per document cluster
    out of the training mix (and routes the rest to their language
    shards): every ``<link rel="alternate" hreflang=..>`` in the head
    names a sibling edition; self-references and the ``x-default``
    pointer are classified so the dedup tier can collapse the cluster
    onto its canonical member.

    The corpus has no markup, so each doc synthesizes its head
    in-plan (same pattern as html_meta_extract): a self-referencing
    alternate in the doc's own language, an ``en`` sibling on even
    docs, a ``de`` sibling on every 3rd, an ``x-default`` on every
    5th, an ATTRIBUTE-ORDER-FLIPPED ``fr`` alternate on ``doc_id%4=1``
    (``hreflang`` before ``rel`` — real head markup does both, so the
    extractor parses per-tag attributes instead of one rigid regex),
    and stylesheet/canonical ``<link>`` decoys that must not emit.

    Shape at 10^12 pages: one per-row regexp projection feeding a
    positional explode of ``<link ...>`` tags; attribute extraction
    and the alternate filter are per-tag scalar regexps (JVM codegen,
    no shuffle except the final per-doc ROW_NUMBER, which rides the
    existing doc partitioning)."""
    from .webgraph import CSTR, HOST

    did = CSTR("doc_id", d)
    own = HOST("doc_id % 40", d)
    head = (
        "'<link rel=\"stylesheet\" href=\"https://cdn.example/s.css\">'"
        " || '<link rel=\"alternate\" hreflang=\"' || lang"
        " || '\" href=\"https://' || own_host || '/d' || {did} || '\">'"
        " || CASE WHEN doc_id % 2 = 0"
        "      THEN '<link rel=\"alternate\" hreflang=\"en\""
        " href=\"https://' || {en} || '/d' || {did} || '\">'"
        "      ELSE '' END"
        " || CASE WHEN doc_id % 4 = 1"
        "      THEN '<link hreflang=\"fr\" rel=\"alternate\""
        " href=\"https://' || {fr} || '/d' || {did} || '\">'"
        "      ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0"
        "      THEN '<link rel=\"alternate\" hreflang=\"de\""
        " href=\"https://' || {de} || '/d' || {did} || '\">'"
        "      ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0"
        "      THEN '<link rel=\"alternate\" hreflang=\"x-default\""
        " href=\"https://' || own_host || '/d' || {did} || '\">'"
        "      ELSE '' END"
        " || '<link rel=\"canonical\" href=\"https://' || own_host"
        " || '/d' || {did} || '\">'"
    ).format(did=did, en=HOST("(doc_id + 7) % 40", d),
             fr=HOST("(doc_id + 11) % 40", d),
             de=HOST("(doc_id + 23) % 40", d))
    pat = "'<link [^>]*>'"
    if d == SPARK:
        tags = """
tags AS (
  SELECT doc_id, own_host, pos, tag FROM pages
  LATERAL VIEW posexplode(regexp_extract_all(html, {pat}, 0)) t
    AS pos, tag
)""".format(pat=pat).strip()
    else:
        tags = """
tags AS (
  SELECT doc_id, own_host, generate_subscripts(ms, 1) - 1 AS pos,
         unnest(ms) AS tag
  FROM (SELECT doc_id, own_host, regexp_extract_all(html, {pat}) AS ms
        FROM pages) s
)""".format(pat=pat).strip()
    return """
WITH pages AS (
  SELECT doc_id, lang, {own} AS own_host, {head} AS html
  FROM (SELECT doc_id, lang, {own} AS own_host FROM documents) s
),
{tags},
alts AS (
  SELECT doc_id, own_host, pos,
    regexp_extract(tag, 'hreflang="([^"]*)"', 1) AS hreflang,
    lower(regexp_extract(tag, 'href="https://([^/"]+)', 1))
      AS target_host
  FROM tags
  WHERE regexp_extract(tag, 'rel="([^"]*)"', 1) = 'alternate'
    AND regexp_extract(tag, 'hreflang="([^"]*)"', 1) <> ''
)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1
       AS BIGINT) AS link_no,
  hreflang, target_host,
  CAST(CASE WHEN target_host = own_host THEN 1 ELSE 0 END AS INT)
    AS is_self,
  CAST(CASE WHEN hreflang = 'x-default' THEN 1 ELSE 0 END AS INT)
    AS is_default
FROM alts
""".format(own=own, head=head, tags=tags)


# -------------------------------------- public-suffix registered domain

# Embedded public-suffix rule subset (publicsuffix.org semantics):
# normal rules name a public suffix outright; a wildcard rule
# ``*.ck`` makes EVERY two-label suffix ending in .ck public; an
# exception rule ``!www.ck`` carves one name back out (www.ck is a
# registrable domain, its suffix is the plain ck).  ps_len is the
# public suffix's label count under that rule; exception beats
# wildcard/normal (PSL §Algorithm step: exception rules win).
_PSL_RULES = [
    # (rule, kind, ps_len)
    ("com", "normal", 1), ("org", "normal", 1), ("net", "normal", 1),
    ("io", "normal", 1), ("uk", "normal", 1), ("au", "normal", 1),
    ("tldx_absent", "normal", 1),   # placeholder; tldx hits the default
    ("co.uk", "normal", 2), ("ac.uk", "normal", 2),
    ("com.au", "normal", 2),
    ("github.io", "normal", 2),     # private-section entry: grouping
                                    # still keys one label deeper
    ("ck", "wildcard", 2),          # *.ck
    ("www.ck", "exception", 1),     # !www.ck
]


@query("registered_domain")
def q_registered_domain(d: str) -> str:
    """Public-suffix-list registered-domain (eTLD+1) extraction — the
    key every crawl-politeness budget, domain-mixing weight, and
    per-site dedup tier SHOULD group on (grouping on host splits one
    site into thousands of subdomains; grouping on the bare TLD fuses
    unrelated sites; ``site.co.uk``-style multi-label suffixes break
    naive "last two labels" splitting).

    Semantics are the publicsuffix.org algorithm over an embedded
    rule subset (normal + wildcard ``*.ck`` + exception ``!www.ck``
    + the implicit default ``*`` for unlisted TLDs): the public
    suffix is the longest matching rule (exceptions override), the
    registered domain is one label deeper, and a host that IS a
    public suffix registers NULL.

    Shape at 10^12 rows: label-suffix candidates (j = 1..2, the max
    rule depth) joined against a ~10^4-row broadcast rule dim — the
    OR-match is a BroadcastNestedLoopJoin over a tiny side, then one
    hash-agg per host; no shuffle touches the payload.  Hosts are
    synthesized in-plan over eight suffix families so every rule
    kind (incl. the host-is-suffix NULL edge) is exercised."""
    from ..relational import LEN, SLICE
    from .webgraph import CSTR

    host = (
        "CASE doc_id % 8"
        " WHEN 0 THEN 'www.site' || {k20} || '.com'"
        " WHEN 1 THEN 'a.b.site' || {k20} || '.co.uk'"
        " WHEN 2 THEN 'cdn.app' || {k15} || '.github.io'"
        " WHEN 3 THEN 'shop.mall' || {k10} || '.com.au'"
        " WHEN 4 THEN 'x.y' || {k5} || '.ck'"
        " WHEN 5 THEN 'sub' || {k3} || '.www.ck'"
        " WHEN 6 THEN 'weird' || {k7} || '.tldx'"
        " ELSE 'co.uk' END"
    ).format(k20=CSTR("doc_id % 20", d), k15=CSTR("doc_id % 15", d),
             k10=CSTR("doc_id % 10", d), k5=CSTR("doc_id % 5", d),
             k3=CSTR("doc_id % 3", d), k7=CSTR("doc_id % 7", d))
    rules = ", ".join("('%s', '%s', %d)" % r for r in _PSL_RULES)
    if d == SPARK:
        split = "split(host, '[.]')"
        rules_cte = ("rules AS (SELECT * FROM VALUES %s"
                     " AS t(rule, kind, ps_len))" % rules)
    else:
        split = "string_split(host, '.')"
        rules_cte = ("rules AS (SELECT * FROM (VALUES %s)"
                     " AS t(rule, kind, ps_len))" % rules)
    lastj = JOINA(SLICE("labels", "n - j + 1", "j", d), ".", d)
    last1 = JOINA(SLICE("labels", "n", "1", d), ".", d)
    reg = JOINA(SLICE("labels", "n - ps_len", "ps_len + 1", d), ".", d)
    ps = JOINA(SLICE("labels", "n - ps_len + 1", "ps_len", d), ".", d)
    return """
WITH {rules_cte},
hosts AS (
  SELECT DISTINCT {host} AS host FROM documents
),
lab AS (
  SELECT host, labels, CAST({n} AS BIGINT) AS n
  FROM (SELECT host, {split} AS labels FROM hosts) s
),
cand AS (
  SELECT host, n, j, {lastj} AS suffix, {last1} AS tail1
  FROM lab {expl}
  WHERE j <= n
),
matched AS (
  SELECT c.host,
    MAX(CASE WHEN r.kind = 'exception' THEN r.ps_len END) AS exc_ps,
    MAX(CASE WHEN r.kind = 'normal' THEN r.ps_len END) AS norm_ps,
    MAX(CASE WHEN r.kind = 'wildcard' THEN r.ps_len END) AS wild_ps
  FROM cand c JOIN rules r
    ON (r.kind = 'normal' AND r.rule = c.suffix)
    OR (r.kind = 'exception' AND r.rule = c.suffix)
    OR (r.kind = 'wildcard' AND c.j = 2 AND r.rule = c.tail1)
  GROUP BY c.host
),
resolved AS (
  SELECT l.host, l.labels, l.n,
    CAST(COALESCE(m.exc_ps,
                  GREATEST(COALESCE(m.norm_ps, 1),
                           COALESCE(m.wild_ps, 1))) AS BIGINT)
      AS ps_len,
    CASE WHEN m.exc_ps IS NOT NULL THEN 'exception'
         WHEN COALESCE(m.wild_ps, 0) > COALESCE(m.norm_ps, 0)
           THEN 'wildcard'
         WHEN m.norm_ps IS NOT NULL THEN 'normal'
         ELSE 'default' END AS rule_kind
  FROM lab l LEFT JOIN matched m ON m.host = l.host
)
SELECT host, {ps} AS public_suffix,
  CASE WHEN n > ps_len THEN {reg} ELSE NULL END AS registered_domain,
  rule_kind
FROM resolved
""".format(rules_cte=rules_cte, host=host, split=split,
           n=LEN("labels", d), lastj=lastj, last1=last1,
           reg=reg, ps=ps,
           expl=("LATERAL VIEW explode(sequence(1, 2)) t AS j"
                 if d == SPARK else
                 "CROSS JOIN (SELECT unnest(range(1, 3)) AS j) t"))


# ------------------------------------------------ social-card assembly

@query("opengraph_cards")
def q_opengraph_cards(d: str) -> str:
    """Social-card assembly with the real fallback chain every link
    unfurler runs: title from ``og:title``, else ``twitter:title``,
    else the ``<title>`` tag; description from ``og:description``,
    else the description ``<meta>``; image presence from
    ``og:image``.  The SOURCE of each field is emitted alongside the
    value — at curation time the og/twitter tiers are
    publisher-written summaries (high-quality paired text), while
    title-tag fallbacks are often navigation boilerplate, so the
    source column is the quality stratifier.

    Heads are synthesized in-plan (same pattern as
    html_meta_extract): ``<title>`` always; ``og:title`` on even
    docs, ``twitter:title`` on every 3rd, ``og:description`` on
    every 4th, a plain description meta always, ``og:image`` on
    every 5th; an ``og:title`` decoy inside a CODE SNIPPET in the
    body (after ``</head>``) that head-scoped extraction must
    ignore.

    Shape at 10^12 pages: per-row regexp projections on the head
    substring — no shuffle, no explode, JVM codegen throughout."""
    from .webgraph import CSTR

    did = CSTR("doc_id", d)
    head = (
        "'<head><title>Page ' || {did} || ' | Site</title>'"
        " || CASE WHEN doc_id % 2 = 0 THEN"
        " '<meta property=\"og:title\" content=\"OG Story ' || {did}"
        " || '\">' ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0 THEN"
        " '<meta name=\"twitter:title\" content=\"TW Story ' || {did}"
        " || '\">' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 0 THEN"
        " '<meta property=\"og:description\" content=\"OG summary '"
        " || {did} || '\">' ELSE '' END"
        " || '<meta name=\"description\" content=\"Meta summary '"
        " || {did} || '\">'"
        " || CASE WHEN doc_id % 5 = 0 THEN"
        " '<meta property=\"og:image\""
        " content=\"https://img.example/' || {did} || '.jpg\">'"
        " ELSE '' END"
        " || '</head><body><code>&lt;meta property=\"og:title\""
        " content=\"FAKE\"&gt;</code></body>'"
    ).format(did=did)
    hd = ("CASE WHEN instr(html, '</head>') > 0 "
          "THEN substr(html, 1, instr(html, '</head>') - 1) "
          "ELSE html END")
    og_t = ("regexp_extract(hd, "
            "'<meta property=\"og:title\" content=\"([^\"]*)\"', 1)")
    tw_t = ("regexp_extract(hd, "
            "'<meta name=\"twitter:title\" content=\"([^\"]*)\"', 1)")
    ti = "regexp_extract(hd, '<title>([^<]*)</title>', 1)"
    og_d = ("regexp_extract(hd, "
            "'<meta property=\"og:description\" content=\"([^\"]*)\"', 1)")
    me_d = ("regexp_extract(hd, "
            "'<meta name=\"description\" content=\"([^\"]*)\"', 1)")
    og_i = ("regexp_extract(hd, "
            "'<meta property=\"og:image\" content=\"([^\"]*)\"', 1)")
    return """
WITH pages AS (SELECT doc_id, {head} AS html FROM documents),
heads AS (SELECT doc_id, {hd} AS hd FROM pages),
fields AS (
  SELECT doc_id, {og_t} AS og_t, {tw_t} AS tw_t, {ti} AS ti,
         {og_d} AS og_d, {me_d} AS me_d, {og_i} AS og_i
  FROM heads
)
SELECT doc_id,
  CASE WHEN og_t <> '' THEN og_t
       WHEN tw_t <> '' THEN tw_t ELSE ti END AS card_title,
  CASE WHEN og_t <> '' THEN 'og'
       WHEN tw_t <> '' THEN 'twitter' ELSE 'title_tag' END
    AS title_source,
  CASE WHEN og_d <> '' THEN og_d ELSE me_d END AS card_description,
  CASE WHEN og_d <> '' THEN 'og' ELSE 'meta' END AS desc_source,
  CAST(CASE WHEN og_i <> '' THEN 1 ELSE 0 END AS INT) AS has_image
FROM fields
""".format(head=head, hd=hd, og_t=og_t, tw_t=tw_t, ti=ti,
           og_d=og_d, me_d=me_d, og_i=og_i)


# --------------------------------------------- AMP / canonical pairing

@query("amp_canonical_pairs")
def q_amp_canonical_pairs(d: str) -> str:
    """AMP ↔ canonical page pairing — a Common-Crawl-specific dedup
    tier: AMP mirrors are near-verbatim copies of their canonical
    pages served from a second URL, and the markup DECLARES the
    pairing in both directions (canonical page: ``<link
    rel="amphtml">``; AMP page: ``<html ⚡>``/``<html amp>`` plus
    ``<link rel="canonical">``).  Reading the declared pairs is
    therefore free dedup signal no similarity join has to rediscover
    — but only RECIPROCAL declarations are trustworthy (one-sided
    claims are routinely stale or spoofed), so each side is
    extracted independently and full-outer-joined on the (canonical,
    amp) url pair.

    Synthesis: every ``doc_id%4=0`` page declares its amphtml twin
    at doc_id+3; every ``doc_id%4=3`` page is AMP (the ⚡ attribute
    form on ``%8=3``, the spelled ``amp`` form on ``%8=7``) and
    declares its canonical at doc_id−3 — EXCEPT the ``%20=3`` tier,
    whose canonical link points at an unrelated host (the stale-
    declaration case, yielding two one-sided rows instead of one
    reciprocal row).

    Shape at 10^12 pages: two narrow per-row regexp projections and
    ONE equi-join on the url pair — at web scale both sides are
    pre-filtered to the tiny declared-AMP slice before the join,
    and the join key is the pair itself, so skew is impossible
    (each pair key occurs at most once per side)."""
    from ..relational import RLIKE
    from .webgraph import CSTR, HOST

    def url_of(expr: str) -> str:
        return ("'https://' || %s || '/d' || %s"
                % (HOST("(%s) %% 40" % expr, d), CSTR(expr, d)))

    head_canon = (
        "'<head><link rel=\"amphtml\" href=\"' || {amp_url}"
        " || '\"></head>'"
    ).format(amp_url=url_of("doc_id + 3"))
    head_amp = (
        "CASE WHEN doc_id % 8 = 3 THEN '<html ⚡ lang=\"en\">'"
        " ELSE '<html amp lang=\"en\">' END"
        " || '<head><link rel=\"canonical\" href=\"'"
        " || CASE WHEN doc_id % 20 = 3"
        "      THEN 'https://evil.example/d' || {did}"
        "      ELSE {canon_url} END"
        " || '\"></head>'"
    ).format(did=CSTR("doc_id", d), canon_url=url_of("doc_id - 3"))
    html = ("CASE WHEN doc_id % 4 = 0 THEN {hc} "
            "WHEN doc_id % 4 = 3 THEN {ha} "
            "ELSE '<head></head>' END"
            ).format(hc=head_canon, ha=head_amp)
    amp_detect = RLIKE("html", "<html (⚡|amp)[ >]", d)
    return """
WITH pages AS (
  SELECT doc_id, {self_url} AS url, {html} AS html FROM documents
),
canon_side AS (
  SELECT url AS canonical_url,
    regexp_extract(html, '<link rel="amphtml" href="([^"]*)"', 1)
      AS amp_url
  FROM pages
  WHERE html LIKE '%rel="amphtml"%'
),
amp_side AS (
  SELECT
    regexp_extract(html, '<link rel="canonical" href="([^"]*)"', 1)
      AS canonical_url,
    url AS amp_url,
    CASE WHEN html LIKE '%⚡%' THEN 'bolt' ELSE 'amp' END
      AS amp_marker
  FROM pages
  WHERE {amp_detect}
)
SELECT
  COALESCE(c.canonical_url, a.canonical_url) AS canonical_url,
  COALESCE(c.amp_url, a.amp_url) AS amp_url,
  a.amp_marker,
  CAST(CASE WHEN c.canonical_url IS NOT NULL
             AND a.canonical_url IS NOT NULL
       THEN 1 ELSE 0 END AS INT) AS reciprocal,
  CASE WHEN c.canonical_url IS NULL THEN 'amp_only'
       WHEN a.canonical_url IS NULL THEN 'canonical_only'
       ELSE 'both' END AS declared_by
FROM canon_side c
FULL OUTER JOIN amp_side a
  ON a.canonical_url = c.canonical_url AND a.amp_url = c.amp_url
""".format(self_url=url_of("doc_id"), html=html,
           amp_detect=amp_detect)


# --------------------------------------------- content-type sniffing

@query("content_sniff")
def q_content_sniff(d: str) -> str:
    """Magic-byte content-type sniffing — the dispatch step the
    extraction pipeline runs BEFORE choosing a parser: the input
    table's payload column is ``binary`` (Content-Type headers lie
    routinely at crawl scale), so the router looks at the first few
    bytes.  At 10^12 rows this runs as ``hex(substring(html, 1, 32))``
    off the binary column — a narrow map-only projection fused into
    the scan, no decode of the full payload, no shuffle.

    The sniffer models the real subtleties, in order:

    1. **BOM first** (it sits at byte 0): UTF-8 ``efbbbf``, UTF-16LE
       ``fffe``, UTF-16BE ``feff`` — stripped before type rules run,
       reported as the charset verdict.
    2. **ASCII-whitespace skip** (``0a 0d 09 20``) — HTML served with
       leading blank lines must still sniff as HTML (WHATWG MIME
       sniffing behavior), and the skip must consume whole BYTE
       PAIRS of the hex form (the anchored 2-char alternation).
    3. **Ordered prefix rules**, most specific first: PNG (8 bytes),
       GIF, JPEG, PDF, gzip, ZIP, ``WARC/``, then tag-shaped HTML —
       including UTF-16 HTML, where ``<`` is ``3c00`` (LE) / ``003c``
       (BE) and a plain-ASCII rule would miss it.

    Payloads are synthesized per doc as lowercase HEX strings (the
    driver corpus carries no binary column): eleven tiers covering
    every rule branch plus an unknown-binary tier whose md5 filler is
    prefixed ``00`` so it can never collide with a magic number.

    Cross-engine determinism: pure string compares on lowercase hex —
    no floats, no regex beyond the anchored whitespace skip."""
    from ..relational import lit
    from .webgraph import CSTR

    filler = "md5('sniff|' || %s)" % CSTR("doc_id", d)
    ws_skip = lit("^(?:0a|0d|09|20)+", d)
    return """
WITH payload AS (
  SELECT doc_id, CASE doc_id %% 11
    WHEN 0 THEN '255044462d312e37'                      -- %%PDF-1.7
    WHEN 1 THEN '1f8b08'                                -- gzip+deflate
    WHEN 2 THEN '89504e470d0a1a0a'                      -- PNG
    WHEN 3 THEN 'ffd8ffe0'                              -- JPEG/JFIF
    WHEN 4 THEN 'efbbbf3c21646f63747970652068746d6c3e'  -- BOM <!doctype
    WHEN 5 THEN 'fffe3c00680074006d006c00'              -- UTF-16LE <html
    WHEN 6 THEN 'feff003c00680074006d006c'              -- UTF-16BE <html
    WHEN 7 THEN '0a0d20203c48544d4c3e'                  -- ws + <HTML>
    WHEN 8 THEN '504b0304'                              -- ZIP local hdr
    WHEN 9 THEN '574152432f312e30'                      -- WARC/1.0
    ELSE '00' END || %(filler)s AS px
  FROM documents
),
bommed AS (
  SELECT doc_id, px,
    CASE WHEN px LIKE 'efbbbf%%' THEN 'utf-8-bom'
         WHEN px LIKE 'fffe%%' THEN 'utf-16le'
         WHEN px LIKE 'feff%%' THEN 'utf-16be'
         ELSE 'none' END AS charset,
    CASE WHEN px LIKE 'efbbbf%%' THEN substring(px, 7)
         WHEN px LIKE 'fffe%%' OR px LIKE 'feff%%' THEN substring(px, 5)
         ELSE px END AS afterbom
  FROM payload
),
skipped AS (
  SELECT doc_id, charset,
    regexp_replace(afterbom, %(ws_skip)s, '') AS body
  FROM bommed
)
SELECT doc_id, charset,
  CASE WHEN body LIKE '89504e470d0a1a0a%%' THEN 'image/png'
       WHEN body LIKE '47494638%%' THEN 'image/gif'
       WHEN body LIKE 'ffd8ff%%' THEN 'image/jpeg'
       WHEN body LIKE '25504446%%' THEN 'application/pdf'
       WHEN body LIKE '1f8b%%' THEN 'application/gzip'
       WHEN body LIKE '504b0304%%' THEN 'application/zip'
       WHEN body LIKE '574152432f%%' THEN 'application/warc'
       WHEN body LIKE '3c21%%' OR body LIKE '3c68746d6c%%'
            OR body LIKE '3c48544d4c%%' THEN 'text/html'
       WHEN charset = 'utf-16le' AND body LIKE '3c00%%' THEN 'text/html'
       WHEN charset = 'utf-16be' AND body LIKE '003c%%' THEN 'text/html'
       ELSE 'application/octet-stream' END AS content_type
FROM skipped
""" % {"filler": filler, "ws_skip": ws_skip}


# --------------------------------------- schema.org microdata extraction

@query("microdata_extract")
def q_microdata_extract(d: str) -> str:
    """Schema.org MICRODATA extraction — the third structured-data
    syntax beside JSON-LD (``jsonld_extract``) and OpenGraph
    (``opengraph_cards``); search engines consume all three, and
    mid-2010s CMSes emit microdata heavily (itemscope/itemprop
    attributes inline on the markup, WHATWG HTML §5): the item type
    comes from ``itemtype``, string props from element text
    (``<span itemprop=…>text</span>``), machine-readable props from
    ``<meta itemprop=… content=…>``, and url props from
    ``<link itemprop=… href=…>`` — three different VALUE CHANNELS the
    extractor must read per the spec's per-tag value rules.

    Markup synthesized in-plan (same discipline as the og/JSON-LD
    ops): one scope per doc — Article (%3=0, span headline),
    Product (%3=1, span *name*, no headline — the consumer falls back
    headline→name exactly like real aggregators), NewsArticle (%3=2,
    headline + the meta/link channels).  The datePublished meta flips
    attribute order on %4=0 (``content=`` first — legal HTML, real
    pages do both), is ABSENT on %5=0 (null-channel tier), and a
    decoy ``data-itemprop="headline"`` span plus an escaped
    ``&lt;span itemprop=…&gt;`` code snippet must never match.

    Shape at 10^12 pages: per-row regexp projections, no shuffle, no
    explode, JVM codegen end-to-end — fuses with the main-content
    scan over the same html column."""
    from .webgraph import CSTR

    did = CSTR("doc_id", d)
    itype = ("CASE doc_id % 3 WHEN 0 THEN 'Article'"
             " WHEN 1 THEN 'Product' ELSE 'NewsArticle' END")
    ct = "STRING" if d == SPARK else "VARCHAR"
    mm = "CAST(doc_id % 9 + 1 AS " + ct + ")"
    date_meta = (
        "CASE WHEN doc_id % 5 = 0 THEN ''"
        " WHEN doc_id % 4 = 0 THEN"
        " '<meta content=\"2024-0' || " + mm +
        " || '-11\" itemprop=\"datePublished\">'"
        " ELSE"
        " '<meta itemprop=\"datePublished\" content=\"2024-0'"
        " || " + mm + " || '-11\">' END")
    html = (
        "'<div itemscope itemtype=\"https://schema.org/' || ({itype})"
        " || '\">'"
        " || CASE WHEN doc_id % 3 = 1"
        "      THEN '<span itemprop=\"name\">Item ' || {did}"
        "        || '</span>'"
        "      ELSE '<span itemprop=\"headline\">Story ' || {did}"
        "        || '</span>' END"
        " || {date_meta}"
        " || '<link itemprop=\"url\" href=\"https://site'"
        " || CAST(doc_id % 40 AS {ct}) || '.example/p' || {did}"
        " || '\">'"
        " || '<span data-itemprop=\"headline\">DECOY ' || {did}"
        " || '</span>'"
        " || '<code>&lt;span itemprop=\"headline\"&gt;FAKE&lt;/span&gt;'"
        " || '</code></div>'"
    ).format(itype=itype, did=did, date_meta="(%s)" % date_meta,
             ct="STRING" if d == SPARK else "VARCHAR")
    item_type = ("regexp_extract(html,"
                 " 'itemscope itemtype=\"https://schema.org/([^\"]+)\"',"
                 " 1)")
    headline = ("regexp_extract(html,"
                " '<span itemprop=\"headline\">([^<]*)</span>', 1)")
    name_p = ("regexp_extract(html,"
              " '<span itemprop=\"name\">([^<]*)</span>', 1)")
    date_if = ("regexp_extract(html,"
               " '<meta itemprop=\"datePublished\" content=\"([^\"]*)\"',"
               " 1)")
    date_cf = ("regexp_extract(html,"
               " '<meta content=\"([^\"]*)\" itemprop=\"datePublished\"',"
               " 1)")
    url_p = ("regexp_extract(html,"
             " '<link itemprop=\"url\" href=\"([^\"]*)\"', 1)")
    return """
WITH pages AS (SELECT doc_id, {html} AS html FROM documents),
fields AS (
  SELECT doc_id,
    {item_type} AS item_type,
    {headline} AS headline_p,
    {name_p} AS name_p,
    {date_if} AS date_if,
    {date_cf} AS date_cf,
    {url_p} AS item_url
  FROM pages
)
SELECT doc_id, item_type,
  CASE WHEN headline_p <> '' THEN headline_p ELSE name_p END
    AS headline,
  CASE WHEN headline_p <> '' THEN 'headline' ELSE 'name' END
    AS headline_source,
  CASE WHEN date_if <> '' THEN date_if ELSE date_cf END
    AS date_published,
  item_url,
  CAST(CASE WHEN date_if <> '' OR date_cf <> '' THEN 1 ELSE 0 END
       AS INT) AS has_date
FROM fields
""".format(html=html, item_type=item_type, headline=headline,
           name_p=name_p, date_if=date_if, date_cf=date_cf,
           url_p=url_p)


# ------------------------------------------- DOM template clustering

@query("template_cluster")
def q_template_cluster(d: str) -> str:
    """Site-template detection by DOM STRUCTURE signature — the
    site-level complement of line-frequency boilerplate
    (``boilerplate_lines``): CMS-driven sites render every page of a
    type through one template, so grouping a host's pages by their
    tag-sequence signature recovers the template inventory
    (article vs listing), tells the extractor which rule set to
    reuse, and flags structure OUTLIERS (one-off pages — interstitial
    /error/spam shells — that deserve no site-level rule).

    The signature is the page's open-tag sequence with repeated-
    content runs COLLAPSED (``p,p,p`` → ``p+`` — two articles with
    different paragraph counts share a template; the collapse
    patterns are literal-anchored, NO backreferences, because RE2
    (DuckDB) has none — the cross-engine seam this op must respect).

    Pages are synthesized in-plan: hosts render most docs through an
    ARTICLE template (header/h1, doc-length-varying ``<p>`` run,
    footer), every 3rd through a LISTING template (doc-varying
    ``<li>`` run), and docs with ``doc_id % 17 = 0`` emit a one-off
    tag (``<marquee>``) that forces a singleton cluster.

    Output: one row per (host, signature) cluster with its page
    count, share of the host in ppm (exact integer), and the rank by
    size — rank 1 is the host's dominant template.

    Shape at 10^12 pages: per-row regexp projection to the signature
    (fuses with the scan), ONE (host, sig) hash-agg — partial-agg
    collapses each host's millions of template-identical pages
    map-side — then host-grain window + share arithmetic over rows
    already reduced to the tiny template inventory."""
    from .webgraph import HOST

    host = HOST("doc_id % 40", d)
    reps = "2 + CAST(doc_id % 5 AS INT)"   # always ≥2: the collapse
    # must unify every article page regardless of paragraph count
    nli = "2 + CAST(doc_id % 4 AS INT)"
    if d == SPARK:
        prun = "repeat('<p>x</p>', %s)" % reps
        lirun = "repeat('<li>i</li>', %s)" % nli
        tagseq = ("array_join(regexp_extract_all(html,"
                  " '<([a-z0-9]+)[ >]', 1), ',')")
    else:
        prun = "repeat('<p>x</p>', %s)" % reps
        lirun = "repeat('<li>i</li>', %s)" % nli
        tagseq = ("array_to_string(regexp_extract_all(html,"
                  " '<([a-z0-9]+)[ >]', 1), ',')")
    html = (
        "CASE WHEN doc_id % 3 = 0 THEN"
        " '<html><body><nav>n</nav><ul>' || {lirun}"
        " || '</ul><footer>f</footer></body></html>'"
        " ELSE"
        " '<html><body><header>h</header><h1>t</h1><div>' || {prun}"
        " || '</div><footer>f</footer></body></html>' END"
        " || CASE WHEN doc_id % 17 = 0 THEN '<marquee>m</marquee>'"
        " ELSE '' END"
    ).format(prun=prun, lirun=lirun)
    # collapse content-driven runs: literal patterns only (RE2-safe)
    collapsed = ("regexp_replace(regexp_replace(seq,"
                 " 'p(,p)+', 'p+'), 'li(,li)+', 'li+')")
    if d == DUCK:
        collapsed = ("regexp_replace(regexp_replace(seq,"
                     " 'p(,p)+', 'p+', 'g'), 'li(,li)+', 'li+', 'g')")
    from .webgraph import IDIV
    share = IDIV("n_pages * 1000000", "host_pages")
    return """
WITH pages AS (
  SELECT doc_id, {host} AS host, {html} AS html FROM documents
),
seqs AS (
  SELECT doc_id, host, {tagseq} AS seq FROM pages
),
sigs AS (
  SELECT doc_id, host, substr(md5({collapsed}), 1, 8) AS sig
  FROM seqs
),
clusters AS (
  SELECT host, sig, CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM sigs GROUP BY host, sig
),
hosted AS (
  SELECT host, sig, n_pages,
    SUM(n_pages) OVER (PARTITION BY host) AS host_pages,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY host ORDER BY n_pages DESC, sig) AS BIGINT)
      AS size_rank
  FROM clusters
)
SELECT host, sig, n_pages,
  CAST({share} AS BIGINT) AS share_ppm,
  size_rank,
  CAST(CASE WHEN size_rank = 1 THEN 1 ELSE 0 END AS INT)
    AS is_dominant
FROM hosted
""".format(host=host, html=html, tagseq=tagseq, collapsed=collapsed,
           share=share)
