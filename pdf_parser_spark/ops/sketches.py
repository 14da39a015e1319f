"""Cardinality / membership sketches and corpus-mixing arithmetic —
the small-state summaries a 10^12-row crawl pipeline keeps INSTEAD of
shuffling the raw key sets.

The reference has no counterpart (training-data tier).  Same pattern
as the dedup tiers: both engines derive the SAME visit log in-plan
from ``documents`` (host = doc_id mod 8, page slug from a multiplied
residue so every host sees repeated urls), so the oracle checks the
sketch arithmetic itself, not fixture luck.

Cross-engine determinism rules (measured, not assumed):
- integer ops, ``md5``, ``sqrt`` and IEEE ``/`` are bit-identical
  across Spark and DuckDB; ``pow(x, 0.7)`` is NOT (last-ulp libm vs
  StrictMath divergence) — the mixing op therefore uses temperature
  τ = 0.5 so the power is ``sqrt``;
- ``round(double, n)`` and double→decimal casts carry a half-boundary
  risk, so outputs are either pure-integer (``floor`` → BIGINT) or
  raw IEEE doubles, never rounded doubles;
- left shifts are on explicit BIGINT (DuckDB's bare ``1 << 31``
  overflows INT32).

Shape at 10^12 rows:
- KMV: the k smallest hashes per group are a MERGEABLE bounded-size
  sketch — at scale the per-partition top-k min-merge replaces the
  full ``COUNT(DISTINCT)`` shuffle of the raw url set; the SQL twin
  (window rank over distinct hashes) is the verification form.
- Bloom: the seen-set compresses to m/8 bytes (here 128 B) that
  BROADCASTS to every probe task — frontier dedup without joining a
  trillion-row seen-set; the probe is a map-side word-index lookup.
- Mixing: one bigint agg per domain + an 8-row driver-side-free
  normalization — the weights table is a broadcast dim.
"""

from __future__ import annotations

from ..relational import DECSUM, DUCK, HEX2INT, LEN, SPARK
from .webgraph import CSTR, IDIV
# IDIV is webgraph's exact floor division ((a - a%b)/b): for every
# divisor here (powers of two: 2^54 bucket shift, 32-bit word index)
# the exact multiple has few significant bits, so the double division
# is bit-exact even for 60-bit numerators — a plain CAST(a/b AS
# BIGINT) double division would NOT be (rounds h near multiples of
# 2^54 into the wrong HLL bucket with ~2^-47 probability per key).

QUERIES = {}


def query(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


def SHL1(n: str, d: str) -> str:
    """``1 << n`` as BIGINT in both dialects."""
    if d == SPARK:
        return "shiftleft(CAST(1 AS BIGINT), CAST(%s AS INT))" % n
    return "(CAST(1 AS BIGINT) << (%s))" % n


_N_HOSTS = 8
# page-slug residue: coprime multiplier spreads doc_ids over 97 slugs
# per host → every host has both repeats (visits > distinct) and a
# distinct count safely above the sketch size k
_PAGE_MOD = 97
_KMV_K = 16
# Bloom geometry: 32-bit words (masks stay positive in a signed
# 64-bit lane), 3 hash functions.  m is deliberately FIXTURE-SMALL
# (1024 bits vs ~250 seen urls → measurable false-positive rate) so
# the false_positive verdict class is actually exercised by the
# oracle; production sizes m for the target FP rate (the shape is
# unchanged — the filter stays a broadcast-size word table).
_BLOOM_BITS = 1024
_BLOOM_WORD = 32
_BLOOM_J = 3


def _visits_cte(d: str) -> str:
    """``documents`` → ``visits(doc_id, host, url)`` — a synthetic
    access log with per-host url repeats."""
    host = "'h' || %s" % CSTR("doc_id %% %d" % _N_HOSTS, d)
    slug = CSTR("(doc_id * 7919) %% %d" % _PAGE_MOD, d)
    return """
visits AS (
  SELECT doc_id, {host} AS host,
         'https://' || {host} || '.example/p' || {slug} AS url
  FROM documents
)""".format(host=host, slug=slug)


@query("kmv_distinct")
def q_kmv_distinct(d: str) -> str:
    """K-minimum-values distinct sketch per host vs the exact count.

    Estimator: with hashes uniform on [0, 2^60) (HEX2INT of md5), the
    k-th smallest distinct hash h_k gives
    ``est = (k-1) * 2^60 / h_k`` (Bar-Yossef et al. 2002); groups
    holding fewer than k distinct hashes ARE the sketch (exact).
    ``(k-1) * 2^60`` = 15·2^60 has 4 significant bits — exactly
    representable as a double, so the single IEEE division is
    bit-identical across engines.  Output stays integer (floor) to
    dodge round(double) half-boundary divergence."""
    est = ("(%d.0 * 1152921504606846976.0) / CAST(hk AS DOUBLE)"
           % (_KMV_K - 1))
    return """
WITH {visits},
uniq AS (SELECT DISTINCT host, url FROM visits),
hashed AS (SELECT host, {h} AS h FROM uniq),
ranked AS (
  SELECT host, h,
         row_number() OVER (PARTITION BY host ORDER BY h) AS rn
  FROM hashed
),
sk AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS exact_distinct,
         MAX(CASE WHEN rn = {k} THEN h END) AS hk
  FROM ranked GROUP BY host
)
SELECT host, exact_distinct,
  CAST(CASE WHEN hk IS NULL THEN exact_distinct
       ELSE CAST(FLOOR({est}) AS BIGINT) END AS BIGINT) AS kmv_estimate,
  CAST(100 * abs(CAST(CASE WHEN hk IS NULL THEN exact_distinct
                 ELSE CAST(FLOOR({est}) AS BIGINT) END
                 - exact_distinct AS DOUBLE)) AS DOUBLE)
    / CAST(exact_distinct AS DOUBLE) AS err_pct
FROM sk
""".format(visits=_visits_cte(d).strip(), h=HEX2INT("md5(url)", d),
           k=_KMV_K, est=est)


def _bit_positions(src: str, d: str) -> str:
    """``{src}(…, url)`` → ``{src}_bits(…, url, word_idx, mask)``:
    the _BLOOM_J (word, bit-mask) coordinates of each url."""
    h = "%s %% %d" % (HEX2INT("md5(%s || '|' || url)"
                              % CSTR("j", d), d), _BLOOM_BITS)
    if d == SPARK:
        expl = ("SELECT url, j FROM {src} "
                "LATERAL VIEW explode(sequence(0, {jm})) t AS j")
    else:
        expl = "SELECT url, unnest(range(0, {j})) AS j FROM {src}"
    expl = expl.format(src=src, j=_BLOOM_J, jm=_BLOOM_J - 1)
    return """
{src}_j AS ({expl}),
{src}_bits AS (
  SELECT url, {wi} AS word_idx, {mask} AS mask
  FROM (SELECT url, {h} AS hbit FROM {src}_j) t
)""".format(src=src, expl=expl, h=h,
            wi=IDIV("hbit", str(_BLOOM_WORD)),
            mask=SHL1("hbit %% %d" % _BLOOM_WORD, d))


@query("bloom_url_seen")
def q_bloom_url_seen(d: str) -> str:
    """Bloom-filter crawl-frontier dedup: build an m=1024-bit filter
    (deliberately fixture-small, see _BLOOM_BITS) over the SEEN url
    set (even doc_ids), probe a frontier of every visited url plus a
    synthetic never-seen tier (every 3rd doc mints a /p1000+ url),
    classify each probe hit/novel/false_positive against the exact
    ground truth.

    One-sided-error contract: ``bloom_maybe = 0 ⇒ truly unseen``
    (asserted by a test); false positives are expected and labeled.
    Filter build = bit_or per word (32 rows); probe = word-index
    equi-join where the filter side is broadcast-small by
    construction."""
    novel_slug = CSTR("1000 + (doc_id % 50)", d)
    host = "'h' || %s" % CSTR("doc_id %% %d" % _N_HOSTS, d)
    return """
WITH {visits},
seen AS (SELECT DISTINCT url FROM visits WHERE doc_id % 2 = 0),
frontier AS (
  SELECT DISTINCT url FROM visits
  UNION
  SELECT DISTINCT 'https://' || {host} || '.example/p' || {novel}
         AS url
  FROM documents WHERE doc_id % 3 = 0
),
{seen_bits},
bloom AS (
  SELECT word_idx, bit_or(mask) AS bits
  FROM seen_bits GROUP BY word_idx
),
{frontier_bits},
probe AS (
  SELECT p.url,
         MIN(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & p.mask) = p.mask
             THEN 1 ELSE 0 END) AS bloom_maybe
  FROM frontier_bits p LEFT JOIN bloom b ON b.word_idx = p.word_idx
  GROUP BY p.url
)
SELECT f.url,
  CASE WHEN s.url IS NOT NULL THEN 1 ELSE 0 END AS truly_seen,
  p.bloom_maybe,
  CASE WHEN p.bloom_maybe = 1 AND s.url IS NULL THEN 'false_positive'
       WHEN p.bloom_maybe = 1 THEN 'hit'
       ELSE 'novel' END AS verdict
FROM frontier f
JOIN probe p ON p.url = f.url
LEFT JOIN seen s ON s.url = f.url
""".format(visits=_visits_cte(d).strip(), host=host, novel=novel_slug,
           seen_bits=_bit_positions("seen", d).strip(),
           frontier_bits=_bit_positions("frontier", d).strip())


_HLL_P = 6                 # 2^6 = 64 registers
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 60 - _HLL_P   # 54-bit rho field below the bucket bits


def BITLEN(w: str, d: str) -> str:
    """Exact bit length of a positive BIGINT — the base-2 string
    render is integer-exact in both engines (no log2, whose libm /
    StrictMath last-ulp split would make floor() engine-dependent)."""
    if d == SPARK:
        return "length(conv(CAST(%s AS STRING), 10, 2))" % w
    return "length(to_base(%s, 2))" % w


@query("hll_distinct")
def q_hll_distinct(d: str) -> str:
    """HyperLogLog cardinality per host (Flajolet et al. 2007) over an
    in-plan ×200 key expansion of the visit log, against the exact
    count — the register-array companion of the KMV sketch: 64
    registers = 64 bytes per group, mergeable by element-wise MAX, the
    shape every production engine (BigQuery/Trino/Spark approx_
    count_distinct) keeps instead of shuffling raw key sets.

    Determinism: bucket = top 6 bits of the 60-bit md5 hash, rho =
    leading-zero count of the 54-bit remainder via exact base-2
    string length (BITLEN), and the harmonic sum Σ 2^-M_b is kept as
    the EXACT integer Σ 2^(56-M_b) (≤ 64·2^56 = 2^62, in-range;
    absent registers contribute M=0 ⇒ 2^56) — a raw double += sum of
    tiny powers would be partition-order-dependent.  The single
    int→double conversion and division round identically in both
    engines.  The estimator is the RAW one: the fixture cardinality
    (~10^4 per host) sits far above the 2.5·m small-range cutoff, so
    the linear-counting correction branch (which needs ln, not
    portable) is out of regime and deliberately omitted — documented
    engine pin, production adds it below 2.5·m.

    ×200 expansion, not the raw urls: with ~50 distinct urls per host
    the sketch would sit in exactly that correction regime; KMV
    (k=16) is the right sketch there and is the adjacent query."""
    if d == SPARK:
        reps = "reps AS (SELECT explode(sequence(0, 199)) AS rep)"
    else:
        reps = "reps AS (SELECT unnest(range(0, 200)) AS rep)"
    h = HEX2INT("md5(key)", d)
    alpha = "(0.7213 / (1.0 + 1.079 / %d.0))" % _HLL_M
    est = ("({alpha} * {m}.0 * {m}.0 * 72057594037927936.0)"
           " / CAST(int_sum AS DOUBLE)").format(alpha=alpha, m=_HLL_M)
    return """
WITH {visits},
{reps},
bigkeys AS (
  SELECT host, url || '#' || {rep} AS key
  FROM visits CROSS JOIN reps
),
uniq AS (SELECT DISTINCT host, key FROM bigkeys),
hashed AS (
  SELECT host, {bucket} AS bucket, {w} AS w
  FROM (SELECT host, {h} AS h FROM uniq) t
),
regs AS (
  SELECT host, bucket,
    MAX(CASE WHEN w = 0 THEN 55
        ELSE 55 - {bitlen} END) AS m_reg
  FROM hashed GROUP BY host, bucket
),
sums AS (
  SELECT host,
    CAST(SUM({pow2}) AS BIGINT)
      + ({m} - CAST(COUNT(*) AS BIGINT)) * 72057594037927936 AS int_sum
  FROM regs GROUP BY host
),
exact AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS exact_distinct
  FROM uniq GROUP BY host
)
SELECT e.host, e.exact_distinct,
  CAST(FLOOR({est}) AS BIGINT) AS hll_estimate,
  CAST(100 * abs(CAST(FLOOR({est}) AS BIGINT)
                 - e.exact_distinct) AS DOUBLE)
    / CAST(e.exact_distinct AS DOUBLE) AS err_pct
FROM exact e JOIN sums s ON s.host = e.host
""".format(visits=_visits_cte(d).strip(), reps=reps,
           rep=CSTR("rep", d), h=h,
           bucket=IDIV("h", str(1 << _HLL_WBITS)),
           w="h %% %d" % (1 << _HLL_WBITS),
           bitlen=BITLEN("w", d),
           pow2=SHL1("56 - m_reg", d), m=_HLL_M, est=est)


_CMS_D = 3   # depth: independent hash rows
# width: FIXTURE-SMALL on purpose (16 columns vs a 31-word vocab, the
# Bloom-filter rationale) so hash collisions actually occur and the
# one-sided overcount contract is exercised by the oracle; production
# sizes W = ceil(e/eps) for the tolerated overcount eps*N
_CMS_W = 16
_CMS_TOPK = 20


@query("cms_heavy_hitters")
def q_cms_heavy_hitters(d: str) -> str:
    """Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan 2005):
    estimate the corpus-wide top-20 word frequencies from a fixed
    3×16 counter table (fixture-small, see _CMS_W) instead of a full per-word groupBy — the
    shape that finds hot URLs / hot n-grams at 10^12 rows, where the
    exact word table is corpus-sized but the sketch is {dd}·{w}
    BIGINTs, mergeable by element-wise + across partitions and
    broadcastable to probes.

    Per word w, hash row j gives column md5(j||'|'+w) % 16; every
    counter adds the word's full count (map-side partial sums — the
    token stream is touched once).  The point estimate is the MIN
    over the 3 row counters: it can only OVERcount (collisions add,
    never subtract) — ``cms_estimate ≥ exact`` for every word, the
    CMS one-sided-error contract (asserted by the test, with the
    classic ε = e/W expected-overcount regime exercised because
    W = 16 ≪ vocab = 31).  All arithmetic is exact BIGINT.

    The top-20 candidate set here comes from the exact counts (the
    verification baseline the oracle needs); production keeps a
    per-partition local top-k heap merged at the driver, probing the
    sketch only for merge survivors."""
    ws = "split(text, ' ')" if d == SPARK else "string_split(text, ' ')"
    if d == SPARK:
        toks = ("SELECT w FROM documents "
                "LATERAL VIEW explode(%s) t AS w" % ws)
        hashes = "reps AS (SELECT explode(sequence(0, %d)) AS j)" \
            % (_CMS_D - 1)
    else:
        toks = "SELECT unnest(%s) AS w FROM documents" % ws
        hashes = "reps AS (SELECT unnest(range(0, %d)) AS j)" % _CMS_D
    col = "%s %% %d" % (
        HEX2INT("md5(%s || '|' || w)" % CSTR("j", d), d), _CMS_W)
    return """
WITH toks AS ({toks}),
wcnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
{hashes},
counters AS (
  SELECT j, {col} AS col, CAST(SUM(c) AS BIGINT) AS total
  FROM wcnt CROSS JOIN reps
  GROUP BY j, {col}
),
topk AS (
  SELECT w, c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT)
    AS rank
  FROM wcnt
),
probes AS (
  SELECT t.rank, t.w, t.c, MIN(ct.total) AS est
  FROM topk t
  CROSS JOIN reps r
  JOIN counters ct ON ct.j = r.j AND ct.col = {pcol}
  WHERE t.rank <= {k}
  GROUP BY t.rank, t.w, t.c
)
SELECT rank, w AS word, c AS exact_count, est AS cms_estimate,
  est - c AS overcount
FROM probes
""".format(toks=toks, hashes=hashes, col=col, k=_CMS_TOPK,
           pcol="%s %% %d" % (
               HEX2INT("md5(%s || '|' || t.w)" % CSTR("r.j", d), d),
               _CMS_W))


_MIX_TAU_NOTE = 0.5  # temperature — τ=0.5 ⇒ p^τ = sqrt(p), the one
# power both engines compute bit-identically (pow(x, 0.7) diverges
# in the last ulp: JVM StrictMath vs libm)
_MIX_BUDGET = 1_000_000_000  # token budget the weights allocate


@query("domain_mix_weights")
def q_domain_mix_weights(d: str) -> str:
    """Temperature-scaled domain sampling weights (the multilingual /
    domain-mixing rule of mC4/XLM-R: w_i ∝ p_i^τ) at τ = 0.5, plus
    the resulting token allocation of a 1B-token budget and the
    implied per-domain epoch count (how many times a small domain is
    re-sampled — the quantity pipelines monitor for overfit risk).

    Per-domain token counts are exact BIGINT sums; the weight
    normalizer is an order-independent decimal sum of the sqrt terms
    (raw double += would be partition-order-dependent); every double
    in the output is produced by IEEE ops on identical inputs, never
    round()ed."""
    ws = "split(text, ' ')" if d == SPARK else "string_split(text, ' ')"
    return """
WITH tok AS (
  SELECT 'h' || {hid} AS host, CAST({n} AS BIGINT) AS ntok
  FROM documents
),
agg AS (
  SELECT host, CAST(SUM(ntok) AS BIGINT) AS domain_tokens
  FROM tok GROUP BY host
),
tot AS (SELECT CAST(SUM(domain_tokens) AS BIGINT) AS t FROM agg),
w0 AS (
  SELECT host, domain_tokens,
    sqrt(CAST(domain_tokens AS DOUBLE) / CAST(t AS DOUBLE)) AS wt
  FROM agg, tot
),
wsum AS (
  SELECT {decsum} AS s FROM w0
)
SELECT host, domain_tokens,
  wt / s AS mix_weight,
  CAST(FLOOR({budget}.0 * wt / s) AS BIGINT) AS alloc_tokens,
  CAST(FLOOR({budget}.0 * wt / s) AS DOUBLE)
    / CAST(domain_tokens AS DOUBLE) AS epochs
FROM w0, wsum
""".format(hid=CSTR("doc_id %% %d" % _N_HOSTS, d),
           decsum=DECSUM("wt", d),
           n=LEN(ws, d), budget=_MIX_BUDGET)


# ---------------------------------------------- log-bucket quantiles

_QSK_MAXBIT = 40     # values clamp at 2^40 (fixture domain << this)
_QSK_QUANTILES = (50, 90, 99)


def _bitlen(x: str) -> str:
    """``bit_length(x)`` for x >= 1 as pure integer arithmetic —
    ``1 + Σ_k [x >= 2^k]`` — identical in both engines (no
    ``ln(x)/ln(2)`` float, which mis-floors at exact powers of two;
    no dialect-only binary printf).  A wide but branch-free CASE sum:
    one whole-stage-codegen projection, no join, no UDF."""
    terms = " + ".join(
        "(CASE WHEN %s >= %d THEN 1 ELSE 0 END)" % (x, 1 << k)
        for k in range(1, _QSK_MAXBIT))
    return "CAST(1 + %s AS BIGINT)" % terms


@query("quantile_sketch")
def q_quantile_sketch(d: str) -> str:
    """Mergeable log-bucket quantile sketch (the DDSketch/HDR-
    histogram family, base-2 buckets) over per-language token counts
    — the at-scale companion of the EXACT ``length_quantiles``: the
    sketch is a per-(lang, bucket) count table, so shards build
    partial histograms map-side and merging is just summing bucket
    counts (the additive-SUM mergeability every distributed quantile
    needs; exact type-1 ranks need a full sort or a per-group window
    instead).

    bucket(v) = bit_length(v) (v clamped to ≥1), i.e. v ∈
    [2^(b-1), 2^b).  The estimate for quantile q is the INCLUSIVE
    upper bound 2^b - 1 of the first bucket whose cumulative count
    reaches the type-1 rank ceil(q·n/100) — guaranteeing
    est/2 < true ≤ est (relative error ≤ 2×, test-pinned against the
    exact quantiles; tighter error = more buckets per octave, same
    shape).  All integer arithmetic.

    Shape at 10^12 docs: one narrow branch-free projection → ONE
    (lang, bucket) hash-agg (partial map-side) → a per-lang window
    over ≤ {mb} bucket rows per language — the reduce side touches
    sketch-sized data only, never the corpus."""
    if d == SPARK:
        ntok = "CAST(size(split(text, ' ')) AS BIGINT)"
    else:
        ntok = "CAST(len(string_split(text, ' ')) AS BIGINT)"
    picks = ", ".join(
        "CAST(MIN(CASE WHEN cum >= ((n * {q} + 99) - "
        "((n * {q} + 99) % 100)) / 100 THEN ub END) AS BIGINT) "
        "AS p{q}_est".format(q=q) for q in _QSK_QUANTILES)
    return """
WITH tl AS (
  SELECT lang, {bitlen} AS b
  FROM (SELECT lang, GREATEST({ntok}, 1) AS v FROM documents) t0
),
hist AS (
  SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM tl GROUP BY lang, b
),
cdf AS (
  SELECT lang, b, c,
    CAST(SUM(c) OVER (PARTITION BY lang ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n,
    CAST({ub} AS BIGINT) AS ub
  FROM hist
)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_buckets,
  {picks}
FROM cdf
GROUP BY lang
""".format(bitlen=_bitlen("v"), ntok=ntok,
           ub="%s - 1" % SHL1("b", d), picks=picks)


q_quantile_sketch.__doc__ = (q_quantile_sketch.__doc__ or "").format(
    mb=_QSK_MAXBIT)


# ------------------------------------------- range-partition planning

_RP_PARTS = 8    # target partition count


@query("range_partition_plan")
def q_range_partition_plan(d: str) -> str:
    """Range-partitioner split-point planning from the MERGEABLE
    log-bucket histogram — the math behind ``repartitionByRange`` /
    Iceberg sort-order binpacking at 100 TB: a full sort to find
    balanced boundaries is exactly what you cannot afford, so split
    points come from the sketch (one map-side-mergeable pass), and
    only the final assignment touches the data (a broadcast compare
    against ≤ {p}-1 boundary values — no shuffle at all until the
    repartition the plan feeds).

    Split point k (k = 1..{p}-1) is the histogram's estimate at the
    type-1 rank ceil(k·n/{p}): the inclusive upper bound of the first
    bucket whose cumulative count reaches the rank.  A document with
    value v goes to partition = #(split points < v) — so equal-valued
    rows can never straddle a boundary, and the per-partition
    imbalance is bounded by the widest bucket the boundary lands in
    (the factor-2 resolution knob; the test pins the bound from the
    actual histogram, not a constant).

    The histogram here is the quantile sketch's base-2 octaves REFINED
    with 4 linear sub-buckets per octave (sub = (v - lo)·4 // lo, all
    integer — the DDSketch finer-γ knob without a single float), so
    narrow real-world domains (this corpus spans 3 octaves) still
    yield ~{p} balanced ranges instead of collapsing to octave
    granularity.  Still additive-SUM mergeable: the key is just
    (octave, sub-bucket).

    Output: one row per non-empty partition (n_docs, value range)
    plus the global skew ratio max_part·{p}·10^6 / n in exact ppm.
    """
    if d == SPARK:
        ntok = "CAST(size(split(text, ' ')) AS BIGINT)"
    else:
        ntok = "CAST(len(string_split(text, ' ')) AS BIGINT)"
    ranks = ", ".join(
        "CAST(MIN(CASE WHEN cum >= ((n * {k} + {p1}) - "
        "((n * {k} + {p1}) % {p})) / {p} THEN ub END) AS BIGINT) "
        "AS s{k}".format(k=k, p=_RP_PARTS, p1=_RP_PARTS - 1)
        for k in range(1, _RP_PARTS))
    assign = " + ".join(
        "(CASE WHEN (SELECT s%d FROM splits) < v THEN 1 ELSE 0 END)"
        % k for k in range(1, _RP_PARTS))
    lo = SHL1("b - 1", d)
    return """
WITH vals AS (
  SELECT GREATEST({ntok}, 1) AS v FROM documents
),
tl0 AS (SELECT v, {bitlen} AS b FROM vals),
tl AS (
  SELECT v, b, {sub} AS sub, {lo} AS lo FROM tl0
),
hist AS (
  SELECT b, sub, CAST(COUNT(*) AS BIGINT) AS c,
    CAST(MAX(lo + {subw} - 1) AS BIGINT) AS ub
  FROM tl GROUP BY b, sub
),
cdf AS (
  SELECT b, sub, c, ub,
    CAST(SUM(c) OVER (ORDER BY b, sub ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS cum,
    CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM hist
),
splits AS (SELECT {ranks} FROM cdf),
assigned AS (
  SELECT v, CAST({assign} AS BIGINT) AS part FROM vals
),
parts AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(MIN(v) AS BIGINT) AS min_tok,
    CAST(MAX(v) AS BIGINT) AS max_tok
  FROM assigned GROUP BY part
),
skew AS (
  SELECT CAST({skew} AS BIGINT) AS skew_ppm FROM (
    SELECT MAX(n_docs) AS m, CAST(SUM(n_docs) AS BIGINT) AS n
    FROM parts) t
)
SELECT p.part AS partition_no, p.n_docs, p.min_tok, p.max_tok,
  (SELECT skew_ppm FROM skew) AS skew_ppm
FROM parts p
""".format(ntok=ntok, bitlen=_bitlen("v"), lo=lo,
           sub=IDIV("(v - %s) * 4" % lo, lo),
           # CEILING division: the bucket's true inclusive max is
           # lo + ceil((sub+1)*lo/4) - 1 (floor under-bounds small
           # octaves, e.g. lo=2 sub=0 would get ub < lo)
           subw=IDIV("(sub + 1) * lo + 3", "4"),
           ranks=ranks, assign=assign,
           skew=IDIV("m * %d * 1000000" % _RP_PARTS, "n"))


q_range_partition_plan.__doc__ = (q_range_partition_plan.__doc__ or "")\
    .format(p=_RP_PARTS)


# ------------------------------------------------- sketch set algebra

def _kmv_sketch_ctes(src: str, d: str) -> str:
    """``{src}(host, url)`` (distinct) → ``{src}_sk(host, cnt, hk)``:
    the per-host KMV state — exact distinct count and the k-th
    smallest hash (NULL when the group holds fewer than k)."""
    return """
{src}_h AS (SELECT host, {h} AS h FROM {src}),
{src}_r AS (
  SELECT host, h,
         row_number() OVER (PARTITION BY host ORDER BY h) AS rn
  FROM {src}_h
),
{src}_sk AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS cnt,
         MAX(CASE WHEN rn = {k} THEN h END) AS hk
  FROM {src}_r GROUP BY host
)""".format(src=src, h=HEX2INT("md5(url)", d), k=_KMV_K).strip()


def _kmv_est(pre: str) -> str:
    """The KMV estimate off a ``(cnt, hk)`` pair (same estimator and
    IEEE-exactness argument as q_kmv_distinct)."""
    est = ("(%d.0 * 1152921504606846976.0) / CAST(%shk AS DOUBLE)"
           % (_KMV_K - 1, pre))
    return ("CAST(CASE WHEN {p}hk IS NULL THEN {p}cnt "
            "ELSE CAST(FLOOR({est}) AS BIGINT) END AS BIGINT)"
            ).format(p=pre, est=est)


@query("kmv_overlap")
def q_kmv_overlap(d: str) -> str:
    """Crawl-snapshot overlap from MERGEABLE KMV sketches — the
    two-snapshot question ("how many urls did this week's crawl share
    with last week's?") answered WITHOUT joining the raw url sets:
    est(A∩B) = est(A) + est(B) − est(A∪B) by inclusion-exclusion,
    where the union sketch is just the k smallest hashes of the two
    sketches' union — pure sketch algebra, the whole reason KMV state
    is kept per snapshot at 10^12 urls (the exact per-host
    intersection computed alongside is the oracle's ground truth, a
    luxury only the fixture can afford).

    Snapshots are derived from the shared visit log with host-
    INDEPENDENT doc_id strides (host is doc_id mod 8, so parity would
    empty half the hosts): A = even doc_id//8, B = doc_id//8 not
    divisible by 3 — every host sees both snapshots with a real
    shared-url tier.

    Inclusion-exclusion on floored estimates can dip below zero on
    sparse groups; the estimate clamps at 0 (GREATEST), mirroring
    production sketch libraries.  All outputs are exact BIGINTs."""
    stride = IDIV("doc_id", "8")
    common_est = ("GREATEST(CAST(0 AS BIGINT), ({a}) + ({b}) - ({u}))"
                  .format(a=_kmv_est("a_sk."), b=_kmv_est("b_sk."),
                          u=_kmv_est("u_sk.")))
    return """
WITH {visits},
snap_a AS (
  SELECT DISTINCT host, url FROM visits WHERE ({stride}) % 2 = 0
),
snap_b AS (
  SELECT DISTINCT host, url FROM visits WHERE ({stride}) % 3 <> 0
),
snap_u AS (
  SELECT host, url FROM snap_a UNION SELECT host, url FROM snap_b
),
{ska},
{skb},
{sku},
exact_c AS (
  SELECT a.host, CAST(COUNT(*) AS BIGINT) AS exact_common
  FROM snap_a a JOIN snap_b b ON a.host = b.host AND a.url = b.url
  GROUP BY a.host
)
SELECT a_sk.host,
  a_sk.cnt AS exact_a, b_sk.cnt AS exact_b,
  COALESCE(e.exact_common, CAST(0 AS BIGINT)) AS exact_common,
  {esta} AS est_a, {estb} AS est_b, {estu} AS est_union,
  {estc} AS est_common
FROM a_sk
JOIN b_sk ON b_sk.host = a_sk.host
JOIN u_sk ON u_sk.host = a_sk.host
LEFT JOIN exact_c e ON e.host = a_sk.host
""".format(visits=_visits_cte(d).strip(), stride=stride,
           ska=_kmv_sketch_ctes("snap_a", d).replace("snap_a_sk", "a_sk"),
           skb=_kmv_sketch_ctes("snap_b", d).replace("snap_b_sk", "b_sk"),
           sku=_kmv_sketch_ctes("snap_u", d).replace("snap_u_sk", "u_sk"),
           esta=_kmv_est("a_sk."), estb=_kmv_est("b_sk."),
           estu=_kmv_est("u_sk."), estc=common_est)


# --------------------------------------------- Z-order layout planning

_Z_BITS = 6          # 6 bits per dimension → 12-bit Morton key
_Z_FILES = 16        # top 4 interleaved bits pick the file


def _zorder_assigned_ctes(d: str) -> str:
    """The shared layout-assignment CTE chain (``stats`` →
    ``bucketed`` → ``keyed`` → ``assigned``): each doc gets its
    (host-bucket xb, size-bucket yb) coordinates and a file under
    BOTH layouts — Morton-interleaved ``zorder`` and contiguous
    ``roworder``.  Shared by ``zorder_cluster`` (per-file clustering
    stats) and ``minmax_prune_stats`` (file-skipping estimation), so
    the two queries describe the same physical layout."""
    xb = "doc_id % 64"
    yb = IDIV("n_chars * 64", "(SELECT mx + 1 FROM stats)")
    z = " + ".join(
        "({xbit}) * {w1} + ({ybit}) * {w2}".format(
            xbit=IDIV("xb", str(1 << b)) + " % 2",
            ybit=IDIV("yb", str(1 << b)) + " % 2",
            w1=4 ** b, w2=2 * 4 ** b)
        for b in range(_Z_BITS))
    rowfile = IDIV("(doc_id - (SELECT mn FROM stats)) * %d" % _Z_FILES,
                   "(SELECT mx_id - mn + 1 FROM stats)")
    return """stats AS (
  SELECT CAST(MAX(n_chars) AS BIGINT) AS mx,
         CAST(MIN(doc_id) AS BIGINT) AS mn,
         CAST(MAX(doc_id) AS BIGINT) AS mx_id
  FROM documents
),
bucketed AS (
  SELECT doc_id, CAST({xb} AS BIGINT) AS xb, CAST({yb} AS BIGINT) AS yb
  FROM documents
),
keyed AS (
  SELECT doc_id, xb, yb, CAST({z} AS BIGINT) AS z FROM bucketed
),
assigned AS (
  SELECT 'zorder' AS layout, {zfile} AS file_id, xb, yb FROM keyed
  UNION ALL
  SELECT 'roworder' AS layout, {rowfile} AS file_id, xb, yb
  FROM keyed
)""".format(xb=xb, yb=yb, z=z, rowfile=rowfile,
            zfile=IDIV("z", str((1 << (2 * _Z_BITS)) // _Z_FILES)))


@query("zorder_cluster")
def q_zorder_cluster(d: str) -> str:
    """Z-order (Morton-interleave) file clustering vs row-order
    binning — the data-layout planning pass behind Delta/Iceberg
    ``ZORDER BY``: interleaving the bits of two filter columns (host
    bucket × size bucket) gives every output file a small RECTANGLE
    of the (host, size) plane, so a predicate on EITHER column prunes
    most files; row-order binning (what a plain parquet writer does —
    16 contiguous doc_id ranges) gives every file the full span of
    both and prunes nothing.  (A doc_id % 16 strawman would be
    DISHONEST here: 16 divides the 64-bucket host axis, so modulo
    binning accidentally host-clusters — measured 4 hosts/file.)

    Both layouts are computed side by side over the same corpus —
    one row per (layout, file): row count, distinct hosts touched,
    and the host/size spans.  The zorder rows provably sit in
    16×16 blocks (span ≤ 15, pinned by the test); the roworder rows
    span essentially the whole 0..63 range of both dimensions.

    Arithmetic is pure integer in both dialects: bucket extraction
    and bit interleave use exact floor division by power-of-two
    literals (IDIV) and %, never native shifts (DuckDB's bare ``<<``
    is INT32) — the Morton key is
    z = Σ_b x_b·4^b + y_b·2·4^b over the 6 bit planes.

    Shape at 10^12 rows: the key is a narrow per-row projection (no
    shuffle); the real job feeds it to repartitionByRange + sorted
    write, whose split-point planning is exactly the sibling
    ``range_partition_plan`` row."""
    return """
WITH {ctes}
SELECT layout, CAST(file_id AS BIGINT) AS file_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT xb) AS BIGINT) AS n_hosts,
  CAST(MAX(xb) - MIN(xb) AS BIGINT) AS host_span,
  CAST(MAX(yb) - MIN(yb) AS BIGINT) AS size_span
FROM assigned GROUP BY layout, file_id
""".format(ctes=_zorder_assigned_ctes(d))


# --------------------------------------------- min/max file skipping

@query("minmax_prune_stats")
def q_minmax_prune_stats(d: str) -> str:
    """Min/max file-skipping estimation — the payoff measurement for
    the ``zorder_cluster`` layout pass: parquet/Iceberg readers prune
    a file when the predicate's value range misses the file's
    [min, max] footer stats, so the fraction of files skipped is a
    direct function of how well the layout clustered the filter
    columns.  This query scores BOTH layouts (Morton ``zorder`` vs
    contiguous ``roworder``, the exact assignment shared via
    ``_zorder_assigned_ctes``) against a fixed battery of eight
    predicates — four host-equality points (``xb = 17p mod 64``) and
    four size bands (``yb ∈ [16p, 16p+15]``) — and reports, per
    (layout, predicate): files scanned/skipped, rows scanned, and
    rows actually matched.

    The honesty invariants the test pins: rows_matched is IDENTICAL
    across layouts (pruning must never change the answer), every
    matching row lives in a scanned file (rows_matched ≤
    rows_scanned), and zorder skips strictly more files than
    roworder on every host predicate while roworder wins nothing.

    Shape at 10^12 rows: file stats aggregate to file granularity
    (thousands of rows) before anything else; the predicate battery
    is an 8-row dimension CROSS JOINed (broadcast) against the file
    stats and the per-row match counts — the same tiny-dim join an
    engine's own planner runs per query.  Pure integer arithmetic."""
    k_seq = ("SELECT explode(sequence(0, 7)) AS pred_id" if d == SPARK
             else "SELECT unnest(range(0, 8)) AS pred_id")
    return """
WITH {ctes},
fstats AS (
  SELECT layout, file_id,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    MIN(xb) AS mn_x, MAX(xb) AS mx_x,
    MIN(yb) AS mn_y, MAX(yb) AS mx_y
  FROM assigned GROUP BY layout, file_id
),
preds AS (
  SELECT pred_id,
    CASE WHEN pred_id < 4 THEN 'host_eq' ELSE 'size_band' END AS kind,
    CASE WHEN pred_id < 4 THEN (pred_id * 17) % 64 ELSE -1 END AS v,
    CASE WHEN pred_id < 4 THEN -1 ELSE (pred_id - 4) * 16 END AS lo,
    CASE WHEN pred_id < 4 THEN -1 ELSE (pred_id - 4) * 16 + 15 END AS hi
  FROM ({k_seq}) s
),
scans AS (
  SELECT f.layout, p.pred_id, p.kind,
    CASE WHEN (p.kind = 'host_eq'
               AND f.mn_x <= p.v AND p.v <= f.mx_x)
          OR (p.kind = 'size_band'
               AND f.mn_y <= p.hi AND p.lo <= f.mx_y)
         THEN 1 ELSE 0 END AS scanned,
    f.n_docs
  FROM fstats f CROSS JOIN preds p
),
matches AS (
  SELECT a.layout, p.pred_id,
    CAST(COUNT(*) AS BIGINT) AS rows_matched
  FROM assigned a CROSS JOIN preds p
  WHERE (p.kind = 'host_eq' AND a.xb = p.v)
     OR (p.kind = 'size_band' AND a.yb BETWEEN p.lo AND p.hi)
  GROUP BY a.layout, p.pred_id
)
SELECT s.layout, CAST(s.pred_id AS BIGINT) AS pred_id, s.kind,
  CAST(COUNT(*) AS BIGINT) AS files_total,
  CAST(SUM(s.scanned) AS BIGINT) AS files_scanned,
  CAST(COUNT(*) - SUM(s.scanned) AS BIGINT) AS files_skipped,
  CAST(SUM(s.scanned * s.n_docs) AS BIGINT) AS rows_scanned,
  COALESCE(MAX(m.rows_matched), CAST(0 AS BIGINT)) AS rows_matched
FROM scans s
LEFT JOIN matches m ON m.layout = s.layout AND m.pred_id = s.pred_id
GROUP BY s.layout, s.pred_id, s.kind
""".format(ctes=_zorder_assigned_ctes(d), k_seq=k_seq)
