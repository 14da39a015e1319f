"""Per-issuer relational parsers + the remaining SQL-expressible
operator showcases (SURVEY §2 rows not already covered by
relational.py) — same dialect-paired pattern, every query oracled.

Where the derived corpus lacks a trigger (section headers, long lines,
wire-fee lines, Month-name dates), the query injects it with a
deterministic in-plan transformation shared by both dialects, then the
REAL operator logic runs.  The truist/valley relational parsers are
additionally cross-checked against the Python engine in tests
(differential, SURVEY §5.3).
"""

from __future__ import annotations

from .relational import (
    DUCK, SPARK, AMOUNT_PATTERN, LEN, PRINTF, REALL, REREPL, RLIKE,
    lit, with_lines, _signed_first_amount,
)

QUERIES = {}


def query(name):
    def deco(fn):
        QUERIES[name] = fn
        return fn
    return deco


def LAST_IGNULLS(col: str, order_by: str, part: str, d: str) -> str:
    """Carry-forward state: the window form of a mutable section
    variable (SURVEY §2.9)."""
    frame = ("PARTITION BY %s ORDER BY %s "
             "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
             % (part, order_by))
    if d == SPARK:
        return "last_value(%s) IGNORE NULLS OVER (%s)" % (col, frame)
    return "last_value(%s IGNORE NULLS) OVER (%s)" % (col, frame)


# ---------------------------------------------------------------------
# C9: section-context carry-forward
# ---------------------------------------------------------------------

_SECTION_HEADER = (
    "CASE WHEN line_no % 9 = 1 THEN "
    "(CASE WHEN (doc_id + line_no) % 2 = 0 "
    "THEN 'Deposits, credits and interest' "
    "ELSE 'Other withdrawals, debits and fees' END) ELSE line END"
)


def _sectioned_lines(d: str) -> str:
    """Derived lines with every 9th line replaced by a section header
    (the injection both engines compute identically)."""
    return ("sect_lines AS (SELECT doc_id, line_no, %s AS line "
            "FROM stmt_lines)" % _SECTION_HEADER)


def _truist_marker(d: str) -> str:
    return ("CASE WHEN %s THEN 'in' WHEN %s THEN 'out' ELSE NULL END"
            % (RLIKE("line", "(?i)Deposits.*credits", d),
               RLIKE("line", "(?i)(Other withdrawals|Debits|Service charges)",
                     d)))


@query("c9_section_window")
def q_section_window(d: str) -> str:
    """C9: per-line section state via last_value(IGNORE NULLS) — the
    window-function form of the reference's mutable current_section
    (truist.py:28-36 et al.)."""
    return with_lines("""
, {sect}
SELECT doc_id, line_no,
  {carry} AS section
FROM (SELECT doc_id, line_no, line, {marker} AS marker FROM sect_lines) t
""".format(sect=_sectioned_lines(d),
           carry=LAST_IGNULLS("marker", "line_no", "doc_id", d),
           marker=_truist_marker(d)), d)


# ---------------------------------------------------------------------
# Truist, fully relational (C7 + C9 + D2 + D6 + D7)
# ---------------------------------------------------------------------

@query("truist_relational")
def q_truist(d: str) -> str:
    """The COMPLETE Truist parser (truist.py:32-66) relationally:
    section window → date gate → first amount → strip-tail description
    → direction tiers (section > keywords > sign) → normalize."""
    toks = REALL("line", AMOUNT_PATTERN, d)
    date_pat = r"^\s*(\d{1,2})/(\d{1,2})(?:/(\d{2,4}))?\b"
    p = PRINTF(d)
    strip_tail = REREPL("line", r"\s*" + AMOUNT_PATTERN + r"\s*$", "", d)
    return with_lines("""
, {sect},
carried AS (
  SELECT doc_id, line_no, line,
    {carry} AS section
  FROM (SELECT doc_id, line_no, line, {marker} AS marker
        FROM sect_lines) t
),
dated AS (
  SELECT doc_id, line_no, line, section,
    regexp_extract(line, {dp}, 1) AS mm,
    regexp_extract(line, {dp}, 2) AS dd,
    regexp_extract(line, {dp}, 3) AS yy,
    {amt} AS amount,
    trim({strip_tail}) AS description
  FROM (SELECT doc_id, line_no, line, section, {toks} AS toks,
               {marker2} AS is_header
        FROM carried) x
  WHERE is_header IS NULL
),
parsed AS (
  SELECT doc_id, line_no,
    {p}('%04d-%02d-%02d',
        CASE WHEN yy = '' THEN 2024
             WHEN cast(yy as int) < 100 THEN 2000 + cast(yy as int)
             ELSE cast(yy as int) END,
        cast(mm as int), cast(dd as int)) AS date,
    description, abs(amount) AS amount,
    CASE WHEN section = 'in' THEN 'in'
         WHEN section = 'out' THEN 'out'
         WHEN {kw_out} THEN 'out'
         WHEN {kw_in} THEN 'in'
         WHEN amount < 0 THEN 'out'
         WHEN amount > 0 THEN 'in'
         ELSE 'unknown' END AS direction
  FROM dated WHERE mm <> '' AND amount IS NOT NULL
)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY date, line_no)
       AS INT) - 1 AS tx_index,
  date, description, amount, direction
FROM parsed
""".format(sect=_sectioned_lines(d),
           carry=LAST_IGNULLS("marker", "line_no", "doc_id", d),
           marker=_truist_marker(d), marker2=_truist_marker(d),
           dp=lit(date_pat, d), toks=toks, p=p,
           amt=_signed_first_amount(d), strip_tail=strip_tail,
           kw_out=RLIKE("description",
                        "(?i)(zelle|payment to|iat|debit|withdrawal|ach"
                        "|bill pay)", d),
           kw_in=RLIKE("description",
                       r"(?i)(deposit|credit|interest|paypal\s+\d+)", d)), d)


# ---------------------------------------------------------------------
# Valley, fully relational (F13 long-line cutoff + sign direction)
# ---------------------------------------------------------------------

@query("valley_relational")
def q_valley(d: str) -> str:
    """The COMPLETE Valley parser (valley.py:6-41) relationally: slash
    dates only, blocks cut at a >250-char line BEFORE absorbing it
    (F13 — running long-line counter inside the block), first amount,
    sign-based direction, abs amount.  Long lines injected in-plan."""
    p = PRINTF(d)
    toks = REALL("block_text", AMOUNT_PATTERN, d)
    date_pat = r"^\s*(\d{1,2})/(\d{1,2})(?:/(\d{2,4}))?\b"
    return with_lines("""
, long_lines AS (
  SELECT doc_id, line_no,
    CASE WHEN line_no % 23 = 7 THEN line || repeat('x', 260)
         ELSE line END AS line
  FROM stmt_lines
),
marked AS (
  SELECT doc_id, line_no, line,
    CASE WHEN {isdate} THEN 1 ELSE 0 END AS is_date,
    CASE WHEN length(line) > 250 THEN 1 ELSE 0 END AS is_long
  FROM long_lines
),
blocked AS (
  SELECT doc_id, line_no, line, is_date, is_long,
    SUM(is_date) OVER (PARTITION BY doc_id ORDER BY line_no
                       ROWS UNBOUNDED PRECEDING) AS block_id,
    SUM(is_long) OVER (PARTITION BY doc_id ORDER BY line_no
                       ROWS UNBOUNDED PRECEDING) AS cum_long
  FROM marked
),
kept AS (
  -- a line survives while no long line has appeared in its block
  -- since the opening date line (which itself never breaks, even if
  -- long — the reference appends the date line before checking)
  SELECT b.doc_id, b.line_no, b.line, b.block_id
  FROM blocked b JOIN (
    SELECT doc_id, block_id, MIN(cum_long) AS base_long
    FROM blocked WHERE is_date = 1 GROUP BY doc_id, block_id
  ) h ON b.doc_id = h.doc_id AND b.block_id = h.block_id
  WHERE b.block_id > 0 AND b.cum_long = h.base_long
),
blocks AS (
  SELECT doc_id, block_id, {cat} AS block_text
  FROM kept GROUP BY doc_id, block_id
),
parsed AS (
  SELECT doc_id, block_id,
    {p}('%04d-%02d-%02d',
        CASE WHEN regexp_extract(block_text, {dp}, 3) = '' THEN 2024
             WHEN cast(regexp_extract(block_text, {dp}, 3) as int) < 100
             THEN 2000 + cast(regexp_extract(block_text, {dp}, 3) as int)
             ELSE cast(regexp_extract(block_text, {dp}, 3) as int) END,
        cast(regexp_extract(block_text, {dp}, 1) as int),
        cast(regexp_extract(block_text, {dp}, 2) as int)) AS date,
    trim({strip_tail}) AS description,
    {amt} AS amount
  FROM (SELECT doc_id, block_id, block_text, {toks} AS toks
        FROM blocks) x
)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY date, block_id)
       AS INT) - 1 AS tx_index,
  date, description, abs(amount) AS amount,
  CASE WHEN amount < 0 THEN 'out' ELSE 'in' END AS direction
FROM parsed WHERE amount IS NOT NULL
""".format(isdate=RLIKE("line", r"^\s*\d{1,2}/\d{1,2}(/\d{2,4})?\b", d),
           cat=("string_agg(line, ' ' ORDER BY line_no)" if d == DUCK else
                "concat_ws(' ', transform(array_sort(collect_list("
                "struct(line_no as o, line as v))), x -> x.v))"),
           p=p, dp=lit(date_pat, d), toks=toks,
           strip_tail=REREPL("block_text",
                             r"\s*" + AMOUNT_PATTERN + r"\s*$", "", d),
           amt=_signed_first_amount(d)), d)


# ---------------------------------------------------------------------
# F-family: noise/validity predicate battery (F1/F4/F11/F13/F16 shapes)
# ---------------------------------------------------------------------

@query("f_noise_battery")
def q_noise_battery(d: str) -> str:
    """Per-line boolean noise predicates, one column per filter family:
    standalone-$ lines (chase F1), ≥12-digit account lines, BofA
    date+amount balance rows (F4), WF <10-char gate (F11), Valley
    >250-char cutoff (F13)."""
    def b(expr):
        return "CAST(CASE WHEN %s THEN 1 ELSE 0 END AS INT)" % expr
    return with_lines("""
SELECT doc_id, line_no,
  {f1} AS f1_standalone_amount,
  {f1b} AS f1_long_digits,
  {f4} AS f4_balance_row,
  {f11} AS f11_too_short,
  {f13} AS f13_mega_line
FROM stmt_lines
""".format(
        f1=b(RLIKE("line", r"^\s*\$[\d,]+\.\d{2}\s*$", d)),
        f1b=b(RLIKE("line", r"^\s*\d{12,}\s*$", d)),
        f4=b(RLIKE("line", r"^\s*\d{1,2}/\d{1,2}\s+[\d,]+\.\d{2}\s*$", d)),
        f11=b("length(trim(line)) < 10"),
        f13=b("length(line) > 250")), d)


# ---------------------------------------------------------------------
# D8: chase description cleaning chain
# ---------------------------------------------------------------------

@query("d8_clean_description")
def q_clean_desc(d: str) -> str:
    """Chase _clean_description (chase.py:219-230): strip all money
    lexemes and M/D tokens, drop header phrases, normalize Trn:/Ssn:
    casing, squeeze spaces, uppercase first char."""
    c = "line"
    c = REREPL(c, AMOUNT_PATTERN, "", d)
    c = REREPL(c, r"\b\d{1,2}/\d{1,2}\b", "", d)
    c = REREPL(c, r"(?i)\bDAILY ENDING BALANCE\b", "", d)
    c = REREPL(c, r"(?i)\btrn:\s*", " Trn: ", d)
    c = REREPL(c, r"(?i)\bssn:\s*", " Ssn: ", d)
    c = "trim(%s)" % REREPL(c, r"\s+", " ", d)
    return with_lines("""
SELECT doc_id, line_no,
  CASE WHEN cleaned = '' THEN cleaned
       ELSE upper(substring(cleaned, 1, 1)) || substring(cleaned, 2)
  END AS description
FROM (SELECT doc_id, line_no, {c} AS cleaned FROM stmt_lines) t
""".format(c=c), d)


# ---------------------------------------------------------------------
# D13: chase amount selection ($-priority max, phone-context exclusion)
# ---------------------------------------------------------------------

@query("d13_chase_amount")
def q_chase_amount(d: str) -> str:
    """Chase block-amount rule (chase.py:186-215): among a block's
    money lexemes, prefer $-prefixed tokens, then take max by signed
    value (negative iff '-' anywhere or leading paren); lexemes whose
    digit-string appears inside a phone-number context are excluded —
    expressed with max_by over an exploded token table."""
    toks = REALL("line", AMOUNT_PATTERN, d)
    signed = ("CASE WHEN tok LIKE '%-%' OR tok LIKE '(%' "
              "THEN -cast({bare} as double) "
              "ELSE cast({bare} as double) END").format(
                  bare=REREPL("tok", r"[\(\)\-\$,]", "", d))
    has_phone = RLIKE("line", r"\d{3}[-.\s]\d{3}[-.\s]\d{4}", d)
    digits = "replace(replace(tok, ',', ''), '.', '')"
    if d == SPARK:
        expl = ("SELECT doc_id, line_no, line, tok FROM "
                "(SELECT doc_id, line_no, line, {t} AS toks "
                "FROM stmt_lines) x LATERAL VIEW explode(toks) e AS tok"
                .format(t=toks))
    else:
        expl = ("SELECT doc_id, line_no, line, unnest(toks) AS tok FROM "
                "(SELECT doc_id, line_no, line, {t} AS toks "
                "FROM stmt_lines) x".format(t=toks))
    return with_lines("""
, toks AS ({expl}),
vals AS (
  SELECT doc_id, line_no, tok, {signed} AS val,
    CASE WHEN tok LIKE '%$%' THEN 1 ELSE 0 END AS has_dollar
  FROM toks
  WHERE NOT ({has_phone} AND instr(line, {digits}) > 0)
)
SELECT doc_id, line_no,
  max_by(val, CASE WHEN has_dollar = 1 THEN val + 100000000 ELSE val END)
    AS amount
FROM vals GROUP BY doc_id, line_no
""".format(expl=expl, signed=signed, has_phone=has_phone,
           digits=digits), d)


# ---------------------------------------------------------------------
# C11: wire-fee multi-emit (one output row per amount on the line)
# ---------------------------------------------------------------------

@query("c11_wire_fee_multiemit")
def q_wire_fee(d: str) -> str:
    """BofA wire-fee explode (bofa.py:46-65): a line carrying the
    wire-transfer-fee phrase emits ONE transaction per money lexeme
    with magnitude > 0.01 — the flatMap-shaped operator, native via
    explode.  Phrase injected in-plan on every 19th line."""
    toks = REALL("line", AMOUNT_PATTERN, d)
    bare = "cast(%s as double)" % REREPL("tok", r"[\(\)\-\$,]", "", d)
    if d == SPARK:
        expl = ("SELECT doc_id, line_no, tok FROM wired "
                "LATERAL VIEW explode({t}) e AS tok".format(t=toks))
    else:
        expl = ("SELECT doc_id, line_no, unnest({t}) AS tok FROM wired"
                .format(t=toks))
    return with_lines("""
, wired AS (
  SELECT doc_id, line_no,
    CASE WHEN line_no % 19 = 4
         THEN 'Wire Transfer Fee ' || line ELSE line END AS line
  FROM stmt_lines
  WHERE line_no % 19 = 4
),
toks AS ({expl})
SELECT doc_id, line_no, 'Wire Transfer Fee' AS description,
  {bare} AS amount, 'out' AS direction
FROM toks WHERE {bare} > 0.01
""".format(expl=expl, bare=bare), d)


# ---------------------------------------------------------------------
# D3/D4/D5: remaining date lexers + year detection
# ---------------------------------------------------------------------

_MONTH_CASE = (
    "CASE lower(mon) WHEN 'january' THEN 1 WHEN 'february' THEN 2 "
    "WHEN 'march' THEN 3 WHEN 'april' THEN 4 WHEN 'may' THEN 5 "
    "WHEN 'june' THEN 6 WHEN 'july' THEN 7 WHEN 'august' THEN 8 "
    "WHEN 'september' THEN 9 WHEN 'october' THEN 10 "
    "WHEN 'november' THEN 11 WHEN 'december' THEN 12 "
    "WHEN 'jan' THEN 1 WHEN 'feb' THEN 2 WHEN 'mar' THEN 3 "
    "WHEN 'apr' THEN 4 WHEN 'jun' THEN 6 WHEN 'jul' THEN 7 "
    "WHEN 'aug' THEN 8 WHEN 'sep' THEN 9 WHEN 'sept' THEN 9 "
    "WHEN 'oct' THEN 10 WHEN 'nov' THEN 11 WHEN 'dec' THEN 12 "
    "ELSE NULL END"
)


@query("d3_d4_d5_dates")
def q_other_dates(d: str) -> str:
    """D3 parse_long_date ('Month D, YYYY' anywhere), D4 parse_mmmdd
    (anchored 'Mmm D' + inferred year), D5 detect_year (first 20\\d{2}
    else deterministic fallback) — long/Mmm tokens injected in-plan on
    every 29th/31st line."""
    p = PRINTF(d)
    longp = r"([A-Za-z]{3,9})\s+(\d{1,2}),\s*(\d{4})"
    mmmp = r"^\s*((?i:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec))\s+(\d{1,2})\b"
    return with_lines("""
, dated AS (
  SELECT doc_id, line_no,
    CASE WHEN line_no % 29 = 11 THEN 'March 5, 2024 ' || line
         WHEN line_no % 31 = 13 THEN 'Feb 7 ' || line
         ELSE line END AS line
  FROM stmt_lines
),
extracted AS (
  SELECT doc_id, line_no, line,
    regexp_extract(line, {longp}, 1) AS lmon,
    regexp_extract(line, {longp}, 2) AS lday,
    regexp_extract(line, {longp}, 3) AS lyear,
    regexp_extract(line, {mmmp}, 1) AS mmon,
    regexp_extract(line, {mmmp}, 2) AS mday,
    coalesce(nullif(regexp_extract(line, {yearp}, 1), ''), '2024')
      AS detected_year
  FROM dated
)
SELECT doc_id, line_no,
  CASE WHEN lmon <> '' AND {lmonth} IS NOT NULL
       THEN {p}('%04d-%02d-%02d', cast(lyear as int), {lmonth},
                cast(lday as int)) END AS long_date,
  CASE WHEN mmon <> '' AND {mmonth} IS NOT NULL
       THEN {p}('%04d-%02d-%02d', cast(detected_year as int), {mmonth},
                cast(mday as int)) END AS mmm_date,
  cast(detected_year as int) AS year_of_doc
FROM extracted
""".format(longp=lit(longp, d), mmmp=lit(mmmp, d),
           yearp=lit(r"\b(20\d{2})\b", d), p=p,
           lmonth=_MONTH_CASE.replace("mon", "lmon"),
           mmonth=_MONTH_CASE.replace("mon", "mmon")), d)


# ---------------------------------------------------------------------
# §2.8 set operations
# ---------------------------------------------------------------------

@query("set_union_except")
def q_set_ops(d: str) -> str:
    """§2.8: UNION ALL to combine per-branch results + EXCEPT ALL as
    the golden-diff utility — pending lines = all lines minus the
    already-processed subset (multiset semantics)."""
    return with_lines("""
SELECT doc_id, line_no FROM stmt_lines
EXCEPT ALL
SELECT doc_id, line_no FROM stmt_lines WHERE doc_id % 3 = 0
""", d)
