"""Document-level orchestration: text → (issuer, transactions, metrics).

This is the per-row semantic core that the Spark fidelity path batches
over Arrow.  Mirrors the reference request lifecycle (app.py:9-29):
extract → detect → parse → normalize — except the text is extracted
once and reused for both detection and parsing (the reference parses
the PDF twice, app.py:13 + chase.py:17 — a pure pessimization since
both calls produce identical text; SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from .banks import ALL_PARSERS, PARSERS, parse_generic
from .detect import detect_issuer
from .direction import finalize_records
from .textrules import split_lines, year_of


def parse_document(
    text: Optional[str],
    fallback_year: int,
    issuer: Optional[str] = None,
    tally: Optional[dict] = None,
) -> Tuple[str, List[Dict[str, Any]]]:
    """Parse one document's extracted text into normalized transactions.

    ``fallback_year`` replaces the reference's nondeterministic
    utcnow-year fallback (base.py:54) — pass ``warc_ts.year``.
    ``issuer`` overrides detection (this is how the unregistered
    ``bofa_relationship`` layout is reached).

    Returns ``(issuer_key, records)`` where records are
    ``{date, description, amount, direction}`` stable-sorted by date.
    """
    lines = split_lines(text)
    year = year_of(text, fallback_year)
    key = issuer or detect_issuer(text)
    parse_fn = ALL_PARSERS.get(key) or parse_generic
    if tally is not None:
        tally["n_lines"] = len(lines)
    raw = parse_fn(lines, year, tally)
    return key, finalize_records(raw)
