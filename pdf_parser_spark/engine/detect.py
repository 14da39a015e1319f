"""Issuer detection: ordered regex table over a 20k-char prefix.

Re-expression of reference parsers/__init__.py:31-106.  Order is
load-bearing: bofa precedes chase because other issuers' wire
descriptions mention "JPMorgan Chase" (reference __init__.py:32,49-58).
Patterns are the spec, kept verbatim.
"""

from __future__ import annotations

import re
from typing import Optional

DETECTION_PREFIX_CHARS = 20000  # reference __init__.py:102

# Ordered (issuer_key, patterns) table — reference __init__.py:31-96.
DETECTION_TABLE = (
    ("bofa", (
        r"\bBank of America\b",
        r"bankofamerica\.com",
        r"\bBOFA\b",
        r"\bBusiness Advantage\b",
        r"1\.888\.BUSINESS",
    )),
    ("chase", (
        r"chase\.com",
        r"\bChase Mobile\b",
        r"\bChase Debit Card\b",
        r"\bChase Total Checking\b",
        r"\bChase Savings\b",
    )),
    ("ifb", (
        r"International\s+Finance\s+Bank",
        r"\bIFB Bus Checking\b",
        r"\bifbbank\.com\b",
    )),
    ("valley", (
        r"\bValley\b",
        r"Valley National Bank",
        r"\bvalley\.com\b",
    )),
    ("mercury", (
        r"\bMercury\b",
        r"Choice Financial Group",
        r"help@mercury\.com",
    )),
    ("pnb", (
        r"Pacific National Bank",
        r"\bP\.O\. Box 012620, Miami\b",
        r"\bACCT ENDING\b",
    )),
    ("wf", (
        r"\bWells Fargo\b",
        r"wellsfargo\.com",
        r"\bNavigate Business Checking\b",
        r"\bInitiate Business Checking\b",
    )),
    ("citi", (
        r"\bCitiBusiness\b",
        r"\bCitibank\b",
        r"\bCiti\b",
    )),
    ("truist", (
        r"\bTruist\b",
        r"truist\.com",
        r"\bZELLE BUSINESS PAYMENT\b",
    )),
)

_COMPILED = tuple(
    (key, tuple(re.compile(p, re.I) for p in pats))
    for key, pats in DETECTION_TABLE
)


def detect_issuer(full_text: Optional[str]) -> str:
    """First issuer whose any pattern hits the 20k-char prefix; else
    ``"generic"`` (reference __init__.py:98-106)."""
    if not full_text:
        return "generic"
    prefix = full_text[:DETECTION_PREFIX_CHARS]
    for key, patterns in _COMPILED:
        for rx in patterns:
            if rx.search(prefix):
                return key
    return "generic"
