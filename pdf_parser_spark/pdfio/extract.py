"""Unified payload → text extraction (the S2 operator, SURVEY.md §2.1).

Sniffs the payload: ``%PDF-`` → PDF tokenizer; leading ``<`` (after
whitespace/BOM) → HTML main-content extractor; anything else is treated
as raw UTF-8 text.  Never raises.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .html_extract import extract_html_text
from .tokenizer import extract_pdf_text


@dataclass
class DocText:
    text: str
    kind: str          # 'pdf' | 'html' | 'text' | 'empty'
    pages: int
    error: Optional[str] = None


def extract_document(payload: Optional[bytes]) -> DocText:
    if not payload:
        return DocText("", "empty", 0)
    head = payload[:1024].lstrip(b"\xef\xbb\xbf \t\r\n")
    if payload[:5] == b"%PDF-":
        res = extract_pdf_text(payload)
        err = res.error
        if err is None and not res.text and res.pages == 0:
            # the tokenizer recovers what it can from damaged files and
            # never raises; a nonzero payload that yielded NOTHING is a
            # parse failure the lineage sidecar must count, not a
            # silently-empty document
            err = "pdf-no-text: no page content recovered"
        return DocText(res.text, "pdf", res.pages, err)
    if head[:1] == b"<":
        return DocText(extract_html_text(payload), "html", 1)
    try:
        return DocText(payload.decode("utf-8"), "text", 1)
    except UnicodeDecodeError:
        return DocText(payload.decode("utf-8", errors="replace"),
                       "text", 1, error="unicode-replace")
