"""HTML main-content extraction: block segmentation + text-density /
link-density boilerplate classification (Readability/Boilerpipe-style,
per the BASELINE north star).

Stdlib-only (html.parser).  The page is segmented into text blocks at
block-level tag boundaries; per block we track total characters, anchor
characters, and whether the block sits inside a boilerplate container
(nav/footer/aside/header/form).  A block is main content iff:

* it is not inside a boilerplate container,
* its link density (anchor chars / total chars) is < LINK_DENSITY_MAX,
* it has any text after whitespace normalization.

Main content = kept blocks joined with newlines, in document order.
Never raises — malformed HTML degrades to best-effort extraction.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from typing import List, Optional

LINK_DENSITY_MAX = 0.33

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "ul", "ol", "table", "tr", "blockquote", "pre", "br", "body",
}
_BOILERPLATE_TAGS = {"nav", "footer", "aside", "header", "form"}
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}


@dataclass
class Block:
    text: str
    link_chars: int
    boilerplate: bool

    @property
    def link_density(self) -> float:
        return self.link_chars / max(1, len(self.text))

    @property
    def is_content(self) -> bool:
        return (
            not self.boilerplate
            and bool(self.text.strip())
            and self.link_density < LINK_DENSITY_MAX
        )


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = []
        self._buf: List[str] = []
        self._link_chars = 0
        self._skip_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = "".join(self._buf).strip()
        if text:
            self.blocks.append(
                Block(text, self._link_chars, self._boiler_depth > 0)
            )
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILERPLATE_TAGS:
            self._boiler_depth += 1
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILERPLATE_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def extract_html_text(html: bytes | str) -> str:
    """Main-content text of an HTML page; '' on hopeless input."""
    if isinstance(html, bytes):
        try:
            html = html.decode("utf-8")
        except UnicodeDecodeError:
            html = html.decode("latin-1", errors="replace")
    try:
        parser = _BlockParser()
        parser.feed(html)
        parser.close()
    except Exception:
        return ""
    return "\n".join(b.text for b in parser.blocks if b.is_content)


def blocks_of(html: bytes | str) -> List[Block]:
    """Expose the classified blocks (tests / lineage metrics)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    return parser.blocks


# ---------------------------------------------------------------------
# fixture-side page builder
# ---------------------------------------------------------------------

_PAGE_TMPL = """<!DOCTYPE html>
<html><head><title>{title}</title><style>body{{margin:0}}</style>
<script>var t = "tracking-{title}";</script></head>
<body>
<header><h1><a href="/">{title}</a></h1></header>
<nav><ul><li><a href="/a">Accounts</a></li><li><a href="/b">Cards</a></li>
<li><a href="/c">Loans</a></li><li><a href="/d">Help</a></li></ul></nav>
<main>
{body}
</main>
<aside><a href="/promo">Special offer — open a new account today!</a></aside>
<footer><p><a href="/tos">Terms</a> · <a href="/priv">Privacy</a> ·
<a href="/contact">Contact us</a></p></footer>
</body></html>
"""


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def text_to_html(text: str, title: str = "statement") -> bytes:
    """Wrap statement text (one <p> per line) in a boilerplate-heavy
    page; ``extract_html_text`` must round-trip the non-empty lines."""
    body = "\n".join(
        "<p>%s</p>" % _esc(line)
        for line in text.replace("\f", "\n").split("\n")
        if line.strip()
    )
    return _PAGE_TMPL.format(title=_esc(title), body=body).encode("utf-8")
