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
# structure-preserving extraction: HTML → Markdown
# ---------------------------------------------------------------------

_MD_INLINE = {"strong": "**", "b": "**", "em": "*", "i": "*", "code": "`"}
_MD_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


class _MarkdownParser(HTMLParser):
    """Render MAIN-content markdown (same boilerplate judgment as
    ``_BlockParser``: nav/footer/aside/header/form subtrees and
    script/style/head are dropped entirely).  Structure kept:

    * ``<h1>``-``<h6>`` → ``#``·level headings;
    * ``<p>`` → paragraphs;
    * ``<ul>``/``<ol>`` → ``- `` / ``1. `` items, nested lists
      indented two spaces per level, one block per outermost list;
    * ``<blockquote>`` → ``> `` lines;
    * ``<pre>`` → fenced code blocks (whitespace preserved);
    * inline ``<strong>/<b>`` → ``**``, ``<em>/<i>`` → ``*``,
      ``<code>`` → backticks, ``<a href>`` → ``[text](href)``,
      ``<br>`` → hard line break.

    Blocks joined with blank lines; inline whitespace collapsed.
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: List[str] = []
        self._buf: List[str] = []
        self._skip = 0
        self._boiler = 0
        self._pre = 0
        self._lists: List[List] = []     # stack of [marker, item_count]
        self._items: List[str] = []      # rendered lines of current list
        self._hrefs: List[Optional[str]] = []

    # -- helpers ------------------------------------------------------
    def _inline(self) -> str:
        import re
        text = "".join(self._buf)
        self._buf = []
        if self._pre:
            return text.strip("\n")
        text = re.sub(r"[ \t]+", " ", text)
        text = re.sub(r" ?\n ?", "\n", text)
        return text.strip()

    def _blocked(self) -> bool:
        return bool(self._skip or self._boiler)

    # -- tag events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if tag in _BOILERPLATE_TAGS:
            self._boiler += 1
            return
        if self._blocked():
            return
        if tag in _MD_HEADINGS or tag == "p" or tag == "blockquote":
            self._buf = []
        elif tag == "pre":
            self._buf = []
            self._pre += 1
        elif tag in ("ul", "ol"):
            if self._lists and "".join(self._buf).strip():
                # enclosing <li> text seen so far becomes its line
                marker, n = self._lists[-1]
                head = "- " if marker == "-" else "%d. " % n
                indent = "  " * (len(self._lists) - 1)
                self._items.append(indent + head + self._inline())
            self._lists.append(["-" if tag == "ul" else "1", 0])
        elif tag == "li":
            self._buf = []
            if self._lists:
                self._lists[-1][1] += 1
        elif tag == "a":
            href = dict(attrs).get("href")
            self._hrefs.append(href)
            if href:
                self._buf.append("[")
        elif tag in _MD_INLINE:
            self._buf.append(_MD_INLINE[tag])
        elif tag == "br":
            self._buf.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and not self._blocked():
            self._buf.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag in _BOILERPLATE_TAGS:
            self._boiler = max(0, self._boiler - 1)
            return
        if self._blocked():
            return
        if tag in _MD_HEADINGS:
            text = self._inline()
            if text:
                self.blocks.append("#" * _MD_HEADINGS[tag] + " " + text)
        elif tag == "p":
            text = self._inline()
            if text:
                self.blocks.append(text)
        elif tag == "blockquote":
            text = self._inline()
            if text:
                self.blocks.append(
                    "\n".join("> " + ln for ln in text.split("\n")))
        elif tag == "pre":
            raw = self._inline()
            self._pre = max(0, self._pre - 1)
            if raw:
                self.blocks.append("```\n" + raw + "\n```")
        elif tag == "li":
            text = self._inline()
            if text and self._lists:
                marker, n = self._lists[-1]
                head = "- " if marker == "-" else "%d. " % n
                indent = "  " * (len(self._lists) - 1)
                self._items.append(indent + head + text)
        elif tag in ("ul", "ol"):
            if self._lists:
                self._lists.pop()
            if not self._lists and self._items:
                self.blocks.append("\n".join(self._items))
                self._items = []
        elif tag == "a":
            href = self._hrefs.pop() if self._hrefs else None
            if href:
                self._buf.append("](%s)" % href)
        elif tag in _MD_INLINE:
            self._buf.append(_MD_INLINE[tag])

    def handle_data(self, data):
        if self._blocked():
            return
        self._buf.append(data)

    def close(self):
        super().close()
        text = self._inline()
        if text:
            self.blocks.append(text)


def html_to_markdown(html: bytes | str) -> str:
    """Structure-preserving main-content extraction: markdown of the
    page's content blocks (the modern training-data extraction target
    beside the plain-text ``extract_html_text``).  '' on hopeless
    input; never raises."""
    if isinstance(html, bytes):
        try:
            html = html.decode("utf-8")
        except UnicodeDecodeError:
            html = html.decode("latin-1", errors="replace")
    try:
        parser = _MarkdownParser()
        parser.feed(html)
        parser.close()
    except Exception:
        return ""
    return "\n\n".join(parser.blocks)


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


# ---------------------------------------------------------------------
# structured-data extraction: HTML tables → cell grids
# ---------------------------------------------------------------------

class _TableParser(HTMLParser):
    """Collect ``<table>`` contents as cell grids.  Nested tables are
    flattened in document order (the inner table is its own grid; its
    cells do not leak into the outer row — the common lattice choice).
    Cell text is whitespace-collapsed; ``<th>`` and ``<td>`` are both
    cells (header-ness is positional, row 0)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.tables: List[List[List[str]]] = []
        self._depth = 0          # <table> nesting
        self._grids: List[List[List[str]]] = []   # stack of open grids
        self._row: List[List[str]] = []            # per-depth open row
        self._cell: List[Optional[List[str]]] = []  # per-depth buffer

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._depth += 1
            self._grids.append([])
            self._row.append([])
            self._cell.append(None)
        elif self._depth:
            if tag == "tr":
                if self._row[-1]:
                    self._grids[-1].append(self._row[-1])
                self._row[-1] = []
                self._cell[-1] = None
            elif tag in ("td", "th"):
                self._cell[-1] = []

    def handle_endtag(self, tag):
        if not self._depth:
            return
        if tag in ("td", "th"):
            if self._cell[-1] is not None:
                import re
                text = re.sub(r"\s+", " ", "".join(self._cell[-1])).strip()
                self._row[-1].append(text)
                self._cell[-1] = None
        elif tag == "tr":
            if self._row[-1]:
                self._grids[-1].append(self._row[-1])
            self._row[-1] = []
        elif tag == "table":
            if self._row[-1]:
                self._grids[-1].append(self._row[-1])
            grid = self._grids.pop()
            self._row.pop()
            self._cell.pop()
            self._depth -= 1
            self.tables.append(grid)

    def handle_data(self, data):
        if self._depth and self._cell[-1] is not None:
            self._cell[-1].append(data)


def extract_html_tables(html: bytes | str) -> List[List[List[str]]]:
    """All ``<table>`` grids in document order (inner tables first at
    their close, like the reference's lattice flattening); [] on
    hopeless input; never raises."""
    if isinstance(html, bytes):
        try:
            html = html.decode("utf-8")
        except UnicodeDecodeError:
            html = html.decode("latin-1", errors="replace")
    try:
        parser = _TableParser()
        parser.feed(html)
        parser.close()
    except Exception:
        return []
    return parser.tables
