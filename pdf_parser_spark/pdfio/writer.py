"""Deterministic PDF fixture generator.

Renders text (``\\f`` = page break, 60 lines/page) into a real PDF 1.4
byte stream so the tokenizer has genuine material to chew on:

* classic xref table + trailer;
* per-page Flate-compressed (optional) content streams using the
  ``BT/Tf/Tm/Td/TD/T*/Tj/TJ/'`` operator repertoire;
* ASCII text through a standard Courier font (/F1);
* non-ASCII lines through a generated 1-byte-code font (/F2) carrying
  a /ToUnicode CMap (bfchar entries) — exercises CMap→Unicode mapping;
* with ``objstm=True`` the font + page dicts are packed into a
  /ObjStm object stream — exercises object-stream lexing.  (The xref
  then only covers top-level objects; our tokenizer scans object spans
  and does not require member entries, see tokenizer.py.)

Courier is monospaced: every glyph advances 0.6 em, which makes x
positions exactly reconstructable by the tokenizer.

Every 7th line is emitted as a TJ array where one space is replaced by
a -600/1000-em kerning adjustment (the width of a Courier space), so
the tokenizer must re-insert the space from glyph-gap geometry.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

FONT_SIZE = 10.0
LEADING = 12.0
CHAR_EM = 0.6  # Courier advance per glyph (em fraction)
PAGE_LINES = 60
TOP_Y = 760.0
LEFT_X = 72.0


def _esc_literal(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out).encode("latin-1")


def _build_charmap(text: str) -> Dict[str, int]:
    """Assign 1-byte codes (0x80+, clear of ASCII) to every distinct
    non-ASCII char (for /F2)."""
    codes: Dict[str, int] = {}
    nxt = 0x80
    for ch in text:
        if ord(ch) > 126 and ch not in codes:
            codes[ch] = nxt
            nxt += 1
            if nxt > 0xFE:
                raise ValueError("fixture text exceeds 1-byte custom font")
    return codes


def _tounicode_cmap(codes: Dict[str, int], wide: bool = False) -> bytes:
    """Minimal ToUnicode CMap with one bfchar block.  ``wide`` writes
    the 2-byte (Type0/Identity-H) form: <0000>–<ffff> codespace and
    4-hex-digit source codes."""
    key = "<%04x>" if wide else "<%02x>"
    space = "<0000> <ffff>" if wide else "<00> <ff>"
    entries = "".join(
        # bfchar targets are UTF-16BE (§9.10.3): non-BMP characters
        # must be written as surrogate pairs, not raw 5-digit hex
        (key + " <%s>\n") % (code, ch.encode("utf-16-be").hex())
        for ch, code in sorted(codes.items())
    )
    body = (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "/CMapName /Custom-UC def\n/CMapType 2 def\n"
        "1 begincodespacerange\n%s\nendcodespacerange\n"
        "%d beginbfchar\n%s endbfchar\n"
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
        % (space, len(codes), entries)
    )
    return body.encode("latin-1")


def _op_kind(line: str, idx: int) -> str:
    """Which show-text form a line uses: TJ-with-kerning every 7th
    ASCII line containing a space, the ' operator every 5th line,
    plain Tj otherwise."""
    is_ascii = all(ord(c) <= 126 for c in line)
    if idx % 7 == 3 and " " in line and is_ascii:
        return "tj_kern"
    if idx % 5 == 2:
        return "quote"
    return "tj"


def _line_ops(line: str, idx: int, codes: Dict[str, int],
              cid: bool = False) -> bytes:
    """Content-stream operators for one text line.  In ``cid`` mode
    non-ASCII lines show through the Type0 font as hex strings of
    big-endian 2-byte codes (code = the char's BMP codepoint,
    Identity-style)."""
    is_ascii = all(ord(c) <= 126 for c in line)
    ops: List[bytes] = []
    if is_ascii:
        ops.append(b"/F1 10 Tf\n")
        payload = line
    elif cid:
        ops.append(b"/F2 10 Tf\n")
        hexs = "".join("%04x" % codes.get(c, ord(c))
                       for c in line).encode("ascii")
        kind = _op_kind(line, idx)
        if kind == "quote":
            ops.append(b"<" + hexs + b"> '\n")
        else:
            ops.append(b"<" + hexs + b"> Tj\n")
        return b"".join(ops)
    else:
        ops.append(b"/F2 10 Tf\n")
        payload = "".join(
            chr(codes[c]) if ord(c) > 126 else c for c in line
        )
    kind = _op_kind(line, idx)
    if kind == "tj_kern":
        head, tail = payload.split(" ", 1)
        ops.append(
            b"[" + b"(" + _esc_literal(head) + b") -1000 ("
            + _esc_literal(tail) + b")] TJ\n"
        )
    elif kind == "quote":
        ops.append(b"(" + _esc_literal(payload) + b") '\n")
    else:
        ops.append(b"(" + _esc_literal(payload) + b") Tj\n")
    return b"".join(ops)


def _page_stream(lines: List[str], codes: Dict[str, int],
                 cid: bool = False) -> bytes:
    parts: List[bytes] = [b"BT\n12 TL\n"]
    parts.append(b"1 0 0 1 %.1f %.1f Tm\n" % (LEFT_X, TOP_Y))
    for k, line in enumerate(lines):
        if k > 0:
            if _op_kind(line, k) == "quote":
                pass  # the ' operator advances the line itself
            elif k % 3 == 1:
                parts.append(b"0 -12 Td\n")
            elif k % 4 == 0:
                parts.append(b"0 -12 TD\n")
            else:
                parts.append(b"T*\n")
        parts.append(_line_ops(line, k, codes, cid))
    parts.append(b"ET\n")
    return b"".join(parts)


class _Builder:
    def __init__(self):
        self.objects: List[bytes] = []  # body of object i+1

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def reserve(self) -> int:
        self.objects.append(b"")
        return len(self.objects)

    def set(self, num: int, body: bytes) -> None:
        self.objects[num - 1] = body

    def render(self, xref_stream: bool = False, compress: bool = True,
               packed: Dict[int, Tuple[int, int]] = None,
               xref_predictor: bool = False,
               info: "Optional[int]" = None) -> bytes:
        """Serialize.  Classic mode (default) writes a PDF 1.4 xref
        TABLE + trailer.  With ``xref_stream=True`` writes a PDF 1.5
        cross-reference STREAM (ISO 32000-1 §7.5.8): binary entries
        with /W field widths, the stream dict doubling as the trailer,
        ``startxref`` pointing at the stream object.  ``packed`` maps
        object numbers that live inside an /ObjStm to (objstm_num,
        index) — they are NOT written as top-level objects and get
        type-2 xref entries, the conforming PDF 1.5 layout."""
        packed = packed or {}
        if xref_stream:
            out = [b"%PDF-1.5\n%\xc7\xec\x8f\xa2\n"]
        else:
            out = [b"%PDF-1.4\n%\xc7\xec\x8f\xa2\n"]
        offsets: Dict[int, int] = {}
        pos = sum(len(p) for p in out)
        for i, body in enumerate(self.objects, start=1):
            if i in packed:
                continue
            offsets[i] = pos
            chunk = b"%d 0 obj\n" % i + body + b"\nendobj\n"
            out.append(chunk)
            pos += len(chunk)
        if not xref_stream:
            xref_pos = pos
            n = len(self.objects) + 1
            xref = [b"xref\n0 %d\n" % n, b"0000000000 65535 f \n"]
            for i in range(1, n):
                xref.append(b"%010d 00000 n \n" % offsets[i])
            out.append(b"".join(xref))
            info_ref = b" /Info %d 0 R" % info if info else b""
            out.append(
                b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n"
                b"%%%%EOF\n" % (n, info_ref, xref_pos)
            )
            return b"".join(out)
        # --- cross-reference stream: /W [1 3 2] = (type, offset-or-
        # objstm-num in 3 bytes, gen-or-index in 2 bytes), big-endian
        xnum = len(self.objects) + 1
        size = xnum + 1

        def ent(t: int, f2: int, f3: int) -> bytes:
            return bytes([t]) + f2.to_bytes(3, "big") + f3.to_bytes(2, "big")

        rows = [ent(0, 0, 65535)]
        for i in range(1, xnum):
            if i in packed:
                sn, idx = packed[i]
                rows.append(ent(2, sn, idx))
            else:
                rows.append(ent(1, offsets[i], 0))
        rows.append(ent(1, pos, 0))  # the xref stream object itself
        extra = (b" /Type /XRef /Size %d /Root 1 0 R /W [1 3 2]"
                 b" /Index [0 %d]" % (size, size))
        if info:
            extra += b" /Info %d 0 R" % info
        if xref_predictor:
            # the layout real 1.5 producers emit: PNG Up (Predictor
            # 12) over the fixed-width rows, then Flate — each row
            # stores the delta to the row above, which is tiny for
            # monotonically-increasing offsets
            payload = zlib.compress(
                _png_up_encode(b"".join(rows), 6), 9)
            body = (b"<< /Length %d /Filter /FlateDecode /DecodeParms"
                    b" << /Predictor 12 /Columns 6 >>%s >>\nstream\n"
                    % (len(payload), extra) + payload + b"\nendstream")
        else:
            body = _stream_obj(b"".join(rows), compress, extra=extra)
        out.append(b"%d 0 obj\n" % xnum + body + b"\nendobj\n")
        out.append(b"startxref\n%d\n%%%%EOF\n" % pos)
        return b"".join(out)


def _png_up_encode(data: bytes, rowlen: int) -> bytes:
    """Apply the PNG Up row filter (RFC 2083 §6.3, the inverse of
    tokenizer._predictor_undo's tag-2 branch): each row is prefixed
    with filter tag 2 and stores byte-wise deltas to the prior row."""
    out = bytearray()
    prior = bytes(rowlen)
    for r in range(0, len(data), rowlen):
        row = data[r:r + rowlen]
        out.append(2)
        out += bytes((row[i] - prior[i]) & 0xFF for i in range(len(row)))
        prior = row
    return bytes(out)


def _stream_obj(data: bytes, compress: bool, extra: bytes = b"") -> bytes:
    if compress:
        data = zlib.compress(data, 9)
        filt = b" /Filter /FlateDecode"
    else:
        filt = b""
    return (
        b"<< /Length %d%s%s >>\nstream\n" % (len(data), filt, extra)
        + data + b"\nendstream"
    )


def _pdf_str(s: str) -> bytes:
    """PDF literal string with the three escapes §7.3.4.2 requires."""
    out = s.encode("latin-1")
    for ch, esc in ((b"\\", b"\\\\"), (b"(", b"\\("), (b")", b"\\)")):
        out = out.replace(ch, esc)
    return b"(" + out + b")"


def text_to_pdf(text: str, compress: bool = True, objstm: bool = False,
                xref_stream: bool = False,
                cid_font: bool = False,
                xref_predictor: bool = False,
                links: "Optional[Dict[int, List[str]]]" = None,
                bookmarks: "Optional[List[Tuple[int, str, int]]]" = None,
                form_fields: "Optional[List[Tuple[str, str]]]" = None,
                page_labels: "Optional[List[Tuple[int, dict]]]" = None,
                doc_info: "Optional[dict]" = None,
                xmp: "Optional[dict]" = None,
                table_rows: "Optional[List[List[str]]]" = None,
                ) -> bytes:
    """Render ``text`` (pages split on ``\\f``) to PDF bytes.

    ``links`` maps a physical page index to the URI link annotations
    that page carries (ISO 32000-1 §12.5.6.5: /Annots arrays of
    /Subtype /Link dicts with /A << /S /URI >> actions).  Alternating
    annotated pages reference their /Annots array INDIRECTLY (the
    other layout real producers emit), and every annotated page also
    carries a /Text note annotation the link extractor must skip.

    ``bookmarks`` is a depth-first (level, title, page_index) list
    rendered as the document outline (§12.3.3): a /Outlines root with
    First/Last/Next/Prev/Parent/Count linkage and [page /Fit] /Dest
    arrays; non-latin-1 titles are written as UTF-16BE text strings
    with BOM (§7.9.2.2), the layout real producers emit for CJK.

    ``form_fields`` is a (name, value) list rendered as an /AcroForm
    text-field tree (§12.7): every second field nests its /V under a
    parent node whose KID carries only /T (partial names compose
    parent.child and values inherit down — both resolutions real
    readers must implement); non-latin-1 values go UTF-16BE.

    ``page_labels`` is a [(start_page_index, spec)] list rendered as
    the catalog's /PageLabels NUMBER TREE (§12.4.2 / §7.9.7): spec
    keys ``S`` (numbering style name: D, r, R, a, A), ``P`` (label
    prefix — non-latin-1 prefixes go UTF-16BE) and ``St`` (range
    start value), each emitted only when present.  With ≥3 ranges the
    tree is written in its SPLIT form — a root with /Kids and leaf
    nodes carrying /Limits + /Nums — the shape real producers emit
    for long documents, which readers must traverse.

    ``doc_info`` is a {Title, Author, Producer, CreationDate}
    mapping rendered as the trailer's /Info document-information
    dictionary (§14.3.3) — non-latin-1 values go UTF-16BE;
    CreationDate is passed PRE-FORMATTED as a §7.9.4 date string
    (``D:YYYYMMDDHHmmSS`` with optional ``Z``/``±HH'mm'`` offset).
    ``xmp`` is a {title, creator} mapping rendered as an XMP packet
    (§14.3.2): an uncompressed /Type /Metadata /Subtype /XML stream
    referenced from the catalog, dc:title in an rdf:Alt x-default,
    dc:creator in an rdf:Seq — the precedence seam real documents
    carry (XMP and /Info frequently DISAGREE; the reader's precedence
    rule is documented there).

    ``table_rows`` (a list of rows of ASCII cell strings, possibly
    ragged) appends one extra page laying the cells out as a TABLE
    with absolute ``Tm`` placements (x = 60 + 130·col,
    y = 700 − 16·row).  Cells are emitted in a deterministically
    SHUFFLED stream order — structure exists only in the glyph
    COORDINATES, exactly as in real PDF tables, so an extractor must
    recover the grid by clustering positions, never by stream order.

    ``xref_stream=True`` emits the PDF 1.5 layout: a cross-reference
    STREAM instead of the classic table, and — combined with
    ``objstm`` — true type-2 entries for the packed objects (which
    then do not appear as top-level ``N 0 obj`` spans at all, the
    shape real PDF 1.5+ producers write).

    ``xref_predictor=True`` (with ``xref_stream``) Flate-compresses
    the xref rows under a PNG Up predictor (/DecodeParms /Predictor
    12 /Columns 6) — the layout virtually every real-world 1.5+
    producer emits.

    ``cid_font=True`` renders non-ASCII lines through a COMPOSITE
    (Type0 / Identity-H style) font: show strings become big-endian
    2-byte hex codes mapped by a wide ToUnicode CMap — the layout
    every CJK/complex-script producer emits, and the only one that
    escapes the 1-byte font's 127-distinct-char ceiling."""
    pages_text = text.split("\f")
    if cid_font:
        # identity codes over every char shown through F2 (non-ASCII
        # lines show WHOLE lines through the composite font); astral
        # chars don't fit a 2-byte identity code, so they get
        # synthetic private-use codes whose CMap targets are
        # surrogate PAIRS (the layout real CJK-ext/emoji producers
        # emit)
        codes = {}
        nxt = 0xE000
        for seg in text.replace("\f", "\n").split("\n"):
            if any(ord(c) > 126 for c in seg):
                for c in seg:
                    if c in codes:
                        continue
                    if ord(c) > 0xFFFF:
                        while any(v == nxt for v in codes.values()):
                            nxt += 1
                        codes[c] = nxt
                        nxt += 1
                    else:
                        codes[c] = ord(c)
    else:
        codes = _build_charmap(text)

    b = _Builder()
    root = b.reserve()    # 1: catalog
    pages = b.reserve()   # 2: pages
    f1 = b.reserve()      # 3: /F1
    f2 = b.reserve()      # 4: /F2
    cmap_obj = b.add(_stream_obj(
        _tounicode_cmap(codes, wide=cid_font), compress))

    f1_body = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
        b"/Encoding /WinAnsiEncoding >>"
    )
    if cid_font:
        desc = b.add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Courier "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        f2_body = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Courier "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc, cmap_obj)
        )
    else:
        f2_body = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier "
            b"/ToUnicode %d 0 R >>" % cmap_obj
        )

    page_ids: List[int] = []
    page_bodies: List[Tuple[int, bytes]] = []
    for ptext in pages_text:
        # chunk page text into PAGE_LINES-line physical pages
        chunks = [ptext.split("\n")[i:i + PAGE_LINES]
                  for i in range(0, max(1, len(ptext.split("\n"))), PAGE_LINES)]
        for chunk in chunks:
            content = b.add(_stream_obj(
                _page_stream(chunk, codes, cid_font), compress))
            pid = b.reserve()
            page_no = len(page_ids)
            page_ids.append(pid)
            annots = b""
            if links and page_no in links:
                refs = []
                for li, uri in enumerate(links[page_no]):
                    y = 700 - 14 * li
                    refs.append(b.add(
                        b"<< /Type /Annot /Subtype /Link "
                        b"/Rect [72 %d 540 %d] "
                        b"/A << /Type /Action /S /URI /URI %s >> >>"
                        % (y, y + 12, _pdf_str(uri))))
                refs.append(b.add(
                    b"<< /Type /Annot /Subtype /Text /Rect [0 0 8 8] "
                    b"/Contents (note) >>"))         # extractor skips
                arr = b"[" + b" ".join(b"%d 0 R" % r for r in refs) + b"]"
                if page_no % 2:
                    annots = b"/Annots %d 0 R " % b.add(arr)
                else:
                    annots = b"/Annots " + arr + b" "
            page_bodies.append((pid, (
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R /F2 %d 0 R >> >> "
                b"%s/Contents %d 0 R >>"
                % (pages, f1, f2, annots, content)
            )))

    if table_rows:
        cells = [(r, c, cell)
                 for r, row in enumerate(table_rows)
                 for c, cell in enumerate(row)]
        # deterministic shuffle: structure must come from coordinates
        cells.sort(key=lambda rc: (rc[1] * 7 + rc[0] * 3) % 11)
        tparts: List[bytes] = [b"BT\n/F1 10 Tf\n"]
        for r, c, cell in cells:
            tparts.append(
                b"1 0 0 1 %.1f %.1f Tm\n(%s) Tj\n"
                % (60.0 + 130.0 * c, 700.0 - 16.0 * r,
                   _esc_literal(cell)))
        tparts.append(b"ET\n")
        content = b.add(_stream_obj(b"".join(tparts), compress))
        pid = b.reserve()
        page_ids.append(pid)
        page_bodies.append((pid, (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R /F2 %d 0 R >> >> "
            b"/Contents %d 0 R >>"
            % (pages, f1, f2, content)
        )))

    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    pages_body = (
        b"<< /Type /Pages /Count %d /Kids [%s] >>" % (len(page_ids), kids)
    )
    outlines_ref = b""
    if bookmarks:
        outline_root = b.reserve()
        item_ids = [b.reserve() for _ in bookmarks]
        children: Dict[Optional[int], List[int]] = {None: []}
        parent: List[Optional[int]] = [None] * len(bookmarks)
        stack: List[Tuple[int, int]] = []
        for i, (lv, _t, _p) in enumerate(bookmarks):
            while stack and stack[-1][0] >= lv:
                stack.pop()
            parent[i] = stack[-1][1] if stack else None
            children.setdefault(parent[i], []).append(i)
            children.setdefault(i, [])
            stack.append((lv, i))

        def ndesc(i):
            return (len(children[i])
                    + sum(ndesc(c) for c in children[i]))

        for i, (_lv, title, pg) in enumerate(bookmarks):
            sibs = children[parent[i]]
            k = sibs.index(i)
            prev_ = (b"/Prev %d 0 R " % item_ids[sibs[k - 1]]
                     if k > 0 else b"")
            next_ = (b"/Next %d 0 R " % item_ids[sibs[k + 1]]
                     if k + 1 < len(sibs) else b"")
            kc = children[i]
            first_ = (b"/First %d 0 R /Last %d 0 R /Count %d "
                      % (item_ids[kc[0]], item_ids[kc[-1]], ndesc(i))
                      if kc else b"")
            pid = (outline_root if parent[i] is None
                   else item_ids[parent[i]])
            try:
                ts = _pdf_str(title)
            except UnicodeEncodeError:   # UTF-16BE hex string + BOM
                ts = (b"<FEFF"
                      + title.encode("utf-16-be").hex().upper().encode()
                      + b">")
            b.set(item_ids[i], (
                b"<< /Title %s /Parent %d 0 R %s%s%s"
                b"/Dest [%d 0 R /Fit] >>"
                % (ts, pid, prev_, next_, first_,
                   page_ids[pg % len(page_ids)])))
        roots_ = children[None]
        b.set(outline_root, (
            b"<< /Type /Outlines /First %d 0 R /Last %d 0 R /Count %d >>"
            % (item_ids[roots_[0]], item_ids[roots_[-1]],
               len(bookmarks))))
        outlines_ref = b" /Outlines %d 0 R" % outline_root
    acro_ref = b""
    if form_fields:
        def _txt(s: str) -> bytes:
            try:
                return _pdf_str(s)
            except UnicodeEncodeError:
                return (b"<FEFF"
                        + s.encode("utf-16-be").hex().upper().encode()
                        + b">")

        tops: List[int] = []
        for i, (fname, fval) in enumerate(form_fields):
            if i % 2 and "." in fname:
                ppart, cpart = fname.rsplit(".", 1)
                parent_id = b.reserve()
                kid = b.add(b"<< /T %s /Parent %d 0 R >>"
                            % (_txt(cpart), parent_id))
                b.set(parent_id, (
                    b"<< /FT /Tx /T %s /V %s /Kids [%d 0 R] >>"
                    % (_txt(ppart), _txt(fval), kid)))
                tops.append(parent_id)
            else:
                tops.append(b.add(b"<< /FT /Tx /T %s /V %s >>"
                                  % (_txt(fname), _txt(fval))))
        acro = b.add(b"<< /Fields [%s] >>"
                     % b" ".join(b"%d 0 R" % t for t in tops))
        acro_ref = b" /AcroForm %d 0 R" % acro
    info_num = None
    if doc_info:
        def _istr(x: str) -> bytes:
            try:
                return _pdf_str(x)
            except UnicodeEncodeError:
                return (b"<FEFF"
                        + x.encode("utf-16-be").hex().upper().encode()
                        + b">")

        parts = []
        for key in ("Title", "Author", "Producer", "CreationDate"):
            if doc_info.get(key) is not None:
                parts.append(b"/" + key.encode() + b" "
                             + _istr(doc_info[key]))
        info_num = b.add(b"<< " + b" ".join(parts) + b" >>")
    xmp_ref = b""
    if xmp:
        def _xesc(x: str) -> str:
            return (x.replace("&", "&amp;").replace("<", "&lt;")
                    .replace(">", "&gt;"))

        xml = ['<?xpacket begin="\ufeff" id="W5M0MpCehiHzreSzNTczkc9d"?>',
               '<x:xmpmeta xmlns:x="adobe:ns:meta/">',
               '<rdf:RDF xmlns:rdf='
               '"http://www.w3.org/1999/02/22-rdf-syntax-ns#">',
               '<rdf:Description xmlns:dc='
               '"http://purl.org/dc/elements/1.1/">']
        if xmp.get("title") is not None:
            xml.append('<dc:title><rdf:Alt>'
                       '<rdf:li xml:lang="x-default">%s</rdf:li>'
                       '</rdf:Alt></dc:title>' % _xesc(xmp["title"]))
        if xmp.get("creator") is not None:
            xml.append('<dc:creator><rdf:Seq><rdf:li>%s</rdf:li>'
                       '</rdf:Seq></dc:creator>' % _xesc(xmp["creator"]))
        xml += ['</rdf:Description>', '</rdf:RDF>', '</x:xmpmeta>',
                '<?xpacket end="w"?>']
        payload = "\n".join(xml).encode("utf-8")
        # uncompressed, per the spec's recommendation that metadata
        # stay scannable by XMP-only readers
        xnum = b.add(b"<< /Type /Metadata /Subtype /XML /Length %d >>"
                     b"\nstream\n%s\nendstream" % (len(payload), payload))
        xmp_ref = b" /Metadata %d 0 R" % xnum
    plabels_ref = b""
    if page_labels:
        def _lstr(x: str) -> bytes:
            try:
                return _pdf_str(x)
            except UnicodeEncodeError:
                return (b"<FEFF"
                        + x.encode("utf-16-be").hex().upper().encode()
                        + b">")

        def _spec(spec: dict) -> bytes:
            parts = []
            if spec.get("S"):
                parts.append(b"/S /" + spec["S"].encode())
            if spec.get("P") is not None:
                parts.append(b"/P " + _lstr(spec["P"]))
            if spec.get("St") is not None:
                parts.append(b"/St %d" % spec["St"])
            return b"<< " + b" ".join(parts) + b" >>"

        ranges = sorted(page_labels, key=lambda r: r[0])
        def _nums(rs) -> bytes:
            return (b"/Nums [" + b" ".join(
                b"%d %s" % (st, _spec(sp)) for st, sp in rs) + b"]")
        if len(ranges) >= 3:
            half = len(ranges) // 2
            kids = []
            for part in (ranges[:half], ranges[half:]):
                kids.append(b.add(
                    b"<< /Limits [%d %d] %s >>"
                    % (part[0][0], part[-1][0], _nums(part))))
            plroot = b.add(b"<< /Kids [%s] >>"
                           % b" ".join(b"%d 0 R" % k for k in kids))
        else:
            plroot = b.add(b"<< %s >>" % _nums(ranges))
        plabels_ref = b" /PageLabels %d 0 R" % plroot
    root_body = (b"<< /Type /Catalog /Pages %d 0 R%s%s%s%s >>"
                 % (pages, outlines_ref, acro_ref, plabels_ref,
                    xmp_ref))

    packed: Dict[int, Tuple[int, int]] = {}
    if objstm:
        # Pack catalog/pages/fonts/page dicts into one object stream.
        members = [(root, root_body), (pages, pages_body),
                   (f1, f1_body), (f2, f2_body)] + page_bodies
        header = b""
        payload = b""
        for num, body in members:
            header += b"%d %d " % (num, len(payload))
            payload += body + b" "
        data = header + payload
        objstm_num = b.add(_stream_obj(
            data, compress,
            extra=b" /Type /ObjStm /N %d /First %d" % (len(members), len(header)),
        ))
        if xref_stream:
            # conforming 1.5: members exist ONLY in the object stream,
            # located through type-2 xref entries
            packed = {num: (objstm_num, idx)
                      for idx, (num, _) in enumerate(members)}
        else:
            # classic-table build: top-level null placeholders (readers
            # that scan object streams — ours — find the members there)
            for num, _ in members:
                b.set(num, b"null")
    else:
        b.set(root, root_body)
        b.set(pages, pages_body)
        b.set(f1, f1_body)
        b.set(f2, f2_body)
        for num, body in page_bodies:
            b.set(num, body)

    return b.render(xref_stream=xref_stream, compress=compress,
                    packed=packed, xref_predictor=xref_predictor,
                    info=info_num)


def append_text_update(pdf: bytes, new_text: str) -> bytes:
    """Incremental update (ISO 32000-1 §7.5.6): append a REVISED
    content stream for the first page plus an update xref section
    whose trailer /Prev links the previous table — the append-only
    save every PDF editor performs (form fills, annotations,
    signatures).  The original bytes are untouched; a conforming
    reader resolves the newest revision of the object, and our
    scan-based tokenizer gets the same answer because later
    ``N 0 obj`` spans overwrite earlier ones in byte order.

    ``new_text`` is rendered through /F1 (ASCII only — an update
    cannot extend a prior revision's embedded font tables)."""
    if any(ord(c) > 126 for c in new_text):
        raise ValueError("incremental updates render via /F1: ASCII only")
    from .tokenizer import PdfDocument, Ref, _OBJ_RE

    doc = PdfDocument(pdf)
    pages = doc.pages()
    if not pages:
        raise ValueError("no pages to update")
    contents = pages[0].get("Contents")
    if not isinstance(contents, Ref):
        raise ValueError("first page has an inline/absent /Contents")
    target = contents[0]
    root_num = next(
        (int(m.group(1)) for m in _OBJ_RE.finditer(pdf)
         if isinstance(doc.objects.get(int(m.group(1))), dict)
         and doc.objects[int(m.group(1))].get("Type") == "Catalog"),
        1)
    stream = _page_stream(new_text.split("\n"), {})
    body = _stream_obj(stream, compress=True)
    base = pdf if pdf.endswith(b"\n") else pdf + b"\n"
    offset = len(base)
    chunk = b"%d 0 obj\n" % target + body + b"\nendobj\n"
    prev = int(re.findall(rb"startxref\s+(\d+)", pdf)[-1])
    xref_pos = offset + len(chunk)
    update = (
        chunk
        + b"xref\n0 1\n0000000000 65535 f \n"
        + b"%d 1\n%010d 00000 n \n" % (target, offset)
        + b"trailer\n<< /Size %d /Root %d 0 R /Prev %d >>\n"
          b"startxref\n%d\n%%%%EOF\n"
        % (target + 1, root_num, prev, xref_pos)
    )
    return base + update
