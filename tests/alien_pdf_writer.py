"""A second, deliberately-alien minimal PDF writer (round-4 verdict
ask #7): the tokenizer (pdf_parser_spark/pdfio/tokenizer.py) must not
merely round-trip its sibling writer's five layouts — it has to read
PDFs it did NOT write.  Every builder here makes structural choices
the in-package writer (pdfio/writer.py) never makes:

=====================  ======================  =======================
convention             pdfio/writer.py         this module
=====================  ======================  =======================
object order           ascending, catalog      reverse / interleaved,
                       first                   catalog last or first
EOLs                   \\n                      \\r\\n (classic), \\r
                                               inside content (quote)
show operator          one Tj per line         hex-string Tj / TJ
                                               kern arrays / TL + '
line positioning       Td per line             Tm per line, TL + '
/Length                direct int              INDIRECT reference
ToUnicode              bfchar entries          bfrange runs, or NO
                                               ToUnicode (latin-1)
stream filter          /Filter /FlateDecode    none (classic), ARRAY
                                               [/FlateDecode] (tj)
page tree              flat Kids               nested Pages node (tj)
xref                   one subsection          two subsections
spaces in text         literal 0x20 in the     geometric kern gap (tj:
                       show string             no 0x20 byte anywhere)
comments               none                    % comments between
                                               objects / after dicts
string escapes         minimal                 octal escapes + line
                                               continuations (quote)
generation numbers     always 0                gen 3 objects (quote)
=====================  ======================  =======================

Variant 4 (``alien_filters``) additionally exercises the non-Flate
stream filters: /ASCIIHexDecode, the [/ASCII85Decode /FlateDecode]
decode CHAIN, /RunLengthDecode, and the abbreviated /AHx name.

All builders emit spec-conforming PDF 1.4 (ISO 32000-1) for the
repertoire they target; extracted text must equal the input text
byte-for-byte (pages split on \\f, re-joined with \\n by the
extractor).  Glyph geometry uses the same Courier metrics the
extractor assumes (char_em 0.6 x size 10 = 6pt advance, 12pt leading
> Y_TOLERANCE).  Texts must be latin-1-encodable with no empty lines
(an empty line paints no glyph run, so no extractor can see it).
"""

from __future__ import annotations

import zlib
from typing import List, Tuple

SIZE = 10       # Tf size
LEAD = 12       # > tokenizer Y_TOLERANCE (3pt)
TOP = 700


def _pages_of(text: str) -> List[List[str]]:
    return [p.split("\n") for p in text.split("\f")]


def _bfrange_cmap(text: str) -> bytes:
    """ToUnicode CMap written ONLY with bfrange runs (identity code →
    codepoint), the section shape the sibling writer never emits."""
    chars = set(text.replace("\n", "").replace("\f", ""))
    codes = sorted(ord(c) for c in chars)
    runs: List[Tuple[int, int]] = []
    for c in codes:
        if runs and c == runs[-1][1] + 1:
            runs[-1] = (runs[-1][0], c)
        else:
            runs.append((c, c))
    body = "\n".join("<%04X> <%04X> <%04X>" % (lo, hi, lo)
                     for lo, hi in runs)
    return ("""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
/CMapName /Alien-UCS def /CMapType 2 def
1 begincodespacerange <00> <FF> endcodespacerange
%d beginbfrange
%s
endbfrange
endcmap CMapName currentdict /CMap defineresource pop end end
""" % (len(runs), body)).encode("ascii")


class _AlienDoc:
    """Assembles numbered objects, emits them in an ARBITRARY caller-
    chosen order, and writes a correct two-subsection xref for
    wherever they landed."""

    def __init__(self, eol: bytes = b"\r\n"):
        self.eol = eol
        self.bodies = {}       # num -> bytes (object body, no wrapper)
        self.gens = {}         # num -> generation
        self._next = 1

    def reserve(self, gen: int = 0) -> int:
        n = self._next
        self._next += 1
        self.gens[n] = gen
        return n

    def put(self, num: int, body: bytes) -> int:
        self.bodies[num] = body
        return num

    def add(self, body: bytes, gen: int = 0) -> int:
        return self.put(self.reserve(gen), body)

    def render(self, emission_order: List[int],
               comments: bool = False,
               trailer_extra: bytes = b"") -> bytes:
        eol = self.eol
        out = bytearray(b"%PDF-1.4" + eol +
                        b"%\xc2\xa9 alien writer" + eol)
        offsets = {}
        for num in emission_order:
            if comments:
                out += b"% object follows" + eol
            offsets[num] = len(out)
            out += (b"%d %d obj" % (num, self.gens[num])) + eol
            out += self.bodies[num] + eol
            out += b"endobj" + eol
        xref_at = len(out)
        nums = sorted(offsets)
        # contiguous live range expected (object numbers start at 1)
        assert nums == list(range(1, len(nums) + 1))
        out += b"xref" + eol
        # subsection 1: the free-list head alone; subsection 2: all
        # live objects — the split layout a single-subsection writer
        # never produces (each entry is exactly 20 bytes, §7.5.4)
        out += b"0 1" + eol
        out += b"0000000000 65535 f \r\n"
        out += (b"%d %d" % (nums[0], len(nums))) + eol
        for n in nums:
            out += b"%010d %05d n \r\n" % (offsets[n], self.gens[n])
        root = [n for n in nums if b"/Type /Catalog" in self.bodies[n]][0]
        out += b"trailer" + eol
        out += (b"<< /Size %d /Root %d %d R%s >>"
                % (max(nums) + 1, root, self.gens[root],
                   trailer_extra)) + eol
        out += b"startxref" + eol
        out += (b"%d" % xref_at) + eol
        out += b"%%EOF" + eol
        return bytes(out)


def alien_classic(text: str) -> bytes:
    """Variant 1: \\r\\n EOLs, % comments between objects and after
    the stream dict, HEX-string Tj per line, Tm line positioning,
    /Length as an INDIRECT reference (forces the endstream-scan
    fallback), uncompressed content, bfrange-only ToUnicode, content
    streams emitted before their length objects, catalog LAST."""
    doc = _AlienDoc(eol=b"\r\n")
    cmap = _bfrange_cmap(text)
    cm = doc.add(b"<< /Length %d >>\nstream\n" % len(cmap) +
                 cmap + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for lines in _pages_of(text):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        content = b"\r\n".join(ops)
        lenobj = doc.add(b"%d" % len(content))
        stream = doc.add(
            (b"<< /Length %d 0 R >>" % lenobj) +
            b" % indirect Length\r\nstream\r\n" +
            content + b"\r\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >> >>"
                     b" /Contents %d 0 R >>" % (pages_node, f1, stream))
        page_nums.append(pg)
        emission += [stream, lenobj, pg]              # stream FIRST
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    return doc.render(emission + [f1, cm, pages_node, catalog],
                      comments=True)


def alien_tj_kerning(text: str) -> bytes:
    """Variant 2: TJ kern arrays — every 0x20 is ENCODED GEOMETRICALLY
    (chunk split + a -1000 milli-em kern = a 10pt gap at size 10, well
    past the extractor's quarter-advance space threshold; NO space
    byte appears in any show string); /Filter as the ARRAY form
    [/FlateDecode]; a NESTED page tree (root Pages → inner Pages →
    leaves); NO ToUnicode (latin-1 fallback decode); catalog emitted
    FIRST with pages/streams interleaved."""
    doc = _AlienDoc(eol=b"\n")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1"
                 b" /BaseFont /Courier >>")
    root_pages = doc.reserve()
    inner = doc.reserve()
    page_nums, emission = [], []

    def lit(s: str) -> bytes:
        b = s.encode("latin-1")
        return (b"(" + b.replace(b"\\", rb"\\").replace(b"(", rb"\(")
                .replace(b")", rb"\)") + b")")

    for lines in _pages_of(text):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            arr = []
            for i, part in enumerate(ln.split(" ")):
                if i:
                    arr.append(b"-1000")
                arr.append(lit(part))
            ops.append(b"[" + b" ".join(arr) + b"] TJ")
            y -= LEAD
        ops.append(b"ET")
        z = zlib.compress(b"\n".join(ops))
        stream = doc.add(b"<< /Filter [/FlateDecode] /Length %d >>\n"
                         b"stream\n" % len(z) + z + b"\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >> >>"
                     b" /Contents [%d 0 R] >>" % (inner, f1, stream))
        page_nums.append(pg)
        emission += [pg, stream]                      # page BEFORE stream
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(inner, b"<< /Type /Pages /Parent %d 0 R /Count %d"
                   b" /Kids [%s] >>" % (root_pages, len(page_nums), kids))
    doc.put(root_pages, b"<< /Type /Pages /Count %d /Kids [%d 0 R] >>"
            % (len(page_nums), inner))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % root_pages)
    return doc.render([catalog, inner] + emission + [f1, root_pages])


def alien_quote_ops(text: str) -> bytes:
    """Variant 3: \\r-only EOLs inside content streams, TL leading +
    the ' (move-next-line-show) operator for every line after the
    first, literal strings with OCTAL escapes for every
    non-alphanumeric byte plus a backslash LINE CONTINUATION spliced
    between tokens, and nonzero GENERATION numbers echoed by the
    xref."""
    GEN = 3
    doc = _AlienDoc(eol=b"\n")

    def esc_octal(s: str) -> bytes:
        toks = []
        for ch in s:
            b = ord(ch)
            if ch.isalnum() and b < 128:
                toks.append(ch.encode("ascii"))
            else:
                toks.append(("\\%03o" % b).encode("ascii"))
        # a line-continuation backslash between two COMPLETE tokens
        # (never mid-escape): the lexer must splice it to nothing
        if len(toks) > 2:
            toks.insert(2, b"\\\n")
        return b"".join(toks)

    cmap = _bfrange_cmap(text)
    cm = doc.add(b"<< /Length %d >>\nstream\n" % len(cmap) +
                 cmap + b"\nendstream", gen=GEN)
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d %d R >>" % (cm, GEN), gen=GEN)
    pages_node = doc.reserve(gen=GEN)
    page_nums, emission = [], []
    for lines in _pages_of(text):
        ops = [b"BT", b"/F1 %d Tf" % SIZE, b"%d TL" % LEAD,
               b"1 0 0 1 72 %d Tm" % TOP]
        for i, ln in enumerate(lines):
            lit = b"(" + esc_octal(ln) + b")"
            ops.append(lit + (b" Tj" if i == 0 else b" '"))
        ops.append(b"ET")
        content = b"\r".join(ops)
        stream = doc.add(b"<< /Length %d >>\nstream\n" % len(content) +
                         content + b"\nendstream", gen=GEN)
        pg = doc.add(b"<< /Type /Page /Parent %d %d R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d %d R >> >>"
                     b" /Contents %d %d R >>"
                     % (pages_node, GEN, f1, GEN, stream, GEN), gen=GEN)
        page_nums.append(pg)
        emission += [stream, pg]
    kids = b" ".join(b"%d %d R" % (p, GEN) for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d %d R >>"
                      % (pages_node, GEN), gen=GEN)
    return doc.render([pages_node] + emission + [f1, cm, catalog])


def alien_filters(text: str) -> bytes:
    """Variant 4: non-Flate stream FILTERS (ISO 32000-1 §7.4) — page
    content cycles ASCIIHexDecode → [ASCII85Decode, FlateDecode]
    (a decode CHAIN: flate-compressed, then a85-armored) →
    RunLengthDecode; the ToUnicode CMap ships under the abbreviated
    filter name /AHx.  The sibling writer only ever emits
    /FlateDecode."""
    import base64

    def rl_encode(data: bytes) -> bytes:
        out = bytearray()
        for i in range(0, len(data), 128):
            chunk = data[i:i + 128]
            out.append(len(chunk) - 1)
            out += chunk
        out.append(128)
        return bytes(out)

    encoders = [
        (b"/Filter /ASCIIHexDecode",
         lambda b: b.hex().upper().encode("ascii") + b">"),
        (b"/Filter [/ASCII85Decode /FlateDecode]",
         lambda b: base64.a85encode(zlib.compress(b)) + b"~>"),
        (b"/Filter /RunLengthDecode", rl_encode),
    ]
    doc = _AlienDoc(eol=b"\n")
    cmap = _bfrange_cmap(text)
    cm_enc = cmap.hex().upper().encode("ascii") + b">"
    cm = doc.add(b"<< /Filter /AHx /Length %d >>\nstream\n" % len(cm_enc) +
                 cm_enc + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for pno, lines in enumerate(_pages_of(text)):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        fdecl, enc = encoders[pno % len(encoders)]
        payload = enc(b"\n".join(ops))
        stream = doc.add(b"<< " + fdecl + b" /Length %d >>\n"
                         b"stream\n" % len(payload) + payload +
                         b"\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >> >>"
                     b" /Contents %d 0 R >>" % (pages_node, f1, stream))
        page_nums.append(pg)
        emission += [stream, pg]
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    return doc.render(emission + [cm, f1, pages_node, catalog])


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode inverse (§7.4.4): 9→12-bit MSB-first codes,
    leading clear-table (256), EOD (257).  Width changes mirror the
    decoder exactly: the decoder's table is one entry BEHIND the
    encoder's (it appends on the NEXT code), so the encoder tracks
    ``dec_len`` — the decoder's table length after it consumes each
    emitted code — and widens when ``dec_len + early`` reaches the
    width ceiling, ``early`` being /EarlyChange (default 1)."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    def reset():
        return {bytes([i]): i for i in range(256)}, 258, 258, True

    emit(256)
    table, nxt, dec_len, first = reset()
    w = b""

    def emit_word(word: bytes) -> None:
        nonlocal width, dec_len, first
        emit(table[word])
        if first:
            first = False
        else:
            dec_len += 1
        if dec_len + early >= (1 << width) and width < 12:
            width += 1

    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w = w + c
            continue
        emit_word(w)
        table[w + c] = nxt
        nxt += 1
        w = c
        if nxt >= 4093:          # table nearly full: clear (decoder resets too)
            emit_word(w)
            emit(256)
            width = 9
            table, nxt, dec_len, first = reset()
            w = b""
    if w:
        emit_word(w)
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _png_encode(data: bytes, rowlen: int, tag: int) -> bytes:
    """Forward PNG row filter (RFC 2083 §6): Sub(1)/Up(2)/Paeth(4),
    one tag byte per row — the inverse of tokenizer._predictor_undo."""
    out = bytearray()
    prior = bytes(rowlen)
    for r in range(0, len(data), rowlen):
        row = data[r:r + rowlen]
        out.append(tag)
        for i, v in enumerate(row):
            if tag == 1:
                pred = row[i - 1] if i >= 1 else 0
            elif tag == 2:
                pred = prior[i] if i < len(prior) else 0
            else:  # 4: Paeth with bpp=1
                a = row[i - 1] if i >= 1 else 0
                b = prior[i] if i < len(prior) else 0
                c = prior[i - 1] if i >= 1 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((v - pred) & 0xFF)
        prior = row
    return bytes(out)


def alien_lzw_predictor(text: str) -> bytes:
    """Variant 5: the §7.4.4 repertoire the sibling writer never
    emits — page content cycles /LZWDecode (EarlyChange default) →
    /LZWDecode with /DecodeParms << /EarlyChange 0 >> → /FlateDecode
    with a PNG Paeth predictor (/Predictor 15 — per-row tags, so any
    10-15 value must decode identically) over 40-byte rows.  The
    ToUnicode CMap ships LZW-compressed under the abbreviated /LZW
    name with a TIFF Predictor 2 parm dict."""
    cols = 40

    def png_paeth(b: bytes) -> bytes:
        pad = (-len(b)) % cols
        return zlib.compress(_png_encode(b + b" " * pad, cols, 4))

    def tiff2_encode(b: bytes) -> bytes:
        out = bytearray()
        for r in range(0, len(b), cols):
            row = b[r:r + cols]
            out.append(row[0])
            for i in range(1, len(row)):
                out.append((row[i] - row[i - 1]) & 0xFF)
        return _lzw_encode(bytes(out))

    encoders = [
        (b"/Filter /LZWDecode", _lzw_encode),
        (b"/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>",
         lambda b: _lzw_encode(b, early=0)),
        (b"/Filter /FlateDecode /DecodeParms"
         b" << /Predictor 15 /Columns %d >>" % cols, png_paeth),
    ]
    doc = _AlienDoc(eol=b"\n")
    cmap = _bfrange_cmap(text)
    pad = (-len(cmap)) % cols
    cm_enc = tiff2_encode(cmap + b" " * pad)
    cm = doc.add(b"<< /Filter /LZW /DP << /Predictor 2 /Columns %d >>"
                 b" /Length %d >>\nstream\n" % (cols, len(cm_enc)) +
                 cm_enc + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for pno, lines in enumerate(_pages_of(text)):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        fdecl, enc = encoders[pno % len(encoders)]
        payload = enc(b"\n".join(ops))
        stream = doc.add(b"<< " + fdecl + b" /Length %d >>\n"
                         b"stream\n" % len(payload) + payload +
                         b"\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >> >>"
                     b" /Contents %d 0 R >>" % (pages_node, f1, stream))
        page_nums.append(pg)
        emission += [stream, pg]
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    return doc.render(emission + [cm, f1, pages_node, catalog])


def alien_form_inline(text: str) -> bytes:
    """Variant 6: per page, EVEN lines paint in the page content
    stream and ODD lines inside a /Subtype /Form XObject invoked with
    ``Do`` (its own /Resources; the y-sweep must interleave the two
    streams' runs back into source order).  Between them the page
    stream embeds an INLINE IMAGE (``BI … ID … EI``) whose 32-byte
    binary payload is a trap: it contains ``(LEAKED) Tj`` and a fake
    ``BT/ET`` block — a reader that lexes instead of skipping the
    payload emits phantom glyphs.  No sibling-writer convention: the
    in-package writer emits neither XObjects nor inline images."""
    doc = _AlienDoc(eol=b"\n")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1"
                 b" /BaseFont /Courier >>")
    pages_node = doc.reserve()

    def lit(s: str) -> bytes:
        b = s.encode("latin-1")
        return (b"(" + b.replace(b"\\", rb"\\").replace(b"(", rb"\(")
                .replace(b")", rb"\)") + b")")

    # 16x2 8-bit gray image => exactly 32 payload bytes; the trap
    # bytes deliberately avoid any whitespace-EI-whitespace run
    trap = b"(LEAKED) Tj BT (X) Tj ET \x00\xfe\x89"
    trap += b"\xaa" * (32 - len(trap))
    assert len(trap) == 32 and b" EI " not in trap
    inline = (b"BI /W 16 /H 2 /CS /G /BPC 8 ID " + trap + b" EI")

    page_nums, emission = [], []
    for lines in _pages_of(text):
        page_ops = [b"BT", b"/F1 %d Tf" % SIZE]
        form_ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for i, ln in enumerate(lines):
            dst = page_ops if i % 2 == 0 else form_ops
            dst.append(b"1 0 0 1 72 %d Tm" % y)
            dst.append(lit(ln) + b" Tj")
            y -= LEAD
        page_ops.append(b"ET")
        form_ops.append(b"ET")
        fbody = b"\n".join(form_ops)
        form = doc.add(b"<< /Type /XObject /Subtype /Form"
                       b" /BBox [0 0 612 792]"
                       b" /Resources << /Font << /F1 %d 0 R >> >>"
                       b" /Length %d >>\nstream\n" % (f1, len(fbody)) +
                       fbody + b"\nendstream")
        content = (b"\n".join(page_ops) + b"\nq\n" + inline +
                   b"\nQ\n/Fx1 Do")
        stream = doc.add(b"<< /Length %d >>\nstream\n" % len(content) +
                         content + b"\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >>"
                     b" /XObject << /Fx1 %d 0 R >> >>"
                     b" /Contents %d 0 R >>"
                     % (pages_node, f1, form, stream))
        page_nums.append(pg)
        emission += [form, stream, pg]
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    return doc.render(emission + [f1, pages_node, catalog])


def _writer_rc4(key: bytes, data: bytes) -> bytes:
    """Independent RC4 (deliberately NOT shared with the reader's)."""
    state = bytearray(range(256))
    j = 0
    for i in range(256):
        j = (j + state[i] + key[i % len(key)]) % 256
        state[i], state[j] = state[j], state[i]
    out, i, j = bytearray(), 0, 0
    for byte in data:
        i = (i + 1) % 256
        j = (j + state[i]) % 256
        state[i], state[j] = state[j], state[i]
        out.append(byte ^ state[(state[i] + state[j]) % 256])
    return bytes(out)


_WRITER_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def alien_rc4(text: str, revision: int = 3) -> bytes:
    """Variant 7: an RC4-ENCRYPTED document (standard security
    handler, blank user password — /R 2 gives 40-bit /V 1, /R 3
    gives 128-bit /V 2 with the 50-round key hardening).  Every
    content/CMap stream is ciphered under its per-object key; the
    reader must find /Encrypt through the trailer, re-derive the file
    key from (O, P, ID), and decrypt before any parsing can work.
    Cipher, MD5 chaining, and key assembly are implemented here
    independently of the reader's."""
    import hashlib

    assert revision in (2, 3)
    n = 5 if revision == 2 else 16
    o_entry = bytes(range(0x40, 0x60))      # opaque 32 bytes
    perm = -44
    file_id = hashlib.md5(text.encode("latin-1")).digest()
    key = hashlib.md5(
        _WRITER_PAD + o_entry
        + (perm % (1 << 32)).to_bytes(4, "little") + file_id).digest()
    if revision == 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]

    def obj_key(num: int, gen: int = 0) -> bytes:
        return hashlib.md5(
            key + num.to_bytes(3, "little")
            + gen.to_bytes(2, "little")).digest()[:min(n + 5, 16)]

    doc = _AlienDoc(eol=b"\n")
    cmap = _bfrange_cmap(text)
    cm = doc.reserve()
    doc.put(cm, b"<< /Length %d >>\nstream\n" % len(cmap) +
            _writer_rc4(obj_key(cm), cmap) + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for lines in _pages_of(text):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        content = b"\n".join(ops)
        stream = doc.reserve()
        doc.put(stream, b"<< /Length %d >>\nstream\n" % len(content) +
                _writer_rc4(obj_key(stream), content) + b"\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >> >>"
                     b" /Contents %d 0 R >>" % (pages_node, f1, stream))
        page_nums.append(pg)
        emission += [stream, pg]
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    v = 1 if revision == 2 else 2
    enc = doc.add(
        b"<< /Filter /Standard /V %d /R %d /Length %d"
        b" /O <%s> /U <%s> /P %d >>"
        % (v, revision, n * 8, o_entry.hex().upper().encode(),
           (b"\x00" * 32).hex().encode(), perm))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    trailer_extra = (b" /Encrypt %d 0 R /ID [<%s> <%s>]"
                     % (enc, file_id.hex().upper().encode(),
                        file_id.hex().upper().encode()))
    return doc.render([cm, f1] + emission + [pages_node, enc, catalog],
                      trailer_extra=trailer_extra)


def alien_inherited_resources(text: str) -> bytes:
    """Variant 8: NO page carries /Resources — the font dictionary
    lives only on the root /Pages node and must be found by walking
    the /Parent chain (ISO 32000-1 §7.7.3.4 inheritable attributes;
    common in real-world writers that hoist shared resources)."""
    doc = _AlienDoc(eol=b"\n")
    cmap = _bfrange_cmap(text)
    cm = doc.add(b"<< /Length %d >>\nstream\n" % len(cmap) +
                 cmap + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for lines in _pages_of(text):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        content = b"\n".join(ops)
        stream = doc.add(b"<< /Length %d >>\nstream\n" % len(content) +
                         content + b"\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Contents %d 0 R >>" % (pages_node, stream))
        page_nums.append(pg)
        emission += [stream, pg]
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node,
            b"<< /Type /Pages /Count %d /Kids [%s]"
            b" /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (len(page_nums), kids, f1))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    return doc.render([cm, f1] + emission + [pages_node, catalog])


def alien_links(text: str, links=None) -> bytes:
    """Variant 8: link annotations with every convention the sibling
    writer avoids — annotation dicts INLINE inside the page's /Annots
    array (the sibling always uses indirect objects), the /A action as
    a separate INDIRECT object, the /URI as a HEX string, an internal
    /Dest GoTo link (no /A at all — must be skipped), and \\r\\n EOLs
    with comments.  ``links`` maps page index -> list of URIs."""
    links = links or {}
    doc = _AlienDoc(eol=b"\r\n")
    cmap = _bfrange_cmap(text)
    cm = doc.add(b"<< /Length %d >>\nstream\n" % len(cmap) +
                 cmap + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for pno, lines in enumerate(_pages_of(text)):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        content = b"\r\n".join(ops)
        stream = doc.add(b"<< /Length %d >>\r\nstream\r\n" % len(content) +
                         content + b"\r\nendstream")
        parts = []
        for li, uri in enumerate(links.get(pno, [])):
            act = doc.add(b"<< /S /URI /URI <%s> >>"
                          % uri.encode("latin-1").hex().upper().encode())
            emission.append(act)
            parts.append(
                b"<< /Subtype /Link /Rect [10 %d 100 %d] /A %d 0 R >>"
                % (10 + 20 * li, 22 + 20 * li, act))
        if pno in links:
            # internal GoTo link (no /A): the URI extractor skips it
            parts.append(b"<< /Subtype /Link /Rect [0 0 5 5]"
                         b" /Dest [%d 0 R /Fit] >>" % pages_node)
        annots = (b" /Annots [" + b" ".join(parts) + b"]") if parts else b""
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >> >>%s"
                     b" /Contents %d 0 R >>"
                     % (pages_node, f1, annots, stream))
        page_nums.append(pg)
        emission += [stream, pg]
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_node)
    return doc.render(emission + [f1, cm, pages_node, catalog],
                      comments=True)


def alien_bookmarks(text: str, bookmarks=None) -> bytes:
    """Variant 9: outline conventions the sibling never emits — items
    reach their page through /A << /S /GoTo /D ... >> ACTIONS (no
    /Dest key), a UTF-16BE title as a LITERAL string (BOM bytes inside
    parens, not a hex string), a CLOSED subtree (negative /Count), and
    an /Outlines root with no /Type key (optional per §12.3.3)."""
    bookmarks = bookmarks or []
    doc = _AlienDoc(eol=b"\r\n")
    cmap = _bfrange_cmap(text)
    cm = doc.add(b"<< /Length %d >>\nstream\n" % len(cmap) +
                 cmap + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for lines in _pages_of(text):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        content = b"\r\n".join(ops)
        stream = doc.add(b"<< /Length %d >>\r\nstream\r\n" % len(content) +
                         content + b"\r\nendstream")
        pg = doc.add(b"<< /Type /Page /Parent %d 0 R"
                     b" /MediaBox [0 0 612 792]"
                     b" /Resources << /Font << /F1 %d 0 R >> >>"
                     b" /Contents %d 0 R >>" % (pages_node, f1, stream))
        page_nums.append(pg)
        emission += [stream, pg]
    root_out = doc.reserve()
    item_ids = [doc.reserve() for _ in bookmarks]
    children, parent, stack = {None: []}, [None] * len(bookmarks), []
    for i, (lv, _t, _p) in enumerate(bookmarks):
        while stack and stack[-1][0] >= lv:
            stack.pop()
        parent[i] = stack[-1][1] if stack else None
        children.setdefault(parent[i], []).append(i)
        children.setdefault(i, [])
        stack.append((lv, i))
    for i, (_lv, title, pg) in enumerate(bookmarks):
        sibs = children[parent[i]]
        k = sibs.index(i)
        prev_ = b"/Prev %d 0 R " % item_ids[sibs[k - 1]] if k else b""
        next_ = (b"/Next %d 0 R " % item_ids[sibs[k + 1]]
                 if k + 1 < len(sibs) else b"")
        kc = children[i]
        # CLOSED subtree: negative count of immediate kids
        first_ = (b"/First %d 0 R /Last %d 0 R /Count -%d "
                  % (item_ids[kc[0]], item_ids[kc[-1]], len(kc))
                  if kc else b"")
        pid = root_out if parent[i] is None else item_ids[parent[i]]
        try:
            ts = b"(" + title.encode("latin-1") + b")"
        except UnicodeEncodeError:
            raw = b"\xfe\xff" + title.encode("utf-16-be")
            for ch, esc in ((b"\\", b"\\\\"), (b"(", b"\\("),
                            (b")", b"\\)")):
                raw = raw.replace(ch, esc)
            ts = b"(" + raw + b")"          # literal UTF-16BE string
        act = doc.add(b"<< /S /GoTo /D [%d 0 R /Fit] >>"
                      % page_nums[pg % len(page_nums)])
        emission.append(act)
        doc.put(item_ids[i],
                b"<< /Title %s /Parent %d 0 R %s%s%s/A %d 0 R >>"
                % (ts, pid, prev_, next_, first_, act))
    roots_ = children[None]
    if roots_:
        doc.put(root_out, b"<< /First %d 0 R /Last %d 0 R /Count %d >>"
                % (item_ids[roots_[0]], item_ids[roots_[-1]],
                   len(roots_)))
    else:
        doc.put(root_out, b"<< /Count 0 >>")
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R"
                      b" /Outlines %d 0 R >>" % (pages_node, root_out))
    return doc.render(emission + item_ids + [root_out, f1, cm,
                                             pages_node, catalog],
                      comments=True)


def alien_form_fields(text: str, fields=None) -> bytes:
    """Variant 10: AcroForm conventions the sibling avoids — field
    dicts DOUBLING as widget annotations merged into the page's
    /Annots (the layout most real producers emit), /V as a HEX string,
    a two-level /Kids chain where the KID OVERRIDES the parent's /V,
    and a /DA default-appearance key the extractor must ignore.
    ``fields`` is a (name, value) list; every third field nests with
    an overriding kid value."""
    fields = fields or []
    doc = _AlienDoc(eol=b"\r\n")
    cmap = _bfrange_cmap(text)
    cm = doc.add(b"<< /Length %d >>\nstream\n" % len(cmap) +
                 cmap + b"\nendstream")
    f1 = doc.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
                 b" /ToUnicode %d 0 R >>" % cm)
    pages_node = doc.reserve()
    page_nums, emission = [], []
    for lines in _pages_of(text):
        ops = [b"BT", b"/F1 %d Tf" % SIZE]
        y = TOP
        for ln in lines:
            ops.append(b"1 0 0 1 72 %d Tm" % y)
            ops.append(b"<%s> Tj"
                       % ln.encode("latin-1").hex().upper().encode())
            y -= LEAD
        ops.append(b"ET")
        content = b"\r\n".join(ops)
        stream = doc.add(b"<< /Length %d >>\r\nstream\r\n" % len(content) +
                         content + b"\r\nendstream")
        pg = doc.reserve()
        page_nums.append(pg)
        emission += [stream]
    def hexs(s: str) -> bytes:
        raw = s.encode("latin-1") if all(ord(c) < 256 for c in s) \
            else b"\xfe\xff" + s.encode("utf-16-be")
        return b"<" + raw.hex().upper().encode() + b">"
    tops, widgets, field_objs = [], [], []
    for i, (fname, fval) in enumerate(fields):
        if i % 3 == 2 and "." in fname:
            ppart, cpart = fname.rsplit(".", 1)
            parent_id = doc.reserve()
            kid = doc.add(
                b"<< /T %s /V %s /Parent %d 0 R"
                b" /Type /Annot /Subtype /Widget /Rect [0 0 1 1] >>"
                % (hexs(cpart), hexs(fval), parent_id))
            doc.put(parent_id,
                    b"<< /FT /Tx /T %s /V (stale parent value)"
                    b" /Kids [%d 0 R] /DA (/Helv 0 Tf 0 g) >>"
                    % (hexs(ppart), kid))
            tops.append(parent_id)
            widgets.append(kid)
            field_objs += [kid, parent_id]
        else:
            fid = doc.add(
                b"<< /FT /Tx /T %s /V %s /DA (/Helv 0 Tf 0 g)"
                b" /Type /Annot /Subtype /Widget /Rect [0 0 1 1] >>"
                % (hexs(fname), hexs(fval)))
            tops.append(fid)
            widgets.append(fid)
            field_objs.append(fid)
    for j, pg in enumerate(page_nums):
        annots = (b" /Annots [%s]"
                  % b" ".join(b"%d 0 R" % w for w in widgets)
                  if j == 0 and widgets else b"")
        # find this page's content stream (emitted in page order)
        doc.put(pg, b"<< /Type /Page /Parent %d 0 R"
                b" /MediaBox [0 0 612 792]"
                b" /Resources << /Font << /F1 %d 0 R >> >>%s"
                b" /Contents %d 0 R >>"
                % (pages_node, f1, annots, emission[j]))
    acro = doc.add(b"<< /Fields [%s] /DA (/Helv 0 Tf 0 g) >>"
                   % b" ".join(b"%d 0 R" % t for t in tops))
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    doc.put(pages_node, b"<< /Type /Pages /Count %d /Kids [%s] >>"
            % (len(page_nums), kids))
    catalog = doc.add(b"<< /Type /Catalog /Pages %d 0 R"
                      b" /AcroForm %d 0 R >>" % (pages_node, acro))
    return doc.render(emission + page_nums + field_objs
                      + [f1, cm, acro, pages_node, catalog],
                      comments=True)
