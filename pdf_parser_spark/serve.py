"""Request/response parity surface: the reference's ONLY external API
is ``POST /parse`` (app.py:9-29 — multipart upload → JSON array of
normalized transactions).  This is the same endpoint over this repo's
engine, stdlib-only (no fastapi/uvicorn in the sandbox; on a cluster
you would front the same ``parse_payload`` function with any ASGI
app).

Semantics match the reference lifecycle exactly, minus its double
parse: extract once → detect → parse → normalize → JSON array of
``{date, description, amount, direction}``.

Run: ``python -m pdf_parser_spark.serve [port]``.
"""

from __future__ import annotations

import json
from email.parser import BytesParser
from email.policy import default as _email_default
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

from .engine.document import parse_document
from .pdfio.extract import extract_document


def parse_payload(payload: bytes, fallback_year: int = 1970) -> List[dict]:
    """The POST /parse semantics as one function: payload bytes →
    normalized transaction dicts (reference app.py:11-29).  The
    reference's wall-clock year fallback (base.py:54) is pinned to an
    explicit parameter, as everywhere else in this repo."""
    doc = extract_document(payload)
    _bank, txs = parse_document(doc.text, fallback_year)
    return txs


def _multipart_file(content_type: str, body: bytes) -> Optional[bytes]:
    """The ``file`` part of a multipart/form-data body, matching the
    reference endpoint's field binding (app.py:10 ``file: UploadFile``):
    prefer the part whose Content-Disposition name is ``file``, fall
    back to the first part carrying a filename — never a leading text
    field (stdlib email parser; no external deps)."""
    msg = BytesParser(policy=_email_default).parsebytes(
        b"Content-Type: " + content_type.encode("latin-1") + b"\r\n\r\n"
        + body
    )
    if not msg.is_multipart():
        return None
    fallback = None
    for part in msg.iter_parts():
        if part.get_content_disposition() != "form-data":
            continue
        if part.get_param("name", header="content-disposition") == "file":
            return part.get_payload(decode=True)
        if fallback is None and part.get_filename() is not None:
            fallback = part.get_payload(decode=True)
    return fallback


class _Handler(BaseHTTPRequestHandler):
    fallback_year = 1970

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        if self.path.rstrip("/") != "/parse":
            self.send_error(404)
            return
        if "chunked" in (self.headers.get("Transfer-Encoding") or "") \
                .lower():
            # a missing Content-Length would silently read 0 bytes
            self.send_error(411, "chunked upload not supported")
            return
        length = int(self.headers.get("Content-Length", "0"))
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "")
        payload = body
        if ctype.startswith("multipart/"):
            payload = _multipart_file(ctype, body)
            if payload is None:
                self.send_error(400, "no file part")
                return
        try:
            txs = parse_payload(payload, self.fallback_year)
        except Exception as exc:  # engine never raises; belt+braces
            self.send_response(500)
            out = json.dumps({"error": str(exc)}).encode("utf-8")
        else:
            self.send_response(200)
            out = json.dumps(txs).encode("utf-8")
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


def make_server(port: int = 0,
                fallback_year: int = 1970) -> ThreadingHTTPServer:
    handler = type("Handler", (_Handler,),
                   {"fallback_year": fallback_year})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main(port: int = 8000) -> None:
    srv = make_server(port)
    print("POST /parse on http://127.0.0.1:%d" % srv.server_address[1])
    srv.serve_forever()


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8000)
