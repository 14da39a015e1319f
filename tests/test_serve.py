"""POST /parse parity: the serving shim must return exactly the
reference API's response — the normalized transaction array — for
fixture payloads, matching the reference-executed goldens."""

import json
import pathlib
import threading
import urllib.request
import uuid

import pytest

from pdf_parser_spark.fixtures import fixture_docs
from pdf_parser_spark.pdfio.writer import text_to_pdf
from pdf_parser_spark.serve import make_server, parse_payload

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "expected_tx.json").read_text()
)


def _expected(url):
    return GOLDEN.get(url + "#detected", GOLDEN[url])


@pytest.fixture(scope="module")
def server():
    srv = make_server(0, fallback_year=2024)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield "http://127.0.0.1:%d" % srv.server_address[1]
    srv.shutdown()


def _post_multipart(base, payload: bytes):
    boundary = uuid.uuid4().hex
    body = (
        ("--%s\r\nContent-Disposition: form-data; name=\"file\"; "
         "filename=\"doc.pdf\"\r\n"
         "Content-Type: application/pdf\r\n\r\n" % boundary)
        .encode("latin-1")
        + payload
        + ("\r\n--%s--\r\n" % boundary).encode("latin-1")
    )
    req = urllib.request.Request(
        base + "/parse", data=body, method="POST",
        headers={"Content-Type":
                 "multipart/form-data; boundary=%s" % boundary})
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_post_parse_matches_reference_goldens(server):
    checked = 0
    for doc in fixture_docs():
        if doc["warc_ts"].year != 2024 or checked >= 5:
            continue
        payload = text_to_pdf(doc["text"])
        status, got = _post_multipart(server, payload)
        assert status == 200
        want = _expected(doc["url"])["txs"]
        assert len(got) == len(want), doc["url"]
        for g, w in zip(got, want):
            assert g["date"] == w["date"]
            assert g["description"] == w["description"]
            assert repr(g["amount"]) == repr(float(w["amount"]))
            assert g["direction"] == w["direction"]
        checked += 1
    assert checked == 5


def test_post_parse_raw_body_and_poison(server):
    # raw (non-multipart) body is accepted too
    payload = text_to_pdf("chase.com statement\n01/03 Deposit 100.00")
    req = urllib.request.Request(
        server + "/parse", data=payload, method="POST",
        headers={"Content-Type": "application/pdf"})
    with urllib.request.urlopen(req) as resp:
        got = json.loads(resp.read())
    assert got and got[0]["amount"] == 100.0 and got[0]["direction"] == "in"
    # poison payload → empty array, not a 500
    status, got = _post_multipart(server, b"%PDF-1.4 garbage")
    assert status == 200 and got == []


def test_parse_payload_function_direct():
    txs = parse_payload(
        text_to_pdf("chase.com 2024\n01/03 Deposit 100.00"), 2024)
    assert txs == [{"date": "2024-01-03", "description": "Deposit",
                    "amount": 100.0, "direction": "in"}]


def test_multipart_binds_file_field_not_first_part(server):
    """A text field ahead of the file part must not shadow it — the
    endpoint binds to the part NAMED 'file' (reference app.py:10)."""
    boundary = uuid.uuid4().hex
    payload = text_to_pdf("chase.com 2024\n01/03 Deposit 100.00")
    body = (
        ("--%s\r\nContent-Disposition: form-data; name=\"note\"\r\n\r\n"
         "this is not the document\r\n" % boundary).encode("latin-1")
        + ("--%s\r\nContent-Disposition: form-data; name=\"file\"; "
           "filename=\"doc.pdf\"\r\n"
           "Content-Type: application/pdf\r\n\r\n" % boundary)
        .encode("latin-1")
        + payload
        + ("\r\n--%s--\r\n" % boundary).encode("latin-1")
    )
    req = urllib.request.Request(
        server + "/parse", data=body, method="POST",
        headers={"Content-Type":
                 "multipart/form-data; boundary=%s" % boundary})
    with urllib.request.urlopen(req) as resp:
        got = json.loads(resp.read())
    assert got and got[0]["amount"] == 100.0


def test_chunked_upload_rejected_411(server):
    """Transfer-Encoding: chunked has no Content-Length; reading 0
    bytes silently would parse an empty payload — reject with 411."""
    import http.client

    host, port = server.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port))
    conn.putrequest("POST", "/parse", skip_accept_encoding=True)
    conn.putheader("Transfer-Encoding", "chunked")
    conn.putheader("Content-Type", "application/pdf")
    conn.endheaders()
    conn.send(b"0\r\n\r\n")
    resp = conn.getresponse()
    assert resp.status == 411
    conn.close()
