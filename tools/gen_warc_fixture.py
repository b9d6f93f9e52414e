"""Build the committed WARC ingestion fixture (run once, offline):

* ``fixtures/data/sample.warc.gz`` — a Common-Crawl-convention archive (ONE GZIP
  MEMBER PER RECORD) containing a warcinfo record, a request/response
  pair per sf0.001 document (HTML pages wrapping the document text in a
  deterministic template with entities, inline tags, script/style junk,
  and boilerplate nav/footer blocks), one 404 response, and one
  text/plain response.
* ``fixtures/data/warc_expected.parquet`` — the expected extraction for every
  response record, computed ANALYTICALLY from the template (never by
  running the extractor), so an entity-decoding, block-splitting, or
  script-stripping bug in operators/ingest.py breaks the oracle hash
  rather than being baked into it.
"""

from __future__ import annotations

import gzip
import html
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: Boilerplate blocks shared by every page — food for strip_boilerplate.
NAV = "Home | About | Contact"
FOOTER = "© 2024 Example Corp — all rights reserved"


def page_html(doc_id: int, text: str) -> str:
    """Deterministic page template.  Every feature here is an extraction
    trap: entities in title/body, inline <b>/<a> (must NOT split blocks),
    script/style/noscript (must be dropped), nested divs (block splits)."""
    return (
        "<html><head>"
        f"<title>Doc {doc_id} &amp; friends</title>"
        "<style>body { color: #333; }</style>"
        '<meta charset="utf-8"></head>\n'
        "<body>"
        f"<nav>{NAV}</nav>"
        f"<h1>Heading {doc_id}</h1>"
        f"<p>{html.escape(text)} with <b>bold</b> and "
        f'<a href="/d/{doc_id}">a &lt;link&gt;</a>.</p>'
        "<script>var tracker = 'evil';</script>"
        "<noscript>enable js</noscript>"
        f"<div><div>nested {doc_id}</div></div>"
        f"<footer>{FOOTER}</footer>"
        "</body></html>"
    )


def expected_text(doc_id: int, text: str) -> str:
    """What the extractor MUST produce for page_html — derived from the
    template by hand (inline tags join blocks; each block collapsed)."""
    return "\n".join(
        [
            NAV,
            f"Heading {doc_id}",
            f"{text} with bold and a <link>.",
            f"nested {doc_id}",
            FOOTER,
        ]
    )


def warc_record(rec_type: str, uri: str, rec_id: str, block: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + (
            "Content-Type: application/http; msgtype=response\r\n"
            if rec_type == "response"
            else "Content-Type: application/warc-fields\r\n"
        )
        + f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return head + block + b"\r\n\r\n"


def http_response(body: bytes, status: str = "200 OK", ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status}\r\nContent-Type: {ctype}; charset=utf-8\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def main() -> None:
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    members: list[bytes] = []
    expected = {
        "record_idx": [], "target_uri": [], "http_status": [],
        "doc_id": [], "title": [], "text": [],
    }
    idx = 0

    def emit(raw: bytes) -> None:
        nonlocal idx
        # mtime=0 + fixed compresslevel => byte-deterministic archive
        members.append(gzip.compress(raw, compresslevel=6, mtime=0))
        idx += 1

    emit(warc_record("warcinfo", "", "info-0", b"software: gen_warc_fixture\r\n"))
    for doc_id, text in docs:
        uri = f"https://example.com/d/{doc_id}"
        emit(warc_record("request", uri, f"req-{doc_id}", b"GET /d HTTP/1.1\r\n"))
        page = page_html(doc_id, text).encode()
        expected["record_idx"].append(idx)
        expected["target_uri"].append(uri)
        expected["http_status"].append(200)
        expected["doc_id"].append(doc_id)
        expected["title"].append(f"Doc {doc_id} & friends")
        expected["text"].append(expected_text(doc_id, text))
        emit(warc_record("response", uri, f"resp-{doc_id}", http_response(page)))
    # a 404 HTML response and a text/plain response — both must survive
    # ingestion with their status/text intact
    uri = "https://example.com/missing"
    expected["record_idx"].append(idx)
    expected["target_uri"].append(uri)
    expected["http_status"].append(404)
    expected["doc_id"].append(-1)
    expected["title"].append("")
    expected["text"].append("not found")
    emit(
        warc_record(
            "response", uri, "resp-404",
            http_response(b"<html><body><p>not found</p></body></html>",
                          status="404 Not Found"),
        )
    )
    uri = "https://example.com/robots.txt"
    expected["record_idx"].append(idx)
    expected["target_uri"].append(uri)
    expected["http_status"].append(200)
    expected["doc_id"].append(-2)
    expected["title"].append("")
    expected["text"].append("User-agent: * Disallow: /private")
    emit(
        warc_record(
            "response", uri, "resp-robots",
            http_response(b"User-agent: *\nDisallow: /private",
                          ctype="text/plain"),
        )
    )

    warc_path = os.path.join(REPO_ROOT, "lightfusion_spark", "fixtures", "data", "sample.warc.gz")
    with open(warc_path, "wb") as fh:
        fh.write(b"".join(members))
    exp_path = os.path.join(REPO_ROOT, "lightfusion_spark", "fixtures", "data", "warc_expected.parquet")
    pq.write_table(
        pa.table(
            {
                "record_idx": pa.array(expected["record_idx"], pa.int64()),
                "target_uri": pa.array(expected["target_uri"], pa.string()),
                "http_status": pa.array(expected["http_status"], pa.int32()),
                "doc_id": pa.array(expected["doc_id"], pa.int64()),
                "title": pa.array(expected["title"], pa.string()),
                "text": pa.array(expected["text"], pa.string()),
            }
        ),
        exp_path,
    )
    print(
        f"{warc_path}: {len(members)} records, {os.path.getsize(warc_path)} bytes; "
        f"{exp_path}: {len(expected['record_idx'])} rows"
    )


if __name__ == "__main__":
    main()
