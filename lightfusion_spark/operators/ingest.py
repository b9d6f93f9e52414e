"""Raw-corpus ingestion: WARC archives and HTML -> text extraction.

The front door every real pretraining pipeline starts with (SURVEY §2.4
round-7 extension; the reference has no ingestion surface at all — its
rawest input is a TSV scan, `examples/lightfusion_tsv.rs:20-35`).  The
rest of the repo's text pipeline starts from a `documents` table; these
operators produce that table from Common-Crawl-style archives:

    read_warc(spark, "s3://.../segment/*.warc.gz")   # records
      -> extract_html_text(df, "payload")            # title + text
      -> text.strip_boilerplate / dedup / ...        # existing pipeline

Everything is stdlib (gzip/zlib, html.parser) — no warcio/bs4/lxml
dependency — and every byte-touching step is an Arrow-batched
``mapInPandas`` over ``binaryFile`` splits, never a row-at-a-time UDF.

100 TB design
-------------
* **File-level parallelism is free**: `binaryFile` hands each archive to
  one task; Common Crawl ships ~1 GB WARCs in ~64k-file segments, so a
  1000-executor cluster saturates on files alone without splitting any.
* **Sub-file splitting**: Common Crawl gzips EACH RECORD as its own gzip
  member (the convention this module's fixture reproduces), so any byte
  offset can be aligned to the next member boundary (`\\x1f\\x8b\\x08`
  scan + decompress-validate) and records stream member-at-a-time —
  :func:`iter_warc_records` decodes member-at-a-time for exactly this
  reason.  A custom datasource exposing (path, offset, length) splits is
  the natural extension; the record parser here already works from any
  member-aligned offset.
* **Memory**: records decode one member at a time — peak memory is one
  record, not one archive; the decompressed archive is never
  materialized whole.
"""

from __future__ import annotations

import io
import re
import zlib
from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"

#: Tags whose content is never document text.
_SKIP_TAGS = {"script", "style", "noscript", "template", "head"}
#: Tags that open a new text block (block-level elements).
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "header",
    "footer", "blockquote", "pre", "form", "hr", "nav", "aside", "main",
}


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a (possibly multi-member) gzip blob member-at-a-time.

    Common Crawl WARCs store one record per member; yielding members
    individually is what makes record streaming O(record) in memory and
    makes member boundaries usable as split points.  Non-gzip input is
    yielded whole (uncompressed .warc support).
    """
    if not blob.startswith(_GZIP_MAGIC):
        yield blob
        return
    pos = 0
    while pos < len(blob) and blob[pos : pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        member = d.decompress(blob[pos:])
        yield member + d.flush()
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailer; stop rather than spin
            return
        pos += consumed


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Parse WARC records out of one archive blob (gzipped or plain).

    Yields dicts: ``record_id, warc_type, target_uri, content_type
    (WARC-level), http_status, http_content_type, payload`` — for
    ``response`` records the HTTP envelope is split off and ``payload``
    is the body; other record types pass their block through verbatim.

    Format per ISO 28500: version line ``WARC/1.x``, CRLF header block,
    blank line, ``Content-Length`` bytes of block, CRLF CRLF.  Parsing
    is resilient: a malformed record aborts its member, not the file.
    """
    for member in _gzip_members(blob):
        buf = io.BytesIO(member)
        while True:
            version = buf.readline()
            if not version:
                break
            if not version.startswith(b"WARC/"):
                continue  # skip inter-record padding
            headers: dict[str, str] = {}
            while True:
                line = buf.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                if b":" in line:
                    k, _, v = line.partition(b":")
                    headers[k.decode("ascii", "replace").strip().lower()] = (
                        v.decode("utf-8", "replace").strip()
                    )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                break  # length-less record: cannot frame the block; abort member
            block = buf.read(length)
            buf.readline(), buf.readline()  # record separator CRLF CRLF
            rec = {
                "record_id": headers.get("warc-record-id", ""),
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "content_type": headers.get("content-type", ""),
                "http_status": None,
                "http_content_type": "",
                "payload": block,
            }
            if rec["warc_type"] == "response" and block[:5] in (b"HTTP/",):
                head, sep, body = block.partition(b"\r\n\r\n")
                if sep:
                    lines = head.split(b"\r\n")
                    parts = lines[0].split(None, 2)
                    if len(parts) >= 2 and parts[1].isdigit():
                        rec["http_status"] = int(parts[1])
                    for hl in lines[1:]:
                        if hl.lower().startswith(b"content-type:"):
                            rec["http_content_type"] = (
                                hl.partition(b":")[2].decode("utf-8", "replace").strip()
                            )
                    rec["payload"] = body
            yield rec


_WARC_SCHEMA = (
    "warc_file string, record_idx bigint, record_id string, warc_type string, "
    "target_uri string, http_status int, http_content_type string, payload binary"
)


def read_warc(
    spark: SparkSession, path: str, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """WARC archives -> one row per record.

    Output: (warc_file, record_idx, record_id, warc_type, target_uri,
    http_status, http_content_type, payload).  ``record_idx`` is the
    record's ordinal within its file — with ``warc_file`` it is a stable
    unique key (WARC-Record-IDs are unique per spec but untrusted input
    isn't the spec).  ``record_types`` prunes non-content records
    (warcinfo/request/metadata) before anything shuffles.

    Plan: binaryFile scan (one task per archive) -> one Arrow-batched
    ``mapInPandas`` crossing.  The payload column stays ``binary``;
    decode decisions (charset, content type) belong to the next stage.
    """
    types = set(record_types) if record_types else None
    schema = _WARC_SCHEMA

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "warc_file": [], "record_idx": [], "record_id": [],
                "warc_type": [], "target_uri": [], "http_status": [],
                "http_content_type": [], "payload": [],
            }
            for path_, content in zip(pdf["path"], pdf["content"]):
                for idx, rec in enumerate(iter_warc_records(bytes(content))):
                    if types is not None and rec["warc_type"] not in types:
                        continue
                    out["warc_file"].append(path_)
                    out["record_idx"].append(idx)
                    out["record_id"].append(rec["record_id"])
                    out["warc_type"].append(rec["warc_type"])
                    out["target_uri"].append(rec["target_uri"])
                    out["http_status"].append(rec["http_status"])
                    out["http_content_type"].append(rec["http_content_type"])
                    out["payload"].append(rec["payload"])
            yield pd.DataFrame(out)

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(parse, schema)


class _TextExtractor(HTMLParser):
    """Visible-text + title extraction, stdlib only.

    Contract (the fixture oracle replays it analytically):

    * content inside script/style/noscript/template/head is dropped,
      except <title>, captured separately;
    * block-level tags start a new block; inline tags do not;
    * each block is whitespace-collapsed and stripped; empty blocks are
      dropped; blocks join with ``\\n``;
    * character references decode (convert_charrefs=True default).
    """

    def __init__(self) -> None:
        super().__init__()
        self._skip_depth = 0
        self._in_title = False
        self.title_parts: list[str] = []
        self.blocks: list[list[str]] = [[]]

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag in _BLOCK_TAGS:
            self.blocks.append([])

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "title":
            self._in_title = False
        elif tag in _BLOCK_TAGS:
            self.blocks.append([])

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif self._skip_depth == 0:
            self.blocks[-1].append(data)

    def result(self) -> tuple[str, str]:
        title = re.sub(r"\s+", " ", "".join(self.title_parts)).strip()
        blocks = [re.sub(r"\s+", " ", "".join(b)).strip() for b in self.blocks]
        return title, "\n".join(b for b in blocks if b)


def html_text(html: str) -> tuple[str, str]:
    """(title, text) of one HTML document — the driver-side face of the
    extractor, used by tests and the fixture generator's inverse check."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    return p.result()


def extract_html_text(
    df: DataFrame,
    payload_col: str = "payload",
    charset: str = "utf-8",
) -> DataFrame:
    """Append (title, text) extracted from an HTML payload column.

    ``payload_col`` may be ``binary`` (decoded with ``charset``,
    errors replaced — real crawls lie about charsets) or ``string``.
    One Arrow-batched ``mapInPandas`` crossing; all other columns pass
    through untouched, so this composes directly after
    :func:`read_warc` and before `text.strip_boilerplate`.
    """
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, title string, text string"
    is_binary = dict(df.dtypes)[payload_col] == "binary"

    def extract(batches):
        for pdf in batches:
            titles, texts = [], []
            for payload in pdf[payload_col]:
                html = (
                    bytes(payload).decode(charset, "replace")
                    if is_binary
                    else (payload or "")
                )
                t, x = html_text(html)
                titles.append(t)
                texts.append(x)
            pdf = pdf.copy()
            pdf["title"] = titles
            pdf["text"] = texts
            yield pdf

    return df.mapInPandas(extract, schema)
