"""WARC/HTML ingestion: parser edge cases the fixture oracle can't
isolate (malformed input resilience, member splitting, charset lies)."""

import gzip
import os

import pytest

from lightfusion_spark.operators import ingest

from lightfusion_spark.fixtures import fixture_path

FIXTURE = fixture_path("data", "sample.warc.gz")


def _record(rec_type=b"response", body=b"HTTP/1.1 200 OK\r\n\r\nhi", uri=b"https://x/1"):
    head = (
        b"WARC/1.0\r\nWARC-Type: " + rec_type + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:t>\r\nWARC-Target-URI: " + uri + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
    )
    return head + body + b"\r\n\r\n"


def test_fixture_members_are_record_boundaries():
    """The split-ability contract: every gzip member in the committed
    fixture decodes to EXACTLY one WARC record, so any member-aligned
    offset is a valid parallel read start."""
    blob = open(FIXTURE, "rb").read()
    members = list(ingest._gzip_members(blob))
    assert len(members) > 1
    for m in members:
        assert len(list(ingest.iter_warc_records(gzip.compress(m)))) == 1
        assert m.startswith(b"WARC/")


def test_uncompressed_warc_parses():
    raw = _record() + _record(uri=b"https://x/2")
    recs = list(ingest.iter_warc_records(raw))
    assert [r["target_uri"] for r in recs] == ["https://x/1", "https://x/2"]
    assert all(r["payload"] == b"hi" and r["http_status"] == 200 for r in recs)


def test_http_envelope_split_only_for_responses():
    recs = list(
        ingest.iter_warc_records(_record(rec_type=b"metadata", body=b"k: v\r\n"))
    )
    assert recs[0]["warc_type"] == "metadata"
    assert recs[0]["payload"] == b"k: v\r\n"  # no HTTP split
    assert recs[0]["http_status"] is None


def test_missing_content_length_aborts_member_not_file():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\njunk"
    good = _record()
    # bad member then good member: the good one still parses
    blob = gzip.compress(bad) + gzip.compress(good)
    recs = list(ingest.iter_warc_records(blob))
    assert len(recs) == 1 and recs[0]["payload"] == b"hi"


def test_html_text_drops_script_keeps_entities():
    title, text = ingest.html_text(
        "<html><head><title>T &amp; t</title></head><body>"
        "<p>a &lt;b&gt; c</p><script>x()</script><p>d <b>e</b> f</p></body>"
    )
    assert title == "T & t"
    assert text == "a <b> c\nd e f"


def test_html_text_handles_unclosed_and_empty():
    assert ingest.html_text("") == ("", "")
    _, text = ingest.html_text("<p>one<p>two")  # unclosed p tags
    assert text == "one\ntwo"


def test_read_warc_filters_types_and_indexes_records(spark):
    recs = ingest.read_warc(spark, FIXTURE).select(
        "record_idx", "warc_type", "http_status"
    )
    rows = recs.collect()
    assert all(r["warc_type"] == "response" for r in rows)
    assert len(rows) == 502
    idx = sorted(r["record_idx"] for r in rows)
    assert idx[0] > 0 and len(set(idx)) == len(idx)  # warcinfo/request skipped
    assert sum(1 for r in rows if r["http_status"] == 404) == 1


def test_extract_html_text_from_string_column(spark):
    df = spark.createDataFrame(
        [(1, "<html><body><p>x &amp; y</p></body></html>")], "id long, payload string"
    )
    out = ingest.extract_html_text(df, "payload").collect()[0]
    assert out["text"] == "x & y" and out["id"] == 1


def test_ingestion_feeds_existing_text_pipeline(spark):
    """The composition the operator exists for: WARC -> extract ->
    strip_boilerplate removes the nav/footer chrome present on every
    page but keeps per-page content."""
    from lightfusion_spark.operators import text as text_ops

    recs = ingest.read_warc(spark, FIXTURE)
    extracted = ingest.extract_html_text(recs, "payload").select("record_idx", "text")
    cleaned = text_ops.strip_boilerplate(
        extracted, "record_idx", "text", min_doc_frac=0.5
    )
    sample = cleaned.where("n_removed > 0").limit(5).collect()
    assert sample, "boilerplate chrome should be detected on fixture pages"
    for r in sample:
        assert "Home | About" not in r["clean_text"]
        assert "Example Corp" not in r["clean_text"]
