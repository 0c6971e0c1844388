"""WARC reading tests (operators/warc.py) incl. the full ingestion
chain: WARC.gz → response bodies → HTML extraction → text quality."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from swiftlake_spark.operators.warc import (
    encode_warc,
    iter_warc_records,
    parse_http_response,
    warc_records,
)


def _sample_records():
    return [
        {"type": "warcinfo", "payload": b"software: test\r\n"},
        {"type": "response", "uri": "http://a.example/page1",
         "payload": b"<html><body><p>Page one text.</p></body></html>"},
        {"type": "request", "uri": "http://a.example/page1",
         "payload": b"GET /page1 HTTP/1.1\r\nHost: a.example\r\n\r\n"},
        {"type": "response", "uri": "http://b.example/two",
         "status": 404, "content_type": "text/plain",
         "payload": b"not found"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_record_walk(gz):
    data = encode_warc(_sample_records(), per_record_gzip=gz)
    recs = list(iter_warc_records(data))
    assert [r["type"] for r in recs] == \
        ["warcinfo", "response", "request", "response"]
    assert recs[1]["uri"] == "http://a.example/page1"
    assert recs[1]["date"].startswith("2026-01-01")
    h = parse_http_response(recs[1]["payload"])
    assert h["status"] == 200 and h["content_type"] == "text/html"
    assert h["charset"] == "utf-8"
    assert b"Page one text." in h["body"]
    h2 = parse_http_response(recs[3]["payload"])
    assert h2["status"] == 404 and h2["content_type"] == "text/plain"


def test_chunked_transfer_decoding():
    body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    payload = (b"HTTP/1.1 200 OK\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n" + body)
    h = parse_http_response(payload)
    assert h["body"] == b"Wikipedia"


def test_corrupt_containers_raise():
    with pytest.raises(ValueError):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError):
        list(iter_warc_records(b"\x1f\x8bnot really gzip"))
    # truncated payload framing
    data = bytearray(encode_warc(_sample_records()[:1]))
    with pytest.raises(ValueError):
        list(iter_warc_records(bytes(data[:-20])))


def test_spark_explode_and_ingestion_chain(spark):
    """The real crawl composition: WARC.gz blobs → exploded response
    rows → HTML text extraction → the existing quality stage."""
    from pyspark.sql import functions as F

    from swiftlake_spark.operators.doctext import extract_document_text
    from swiftlake_spark.operators.text import text_quality

    blobs = [
        (0, bytearray(encode_warc(_sample_records(),
                                  per_record_gzip=True))),
        (1, bytearray(encode_warc([
            {"type": "response", "uri": "http://c.example/three",
             "payload": b"<html><body><h1>Third</h1>"
                        b"<p>More crawl text here.</p></body></html>"},
        ]))),
    ]
    df = spark.createDataFrame(blobs, "id bigint, data binary")
    recs = warc_records(df, "data")
    responses = recs.filter(
        (F.col("record_type") == "response")
        & (F.col("http_status") == 200)
        & (F.col("content_type") == "text/html"))
    extracted = extract_document_text(responses, "body")
    rows = {r["uri"]: r for r in extracted.collect()}
    assert rows["http://a.example/page1"]["text"] == "Page one text."
    assert "More crawl text here." in rows["http://c.example/three"]["text"]
    q = text_quality(extracted, "text").collect()
    assert all(r["quality_score"] > 0 for r in q)
    # non-200 and non-html records were filtered, not crashed on
    assert recs.count() == 5


def test_mutation_fuzz_contract():
    rng = np.random.default_rng(41)
    bases = [
        encode_warc(_sample_records()),
        encode_warc(_sample_records(), per_record_gzip=True),
    ]
    n = 0
    for base in bases:
        for k in range(120):
            b = bytearray(base)
            mode = k % 3
            if mode == 0:
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
            elif mode == 1:
                b = b[: int(rng.integers(1, len(b)))]
            else:
                i = int(rng.integers(0, max(len(b) - 6, 1)))
                b[i: i + 6] = rng.integers(0, 256, 6, np.uint8).tobytes()
            try:
                for rec in iter_warc_records(bytes(b)):
                    if rec["type"] == "response":
                        try:
                            parse_http_response(rec["payload"])
                        except ValueError:
                            pass
            except ValueError:
                pass
            n += 1
    assert n == 240


def test_malformed_http_degrades_to_raw_payload(spark):
    """ADVICE r11: one damaged HTTP message in a crawl blob (missing
    CRLFCRLF, bad status line) must NOT fail the Spark task — the
    record degrades to raw payload with NULL status/content_type while
    sibling records still parse fully."""
    # hand-build records whose WARC layer is valid but HTTP layer is not
    bad_no_terminator = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
    bad_status_line = b"garbage not a status line\r\n\r\n<html></html>"
    records = [
        {"type": "response", "uri": "http://ok.example/",
         "payload": b"<html><body><p>fine</p></body></html>"},
        {"type": "response", "uri": "http://bad1.example/",
         "payload": bad_no_terminator, "raw_http": True},
        {"type": "response", "uri": "http://bad2.example/",
         "payload": bad_status_line, "raw_http": True},
    ]
    # encode_warc wraps response payloads in HTTP; for the bad ones we
    # want the payload AS the (broken) HTTP message, so splice manually
    good = encode_warc(records[:1])
    parts = [good]
    for i, rec in enumerate(records[1:], start=1):
        payload = rec["payload"]
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:bad-{i:08d}>\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"WARC-Target-URI: {rec['uri']}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("latin-1")
        parts.append(head + payload + b"\r\n\r\n")
    blob = b"".join(parts)
    df = spark.createDataFrame(
        [(0, bytearray(blob))], "id bigint, data binary")
    rows = {r["uri"]: r for r in warc_records(df, "data").collect()}
    ok = rows["http://ok.example/"]
    assert ok["http_status"] == 200
    assert ok["content_type"] == "text/html"
    assert bytes(ok["body"]) == b"<html><body><p>fine</p></body></html>"
    for uri, payload in [("http://bad1.example/", bad_no_terminator),
                         ("http://bad2.example/", bad_status_line)]:
        r = rows[uri]
        assert r["http_status"] is None
        assert r["content_type"] is None
        assert bytes(r["body"]) == payload  # raw, not dropped
