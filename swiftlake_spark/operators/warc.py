"""WARC (ISO 28500) web-archive reading for crawl ingestion.

Web-scale corpora arrive as WARC files (Common Crawl et al.), so the
document pipeline's true entry point is WARC record extraction ahead
of HTML→text (operators/doctext.py) — ≙ reference source-ingestion
intent, SURVEY §2 sources; the parser is public-spec structure
(ISO 28500 / RFC 9110 message framing), stdlib-only.

- container: plain or gzip (multi-member per record, the Common Crawl
  layout — stdlib ``gzip`` reads concatenated members transparently);
- records: WARC/1.x header block (version line + named fields +
  Content-Length framing), any record type (warcinfo, request,
  response, metadata, resource, revisit...);
- HTTP layer: response records carry an HTTP/1.x message — status
  line, headers, optional chunked transfer-encoding decode, charset
  from Content-Type;
- Spark operator ``warc_records`` EXPLODES one WARC blob column into
  one row per record (type, target URI, date, HTTP status, content
  type, payload bytes) via ``mapInPandas`` — downstream,
  ``extract_document_text`` takes the response bodies straight into
  the text stages.

``encode_warc`` writes spec-valid fixtures (plain or per-record-gzip)
so tests round-trip without any crawl data.
"""

from __future__ import annotations

import gzip
import io
import zlib

_CRLF = b"\r\n"


def _gunzip_all(data: bytes) -> bytes:
    """Concatenated-member gzip → all members' bytes (the standard
    WARC.gz layout is one member per record)."""
    try:
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
            out = f.read(1 << 30)
    except (OSError, EOFError, zlib.error) as exc:
        raise ValueError(f"bad WARC gzip container: {exc}") from None
    return out


def iter_warc_records(data: bytes):
    """Yield dicts: {headers: {name→value, lower-cased}, payload:
    bytes, type, uri, date} for every record in a WARC blob."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_all(data)
    pos = 0
    n = len(data)
    found = 0
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos: pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC record header")
        head = data[pos:hdr_end]
        lines = head.split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(
                f"bad WARC version line at offset {pos}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            if b":" not in ln:
                raise ValueError("bad WARC header line")
            k, v = ln.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            raise ValueError("WARC record without Content-Length") \
                from None
        body_start = hdr_end + 4
        if length < 0 or body_start + length > n:
            raise ValueError("WARC record payload overruns container")
        payload = data[body_start: body_start + length]
        yield {
            "headers": headers,
            "payload": payload,
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
        }
        found += 1
        pos = body_start + length
    if found == 0:
        raise ValueError("no WARC records found")


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(_CRLF, pos)
        if nl < 0:
            raise ValueError("truncated chunked body")
        size_tok = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError("bad chunk size") from None
        pos = nl + 2
        if size == 0:
            return bytes(out)
        if pos + size > len(body):
            raise ValueError("chunk overruns body")
        out += body[pos: pos + size]
        pos += size + 2  # trailing CRLF


def parse_http_response(payload: bytes) -> dict:
    """HTTP/1.x response message → {status, headers, body, content_type,
    charset}; chunked transfer-encoding decoded."""
    hdr_end = payload.find(_CRLF + _CRLF)
    if hdr_end < 0:
        raise ValueError("truncated HTTP message")
    lines = payload[:hdr_end].split(_CRLF)
    status_parts = lines[0].split(None, 2)
    if len(status_parts) < 2 or not status_parts[0].startswith(b"HTTP/"):
        raise ValueError("bad HTTP status line")
    try:
        status = int(status_parts[1])
    except ValueError:
        raise ValueError("bad HTTP status code") from None
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if b":" not in ln:
            continue  # tolerate damaged header lines in crawls
        k, v = ln.split(b":", 1)
        headers[k.strip().decode("latin-1").lower()] = \
            v.strip().decode("latin-1")
    body = payload[hdr_end + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    ctype = headers.get("content-type", "")
    charset = None
    if "charset=" in ctype.lower():
        charset = ctype.lower().split("charset=", 1)[1] \
            .split(";")[0].strip(" \"'")
    return {"status": status, "headers": headers, "body": body,
            "content_type": ctype.split(";")[0].strip().lower() or None,
            "charset": charset}


def warc_records(df, data_col: str = "data"):
    """Spark operator: EXPLODE WARC blobs into one row per record —
    (record_type, uri, date, http_status, content_type, body).
    Response records get the HTTP layer parsed; other types carry the
    raw payload with NULL status.

    A malformed HTTP message inside an otherwise-valid record (missing
    CRLFCRLF terminator, bad status line — real Common Crawl data has
    these) degrades to the raw payload with NULL status/content_type
    instead of failing the Spark task; only container-level corruption
    (a broken WARC record) still hard-raises from iter_warc_records."""
    from pyspark.sql import types as T

    from swiftlake_spark.operators.explode_util import explode_blobs

    def rows_for(blob: bytes):
        for rec in iter_warc_records(blob):
            out = {"record_type": rec["type"], "uri": rec["uri"],
                   "warc_date": rec["date"], "http_status": None,
                   "content_type": None, "body": rec["payload"]}
            if rec["type"] == "response":
                try:
                    h = parse_http_response(rec["payload"])
                except ValueError:
                    pass  # damaged HTTP layer: keep raw payload, NULLs
                else:
                    out["http_status"] = h["status"]
                    out["content_type"] = h["content_type"]
                    out["body"] = h["body"]
            yield out

    return explode_blobs(df, data_col, [
        T.StructField("record_type", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
    ], rows_for)


# ----------------------------------------------------------------- write


def encode_warc(records: list[dict], *, per_record_gzip: bool = False
                ) -> bytes:
    """records [{type, uri, payload, (status, content_type)}] → WARC
    bytes for tests.  ``type='response'`` wraps the payload in an
    HTTP/1.1 message; per_record_gzip writes one gzip member per
    record (the Common Crawl layout)."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        if rec.get("type", "resource") == "response":
            status = rec.get("status", 200)
            ctype = rec.get("content_type", "text/html; charset=utf-8")
            http = (f"HTTP/1.1 {status} OK\r\n"
                    f"Content-Type: {ctype}\r\n"
                    f"Content-Length: {len(payload)}\r\n\r\n"
                    ).encode("latin-1") + payload
            payload = http
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec.get('type', 'resource')}\r\n"
            f"WARC-Record-ID: <urn:uuid:test-{i:08d}>\r\n"
            f"WARC-Date: 2026-01-01T00:00:0{i % 10}Z\r\n"
            + (f"WARC-Target-URI: {rec['uri']}\r\n"
               if rec.get("uri") else "")
            + f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("latin-1")
        record = head + payload + _CRLF + _CRLF
        if per_record_gzip:
            out += gzip.compress(record)
        else:
            out += record
    return bytes(out)
